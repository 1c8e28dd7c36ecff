package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.model.{SymbolConfig, ValueRule}
import graft.ops.Transform

/** Property tests: the Spark transform engine agrees with a direct
  * Scala model of the reference semantics (server.go:176-238) on random
  * payloads, in one batched Spark job per config.
  */
class TransformPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Direct model of transformFlat (value-rules → rename → remove →
    * override), deterministic-rename variant.
    */
  private def model(p: Map[String, String], cfg: SymbolConfig): Map[String, String] = {
    var m = p.map { case (k, v) =>
      cfg.valueRules.get(k) match {
        case Some(ValueRule(op, rv)) =>
          toDouble(v) match {
            case Some(d) =>
              val r = op match {
                case "add"      => Some(d + rv)
                case "subtract" => Some(d - rv)
                case "multiply" => Some(d * rv)
                case "divide"   => if (rv == 0) None else Some(d / rv)
                case _          => None
              }
              k -> r.map(fmt).getOrElse(v)
            case None => k -> v
          }
        case None => k -> v
      }
    }
    // renames all read the original (post-rule) map; targets overwrite
    val renamed = m.collect { case (k, v) if cfg.renameFields.contains(k) =>
      cfg.renameFields(k) -> v }
    m = (m -- cfg.renameFields.keys).filterNot { case (k, _) =>
      cfg.renameFields.values.exists(_ == k) } ++ renamed
    m = m -- cfg.removeFields
    m ++ cfg.overrideFields
  }

  // Non-finite parses (NaN/Infinity) are non-numeric passthrough — JSON
  // payloads cannot carry them; engine (Transform.applyRule) agrees.
  private def toDouble(s: String): Option[Double] =
    try { Some(s.toDouble).filterNot(d => d.isNaN || d.isInfinite) }
    catch { case _: Exception => None }

  /** Mirror Spark's double→string rendering (Java shortest repr). */
  private def fmt(d: Double): String = d.toString

  private val keyGen = Gen.oneOf("a", "b", "c", "d", "e", "f")
  private val valGen = Gen.oneOf(
    Gen.choose(-1000, 1000).map(i => (i / 4.0).toString),
    Gen.oneOf("hello", "", "NaN-ish", "1.2.3", "NaN", "Infinity", "-Infinity"))
  private val payloadGen = Gen.mapOf(Gen.zip(keyGen, valGen))

  private val configs = Seq(
    SymbolConfig(
      valueRules = Map("a" -> ValueRule("add", 2.5), "b" -> ValueRule("divide", 0),
        "c" -> ValueRule("multiply", -3), "f" -> ValueRule("wat", 1)),
      renameFields = Map("a" -> "g", "c" -> "b2"),
      removeFields = Seq("d", "g2"),
      overrideFields = Map("e" -> "OV", "h" -> "NEW")),
    SymbolConfig(
      valueRules = Map("a" -> ValueRule("subtract", 7), "b" -> ValueRule("divide", 4)),
      renameFields = Map("b" -> "e"),
      removeFields = Seq("a"),
      overrideFields = Map.empty),
    SymbolConfig())

  test("engine agrees with the reference model on random payloads") {
    val payloads = Gen.listOfN(60, payloadGen).sample.getOrElse(Nil)
    assert(payloads.nonEmpty)
    configs.zipWithIndex.foreach { case (cfg, ci) =>
      val df = payloads.zipWithIndex.toDF("p", "i")
      val got = df.select(col("i"), Transform.applySymbolConfig(col("p"), cfg).as("out"))
        .collect().map(r => r.getInt(0) -> r.getMap[String, String](1).toMap).toMap
      payloads.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) == model(p, cfg), s"config #$ci payload $p")
      }
    }
  }
}
