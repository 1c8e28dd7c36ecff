package graft
import org.apache.spark.sql.functions._
object EdProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.mapPartitions{it => var n=0L; while(it.hasNext){it.next();n+=1}; Iterator(n)}.fold(0L)(_+_)
    def t[T](l: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(s"== $l: "+(System.nanoTime()-t0)/1e9+" s"); r }
    val q = graft.queries.Catalog.queries("q_dedup_editdist")
    t("warm count")(q(spark, dir).count())
    t("count rep")(q(spark, dir).count())
    t("force rep1")(force(q(spark, dir)))
    t("force rep2")(force(q(spark, dir)))
    // stage decomposition
    val docs = graft.io.Tables.documents(spark, dir).select("doc_id","text")
    val suffix = when(col("doc_id") % 3 === 0, lit(" x")).when(col("doc_id") % 3 === 1, lit(" xyz")).otherwise(lit(" xy zw"))
    val corpus = docs.select((col("doc_id")*2).as("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id")*2+1).as("doc_id"), concat(col("text"), suffix).as("text")))
    val pairs = graft.ops.Dedup.editDistanceLshPairs(corpus, "doc_id", "text", bands = 4, rowsPerBand = 2, k = 6)
    t("pairs force (no sort)")(force(pairs))
    t("pairs count")(pairs.count())
    spark.stop()
  }
}
