package graft.ops

/** Cross-engine EXACT integer base-2 logarithm — the primitive that
  * lets iterative trainers whose update rule needs a log (unigram-LM
  * EM, anything softmax-shaped) replay hash-exactly in a different
  * engine (the DuckDB oracle), closing the one determinism hole the
  * `ln()`-literal designs had: libm transcendentals (`Math.log`,
  * DuckDB `ln`) are NOT specified to the last ulp and genuinely
  * differ across implementations, so any model built from them is
  * only deterministic *within* one engine.
  *
  * `qlog2(n) ≈ floor(2^FracBits · log2 n)` computed by the classical
  * square-and-shift binary-logarithm recurrence using ONLY operations
  * IEEE 754 fully specifies (correctly rounded `*`, exact `/2`,
  * comparison):
  *
  *   e   = floor(log2 n)            (bit length − 1; exact integers)
  *   x₀  = n / 2^e ∈ [1, 2)         (one correctly-rounded division)
  *   per step: y = x², then bit = [y ≥ 2], x' = y/2 if bit else y
  *   qlog2 = e·2^k + Σ bitₜ·2^(k−t) (accumulated as acc = acc·2 + bit)
  *
  * Every engine with IEEE doubles (JVM ≥ 17 is always-strictfp;
  * DuckDB uses native IEEE doubles) computes bit-identical `x`
  * sequences, hence the identical integer. The value can be one unit
  * off the true floor (x₀'s rounding), which is irrelevant: the
  * CONTRACT is "same integer everywhere", not "exact floor". The
  * DuckDB twin is a 16-step recursive CTE (see
  * [[graft.queries.TrainingQ]]'s unigram oracles):
  *
  * {{{
  * it(n, t, x, acc) AS (
  *   SELECT n, 0, CAST(n AS DOUBLE)/CAST((1::BIGINT << e) AS DOUBLE),
  *          CAST(e AS BIGINT)  -- e = length(bin(n)) - 1
  *   FROM base
  *   UNION ALL
  *   SELECT n, t+1, CASE WHEN x*x >= 2 THEN x*x/2 ELSE x*x END,
  *          acc*2 + CASE WHEN x*x >= 2 THEN 1 ELSE 0 END
  *   FROM it WHERE t < 16)
  * }}}
  *
  * Headroom contract (the [[NgramLm]] discipline): `n.toDouble` is
  * exact below 2^53; above it both engines apply the same
  * round-to-nearest, so determinism holds for ALL positive longs —
  * only the "one unit off floor" slack widens. Differences
  * qlog2(a) − qlog2(b) live in ±64·2^16 < 2^23, so sums of millions
  * of them stay far from long overflow.
  */
object Qlog {

  /** Fractional bits of the quantized log: one unit = 2^-16 of a
    * bit (≈ 1.06e-5 nats) — far below any count-ratio resolution a
    * tokenizer prune cares about, far above double-rounding noise.
    */
  val FracBits: Int = 16

  /** floor-ish(2^16 · log2 n), engine-portable (see object doc). */
  def qlog2(n: Long): Long = {
    require(n > 0, s"qlog2 domain is positive longs, got $n")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var x = n.toDouble / (1L << e).toDouble
    var acc = e.toLong
    var t = 0
    while (t < FracBits) {
      val y = x * x
      if (y >= 2.0) { acc = acc * 2 + 1; x = y / 2 }
      else { acc = acc * 2; x = y }
      t += 1
    }
    acc
  }

  /** UTF-8 byte-order string comparison — the ORDER BY collation both
    * Spark (UTF8String unsigned byte compare) and DuckDB (binary
    * collation) use. Driver-side tie-breaks that must agree with an
    * engine-side `ORDER BY piece` sort MUST use this, not Java's
    * `String.compareTo` (UTF-16 code-unit order — differs for
    * supplementary-plane text).
    */
  def u8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }
}
