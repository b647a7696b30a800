package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rounding that reproduces DuckDB's `round(double, d)` bit-for-bit.
  *
  * Spark's `round` goes through BigDecimal (exact view of the binary
  * double, HALF_UP); DuckDB rounds on the scaled double:
  * `floor(x*10^d + 0.5)` for x >= 0, `ceil(x*10^d - 0.5)` below.
  * The two disagree on values whose `x*10^d` lands within one ulp of a
  * half-boundary — ~1e-7 of rows on derived metrics, which is exactly
  * the kind of flake a 600k-row hash compare finds (observed: 2/600k
  * on q06's ev_adj at sf0.1).
  *
  * Using the SAME IEEE ops as DuckDB (multiply, add, floor/ceil,
  * divide) makes every rounded value identical by construction, so the
  * oracle can keep its native `round(...)`. Verified against DuckDB
  * 1.0 over 204k values including adversarial near-boundary inputs.
  *
  * Valid for |x|*10^d < 2^53 (all engine metrics by orders of
  * magnitude).
  */
object PortableRound {
  def pround(c: Column, digits: Int): Column = {
    val scale = math.pow(10, digits)
    val s = c * scale
    when(c >= 0, floor(s + 0.5) / scale)
      .otherwise(ceil(s - 0.5) / scale)
  }

  /** Driver-side Scala twin (for scalars leaving the JVM plan, e.g.
    * MLlib model coefficients).
    */
  def proundScala(x: Double, digits: Int): Double = {
    val scale = math.pow(10, digits)
    val s = x * scale
    if (x >= 0) math.floor(s + 0.5) / scale else math.ceil(s - 0.5) / scale
  }
}
