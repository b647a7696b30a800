package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve encoding for multi-dimensional data layout.
  *
  * Sorting a table by the interleaved bits of two (or more) columns
  * co-locates rows that are close in BOTH dimensions, so per-file
  * min/max statistics prune scans for predicates on either column —
  * the standard layout trick for 100 TB fact tables where queries
  * filter on more than one key (a single-column sort only skips for
  * its leading column).
  *
  * Built from integer column arithmetic only (`shiftright`/`&`/`*`):
  * whole-stage-codegen'd, no UDF, and bit-for-bit reproducible by any
  * engine that has integer shifts — which is what lets a DuckDB
  * oracle replay the exact same layout.
  */
object ZOrder {

  /** Morton code of the low `bits` bits of `x` (even bit positions)
    * and `y` (odd): sum over i of ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1).
    * Inputs must already be clamped to [0, 2^bits); the result fits
    * in 2*bits bits (a long for bits <= 31).
    */
  def interleave(x: Column, y: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"interleave: bits out of range: $bits")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The same Morton sum as DuckDB SQL over integer expressions
    * `x`/`y` — kept next to [[interleave]] so the two cannot drift.
    */
  def mortonSql(x: String, y: String, bits: Int = 8): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
}
