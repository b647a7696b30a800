package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass marker-word language ID as a native expression.
  *
  * The column formulation built a when/otherwise chain over
  * `greatest(...)` of per-language scores, where each score was a sum
  * of `(length(padded) - length(replace(padded, marker))) / len` terms.
  * Catalyst inlines that whole marker-count pipeline once per CASE
  * branch (conditional branches are excluded from codegen
  * subexpression elimination), so a projection repeated each
  * `length(replace(lower(text)...))` chain up to ~8x — ~20 KB of
  * expression tree and eight lowercase+replace string allocations per
  * row (r3 verdict item 2). This expression lowercases ONCE and counts
  * marker occurrences with allocation-free `indexOf` scans, then
  * applies the identical argmax.
  *
  * Semantics are bit-identical to the column version and the DuckDB
  * oracle:
  *   - padding: `' ' || lower(text) || ' '` (lowercase via
  *     `UTF8String.toLowerCase` — exactly Spark's `lower()`);
  *   - per-marker count = left-to-right NON-overlapping occurrences,
  *     which is what `(len(s) - len(replace(s, m, ''))) / len(m)`
  *     computes (both engines' `replace` scans the original string
  *     once, left to right);
  *   - argmax with first-wins ties in marker-list order, `und` when
  *     the best score is 0 — and `und` (not null) on null text, since
  *     the CASE chain's `otherwise('und')` caught null scores.
  */
object LangIdExpression {

  case class LangId(child: Expression,
                    markers: Seq[(String, Seq[String])])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false

    private val langs: Array[UTF8String] =
      markers.map(m => UTF8String.fromString(m._1)).toArray
    private val markerLists: Array[Array[String]] =
      markers.map(_._2.toArray).toArray
    private val und = UTF8String.fromString("und")

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) und
      else {
        val padded =
          " " + v.asInstanceOf[UTF8String].toLowerCase.toString + " "
        var best = 0L
        var bestIdx = -1
        var i = 0
        while (i < markerLists.length) {
          var score = 0L
          val ms = markerLists(i)
          var j = 0
          while (j < ms.length) {
            val m = ms(j)
            var from = padded.indexOf(m)
            while (from >= 0) {
              score += 1
              from = padded.indexOf(m, from + m.length)
            }
            j += 1
          }
          // strict > keeps the FIRST language on score ties — the
          // when-chain / CASE ordering both engines pinned
          if (score > best) { best = score; bestIdx = i }
          i += 1
        }
        if (bestIdx < 0) und else langs(bestIdx)
      }
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  def langId(text: Column,
             markers: Seq[(String, Seq[String])]): Column =
    toColumn(LangId(toExpression(text), markers))
}
