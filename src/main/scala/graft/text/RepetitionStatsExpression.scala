package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass repetition counters as a native expression.
  *
  * The HOF formulation (array_sort + aggregate fold with struct state)
  * is interpreted, allocates a struct per bigram, and — worse —
  * CollapseProject inlines the whole fold into every derived fraction
  * column, recomputing the sort per field (measured 17s at sf0.1 for
  * what this expression does in <0.5s). One pass, one hash map, one
  * struct out; the fractions are cheap field arithmetic on top.
  *
  * Token semantics match `TextAnalysis.tokens` (whitespace split,
  * non-empty) and bigrams are space-joined adjacent token pairs —
  * identical to the DuckDB oracle's formulation, so oracles are
  * unchanged.
  */
object RepetitionStatsExpression {

  val statsType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false),
    StructField("top_bigram_count", LongType, nullable = false)))

  case class RepetitionStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = statsType

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toString
        .split("\\s+").filter(_.nonEmpty)
      val distinctToks = new java.util.HashSet[String]()
      toks.foreach(distinctToks.add)
      val bigramCounts = new java.util.HashMap[String, Long]()
      var top = 0L
      var i = 0
      while (i < toks.length - 1) {
        val g = toks(i) + " " + toks(i + 1)
        val c = bigramCounts.merge(g, 1L, (a, b) => a + b)
        if (c > top) top = c
        i += 1
      }
      val nBigrams = math.max(toks.length - 1, 0).toLong
      new GenericInternalRow(Array[Any](toks.length.toLong,
        distinctToks.size.toLong, nBigrams,
        bigramCounts.size.toLong, top))
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  def repetitionCounts(text: Column): Column =
    toColumn(RepetitionStats(toExpression(text)))
}
