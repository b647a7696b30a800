package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token statistics as a native expression.
  *
  * The column-function formulation tokenizes the document once per
  * derived metric (and the composite quality score inlines them all),
  * so a 4-metric projection re-splits every document ~12× in
  * interpreted HOF code. This expression makes ONE pass and emits a
  * struct; the metrics become cheap field arithmetic.
  *
  * Semantics match `TextAnalysis` exactly (whitespace split, non-empty
  * tokens, lowercase stopword match, ASCII `\p{Punct}` class), so the
  * DuckDB oracles are unchanged.
  */
object TextStatsExpression {

  val statsType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("total_token_len", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val punct: Array[Boolean] = {
    val p = new Array[Boolean](128)
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".foreach(c => p(c) = true)
    p
  }

  case class TextStats(child: Expression, stopwords: Seq[String])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = statsType
    private val stopSet = stopwords.toSet

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      var nTokens = 0L
      var totalLen = 0L
      var nStop = 0L
      var nPunct = 0L
      text.foreach(c => if (c < 128 && punct(c)) nPunct += 1)
      text.split("\\s+").foreach { t =>
        if (t.nonEmpty) {
          nTokens += 1
          // code POINTS, not UTF-16 units — Spark's length() and
          // DuckDB both count points; surrogate pairs (emoji, rare
          // CJK) would otherwise double-count
          totalLen += t.codePointCount(0, t.length)
          if (stopSet.contains(t.toLowerCase(java.util.Locale.ROOT)))
            nStop += 1
        }
      }
      new GenericInternalRow(Array[Any](nTokens, totalLen, nStop, nPunct,
        text.codePointCount(0, text.length).toLong))
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  def textStats(text: Column,
                stopwords: Seq[String] = TextAnalysis.defaultStopwords)
      : Column = toColumn(TextStats(toExpression(text), stopwords))
}
