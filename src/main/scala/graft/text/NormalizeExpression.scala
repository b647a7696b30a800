package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization as one native expression: Unicode NFC
  * composition → lowercase → whitespace collapse → trim.
  *
  * This is the step every dedup pipeline runs BEFORE fingerprinting:
  * the same text arrives precomposed ("é" U+00E9) from one crawler
  * and decomposed ("e"+U+0301) from another, with case and spacing
  * drift on top — byte-level hashes split what is humanly one
  * document. Spark has no NFC builtin, so the column formulation
  * would be a Scala UDF (no codegen, boxed strings); this expression
  * keeps the whole canonicalization in one eval with exactly the
  * DuckDB-expressible semantics:
  *
  *   - NFC via `java.text.Normalizer` == DuckDB `nfc_normalize`
  *     (both implement UAX#15 canonical composition);
  *   - lowercase AFTER composition via `UTF8String.toLowerCase`
  *     (Spark's own `lower()`), matching DuckDB's Unicode `lower`;
  *   - whitespace collapse `\s+` → one space, then trim — following
  *     RE2's `\s` = [ \t\n\f\r] (NO vertical tab: RE2 deliberately
  *     excludes \x0B, unlike Java's \s), because the oracle twin is
  *     DuckDB/RE2 `regexp_replace(s, '\s+', ' ', 'g')` (r5 advice).
  *
  * Scale shape: per-row, allocation-bounded, no shuffle — normalizing
  * 100 TB costs exactly one pass over the text.
  */
object NormalizeExpression {

  /** Shared by eval and any future codegen split: the exact pipeline
    * the Scaladoc pins.
    */
  def normalize(s: String): String = {
    val nfc = java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC)
    val lower = UTF8String.fromString(nfc).toLowerCase.toString
    // single pass: copy, folding runs of ASCII whitespace to ' '
    val sb = new java.lang.StringBuilder(lower.length)
    var i = 0
    var pendingSpace = false
    while (i < lower.length) {
      val c = lower.charAt(i)
      // RE2 \s: space, tab, newline, formfeed, carriage return —
      // NOT vertical tab (0x0B), which Java's \s includes but the
      // RE2-based oracle does not
      val isWs = c == ' ' || c == '\t' || c == '\n' ||
        c == '\f' || c == '\r'
      if (isWs) pendingSpace = sb.length() > 0 // leading ws trims away
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  case class NormText(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType

    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(
        normalize(input.asInstanceOf[UTF8String].toString))

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  def normText(text: Column): Column =
    toColumn(NormText(toExpression(text)))
}
