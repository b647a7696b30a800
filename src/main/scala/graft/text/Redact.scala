package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PII / pattern scrubbing for corpus cleaning (no reference analog —
  * a standard pre-training privacy pass, cf. the C4/RefinedWeb-style
  * cleaning steps).
  *
  * Patterns stay inside the RE2-compatible subset (character classes,
  * bounded quantifiers, alternation — no backrefs or lookaround) so
  * the DuckDB oracle applies the *same* regex strings and so a future
  * port to an RE2-based engine needs no rewrites. Everything is
  * `functions.regexp_*` — codegen'd, scan-speed, no UDFs: at 100 TB
  * the scrub runs inside the same WholeStageCodegen span as the scan.
  *
  * Replacement order is part of the contract (URL before EMAIL before
  * IP before PHONE): a URL path can contain '@' or dotted quads, and
  * redacting URLs first keeps the later passes from matching inside
  * an already-redacted span. Counts are taken on the ORIGINAL text,
  * independent of that order.
  */
object Redact {

  /** scheme://host/path — path chars restricted to the unreserved set. */
  val UrlRe = "https?://[A-Za-z0-9._/-]+"

  /** local@domain.tld (tld ≥ 2 alpha). `#` allowed in the local part
    * (TPC-H-style synthetic names carry it).
    */
  val EmailRe = "[A-Za-z0-9._%+#-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version strings don't match. */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** +CC-NNN-NNNN international-ish phone shape. */
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Pattern classes in the pinned replacement order. */
  val patterns: Seq[(String, String)] = Seq(
    "URL" -> UrlRe, "EMAIL" -> EmailRe, "IP" -> Ipv4Re,
    "PHONE" -> PhoneRe)

  /** Matches of one pattern class in `text` (counted pre-redaction). */
  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** `text` with every pattern class replaced by its `<CLASS>` tag,
    * applied in [[patterns]] order.
    */
  def scrub(text: Column): Column =
    patterns.foldLeft(text) { case (c, (tag, re)) =>
      regexp_replace(c, re, s"<$tag>")
    }

  private[text] lazy val compiled: Seq[(String, java.util.regex.Pattern)] =
    patterns.map { case (tag, re) =>
      tag -> java.util.regex.Pattern.compile(re)
    }

  val redactStatsType: StructType = StructType(Seq(
    StructField("n_urls", LongType, nullable = false),
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))

  /** All four counts + the redacted text in ONE native expression.
    *
    * The column-function formulation ([[countMatches]]×4 + [[scrub]])
    * plans 8 independent regex expressions over the same string — and
    * `regexp_extract_all` materializes an array of every match just so
    * `size()` can count it. This expression walks each pattern once
    * with a streaming `Matcher.find()` count (no match array, no
    * per-expression UTF8String→String re-decode) and applies the four
    * replacements in the same pinned order as [[scrub]]. Semantics are
    * bit-identical: same java regex strings, counts on the ORIGINAL
    * text, URL→EMAIL→IP→PHONE replacement order — the DuckDB oracle
    * is unchanged.
    */
  case class RedactStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = redactStatsType

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val counts = new Array[Any](5)
      var i = 0
      compiled.foreach { case (_, p) =>
        var n = 0L
        val m = p.matcher(s)
        while (m.find()) n += 1
        counts(i) = n
        i += 1
      }
      var cur = s
      compiled.foreach { case (tag, p) =>
        cur = p.matcher(cur).replaceAll(s"<$tag>")
      }
      counts(4) = UTF8String.fromString(cur)
      new GenericInternalRow(counts)
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  def redactStats(text: Column): Column =
    toColumn(RedactStats(toExpression(text)))
}
