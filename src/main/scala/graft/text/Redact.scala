package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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

  // ---------------------------------------------------------------
  // Hand-rolled single-pass scanners.
  //
  // The four patterns are deliberately RE2-subset — bounded
  // char-class runs around literal anchors (':', '@', '.', '+') with
  // no backrefs or lookaround — so each is recognizable by a direct
  // left-to-right scan with NO backtracking engine at all. The
  // scanners below are exact replicas of java.util.regex leftmost-
  // greedy semantics for these specific patterns (the equivalence is
  // derivable per pattern and is additionally fuzz-checked against
  // java.util.regex in MergeRedactSpec).
  //
  // They scan the UTF8String BYTES directly: every pattern is pure
  // ASCII, and a UTF-8 lead/continuation byte (>= 0x80) matches no
  // ASCII class, so byte-level scanning equals scanning the decoded
  // string — and skips the UTF8String->String decode plus the regex
  // engine entirely. \b is ASCII-word (RE2 semantics, what the
  // DuckDB oracle runs). NB java.util.regex's \b is Unicode-aware
  // even without UNICODE_CHARACTER_CLASS, so on matches adjacent to
  // non-ASCII letters the scanners deliberately side with RE2, not
  // Java (e.g. 'é1.2.3.4' contains an IP here and in DuckDB, not in
  // Java); on ASCII text all three engines agree.
  // ---------------------------------------------------------------

  @inline private def isDigit(c: Int): Boolean = c >= '0' && c <= '9'
  @inline private def isAlpha(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  @inline private def isAlnum(c: Int): Boolean = isDigit(c) || isAlpha(c)
  @inline private def isWord(c: Int): Boolean = isAlnum(c) || c == '_'
  /** `[A-Za-z0-9._/-]` */
  @inline private def isUrlChar(c: Int): Boolean =
    isAlnum(c) || c == '.' || c == '_' || c == '/' || c == '-'
  /** `[A-Za-z0-9._%+#-]` */
  @inline private def isLocalChar(c: Int): Boolean =
    isAlnum(c) || c == '.' || c == '_' || c == '%' || c == '+' ||
      c == '#' || c == '-'
  /** `[A-Za-z0-9.-]` */
  @inline private def isDomainChar(c: Int): Boolean =
    isAlnum(c) || c == '.' || c == '-'

  /** Append-only byte buffer for the replacement passes; allocated
    * lazily so a no-match pass allocates nothing.
    */
  private final class ByteBuilder {
    private var buf: Array[Byte] = _
    private var len = 0
    private def ensure(extra: Int): Unit = {
      if (buf == null) buf = new Array[Byte](math.max(64, extra * 2))
      else if (len + extra > buf.length)
        buf = java.util.Arrays.copyOf(buf,
          math.max(buf.length * 2, len + extra))
    }
    def append(src: Array[Byte], from: Int, until: Int): Unit = {
      val n = until - from
      if (n > 0) { ensure(n); System.arraycopy(src, from, buf, len, n); len += n }
      else if (buf == null) ensure(0)
    }
    def result(): Array[Byte] =
      if (buf == null) Array.emptyByteArray
      else java.util.Arrays.copyOf(buf, len)
  }

  private val UrlTag = "<URL>".getBytes
  private val EmailTag = "<EMAIL>".getBytes
  private val IpTag = "<IP>".getBytes
  private val PhoneTag = "<PHONE>".getBytes

  /** `https?://[A-Za-z0-9._/-]+`: literal prefix then a maximal
    * url-class run (>=1). Nothing follows the greedy `+`, so Java's
    * match is exactly prefix + maximal run.
    */
  private def scanUrl(a: Array[Byte], out: ByteBuilder): Long = {
    val n = a.length
    var i = 0; var last = 0; var cnt = 0L
    while (i < n) {
      var matchedEnd = -1
      if (a(i) == 'h' && i + 7 < n && a(i + 1) == 't' && a(i + 2) == 't' &&
          a(i + 3) == 'p') {
        var body = -1
        if (a(i + 4) == 's') {
          if (i + 8 < n && a(i + 5) == ':' && a(i + 6) == '/' &&
              a(i + 7) == '/') body = i + 8
        } else if (a(i + 4) == ':' && a(i + 5) == '/' && a(i + 6) == '/')
          body = i + 7
        if (body >= 0 && body < n && isUrlChar(a(body) & 0xff)) {
          var e = body + 1
          while (e < n && isUrlChar(a(e) & 0xff)) e += 1
          matchedEnd = e
        }
      }
      if (matchedEnd > 0) {
        cnt += 1
        if (out != null) { out.append(a, last, i); out.append(UrlTag, 0, UrlTag.length); last = matchedEnd }
        i = matchedEnd
      } else i += 1
    }
    if (out != null && cnt > 0) out.append(a, last, n)
    cnt
  }

  /** `[A-Za-z0-9._%+#-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`.
    *
    * For each '@': the leftmost start is the start of the maximal
    * local-class run ending at the '@' (clamped to the previous match
    * end — Java resumes find() there). Greedy domain backtracking
    * reduces to: largest dot position k (>= one domain char past the
    * '@') inside the maximal domain run with >= 2 alphas following;
    * the match then extends through the maximal alpha run after k.
    */
  private def scanEmail(a: Array[Byte], out: ByteBuilder): Long = {
    val n = a.length
    var i = 0; var pos = 0; var last = 0; var cnt = 0L
    while (i < n) {
      var matched = false
      if (a(i) == '@') {
        var ls = i
        while (ls > pos && isLocalChar(a(ls - 1) & 0xff)) ls -= 1
        if (ls < i) {
          var de = i + 1
          while (de < n && isDomainChar(a(de) & 0xff)) de += 1
          var k = de - 3
          var dot = -1
          while (k >= i + 2 && dot < 0) {
            if (a(k) == '.' && isAlpha(a(k + 1) & 0xff) &&
                isAlpha(a(k + 2) & 0xff)) dot = k
            else k -= 1
          }
          if (dot >= 0) {
            var e = dot + 3
            while (e < n && isAlpha(a(e) & 0xff)) e += 1
            cnt += 1
            if (out != null) { out.append(a, last, ls); out.append(EmailTag, 0, EmailTag.length); last = e }
            pos = e; i = e; matched = true
          }
        }
      }
      if (!matched) i += 1
    }
    if (out != null && cnt > 0) out.append(a, last, n)
    cnt
  }

  /** `\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b`.
    *
    * Each octet is a maximal digit run bounded by the literal dots,
    * so greedy backtracking collapses to: run length 1..3 with a '.'
    * (octets 1-3) or a non-word/end (octet 4) immediately after the
    * run. `\b` before the first digit = non-word predecessor.
    */
  private def scanIp(a: Array[Byte], out: ByteBuilder): Long = {
    val n = a.length
    var i = 0; var last = 0; var cnt = 0L
    while (i < n) {
      var matchedEnd = -1
      if (isDigit(a(i) & 0xff) && (i == 0 || !isWord(a(i - 1) & 0xff))) {
        var p = i; var oct = 0; var ok = true
        while (oct < 3 && ok) {
          var r = p
          while (r < n && isDigit(a(r) & 0xff)) r += 1
          if (r - p >= 1 && r - p <= 3 && r < n && a(r) == '.') {
            p = r + 1; oct += 1
          } else ok = false
        }
        if (ok) {
          var r = p
          while (r < n && isDigit(a(r) & 0xff)) r += 1
          if (r - p >= 1 && r - p <= 3 &&
              (r == n || !isWord(a(r) & 0xff))) matchedEnd = r
        }
      }
      if (matchedEnd > 0) {
        cnt += 1
        if (out != null) { out.append(a, last, i); out.append(IpTag, 0, IpTag.length); last = matchedEnd }
        i = matchedEnd
      } else i += 1
    }
    if (out != null && cnt > 0) out.append(a, last, n)
    cnt
  }

  /** `\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}`: greedy {1,2} tries two digits
    * + '-', falls back to one digit + '-'; the exact-count groups
    * admit no backtracking.
    */
  private def scanPhone(a: Array[Byte], out: ByteBuilder): Long = {
    val n = a.length
    var i = 0; var last = 0; var cnt = 0L
    while (i < n) {
      var matchedEnd = -1
      if (a(i) == '+') {
        var p = -1
        if (i + 3 < n && isDigit(a(i + 1) & 0xff) &&
            isDigit(a(i + 2) & 0xff) && a(i + 3) == '-') p = i + 4
        else if (i + 2 < n && isDigit(a(i + 1) & 0xff) && a(i + 2) == '-')
          p = i + 3
        if (p > 0 && p + 8 <= n &&
            isDigit(a(p) & 0xff) && isDigit(a(p + 1) & 0xff) &&
            isDigit(a(p + 2) & 0xff) && a(p + 3) == '-' &&
            isDigit(a(p + 4) & 0xff) && isDigit(a(p + 5) & 0xff) &&
            isDigit(a(p + 6) & 0xff) && isDigit(a(p + 7) & 0xff))
          matchedEnd = p + 8
      }
      if (matchedEnd > 0) {
        cnt += 1
        if (out != null) { out.append(a, last, i); out.append(PhoneTag, 0, PhoneTag.length); last = matchedEnd }
        i = matchedEnd
      } else i += 1
    }
    if (out != null && cnt > 0) out.append(a, last, n)
    cnt
  }

  private def replacePass(a: Array[Byte],
      scan: (Array[Byte], ByteBuilder) => Long): Array[Byte] = {
    val bb = new ByteBuilder
    if (scan(a, bb) == 0L) a else bb.result()
  }

  /** Static entry shared by interpreted eval and codegen: four
    * streaming counts on the ORIGINAL bytes, then the pinned
    * URL→EMAIL→IP→PHONE replacement chain — bit-identical to the
    * java-regex formulation, with no regex engine and no decode.
    */
  def redactEval(input: UTF8String): GenericInternalRow = {
    val a = input.getBytes
    val out = new Array[Any](5)
    out(0) = scanUrl(a, null)
    out(1) = scanEmail(a, null)
    out(2) = scanIp(a, null)
    out(3) = scanPhone(a, null)
    var cur = a
    cur = replacePass(cur, scanUrl)
    cur = replacePass(cur, scanEmail)
    cur = replacePass(cur, scanIp)
    cur = replacePass(cur, scanPhone)
    out(4) = UTF8String.fromBytes(cur)
    new GenericInternalRow(out)
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
    * `size()` can count it. This expression walks the raw UTF8String
    * BYTES once per pattern with the hand-rolled scanners above (no
    * regex engine, no match array, no UTF8String→String decode) and
    * applies the four replacements in the same pinned order as
    * [[scrub]]. Semantics are bit-identical to the java-regex
    * formulation (fuzz-checked in MergeRedactSpec): counts on the
    * ORIGINAL text, URL→EMAIL→IP→PHONE replacement order — the DuckDB
    * oracle is unchanged. Codegen'd via a static call so the scrub
    * stays inside the WholeStageCodegen span.
    */
  case class RedactStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = redactStatsType

    override def nullSafeEval(input: Any): Any =
      redactEval(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.text.Redact.redactEval($c);")

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  def redactStats(text: Column): Column =
    toColumn(RedactStats(toExpression(text)))
}
