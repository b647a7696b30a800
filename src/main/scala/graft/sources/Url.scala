package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the identity step of crawl-layer dedup.
  * The same page arrives under many spellings (case-shifted hosts,
  * default ports, unsorted query params, tracking params, fragments,
  * dot-segments, gratuitous %-escapes); URL-level dedup and
  * per-domain accounting only work after collapsing them to one
  * canonical form. (The reference pipeline has fixed API endpoints
  * and no URL handling; this is brief-driven scale work.)
  *
  * Canonical form (RFC 3986 §6 normalizations + standard crawl
  * practice), applied to `scheme://host[:port][/path][?query][#frag]`
  * URLs; anything that doesn't parse (no `://`) passes through
  * unchanged with an empty domain:
  *   - scheme and host lowercase
  *   - default ports dropped (`:80` for http, `:443` for https);
  *     non-default ports kept
  *   - path: dot-segments resolved (RFC 3986 §5.2.4), `%`-escapes of
  *     UNRESERVED bytes decoded (`%6F` → `o`), remaining escape hex
  *     uppercased, empty path → `/`
  *   - query: `utm_*` tracking params dropped, params sorted by
  *     (key, value) with the same %-normalization, empty query
  *     dropped entirely
  *   - fragment dropped
  *   - `domain` = host minus one leading `www.` label
  *
  * Scale shape: per-row scan-parallel expression, zero exchanges —
  * canonicalization is the map side of whatever dedup/rollup follows.
  */
object UrlCanonicalize {

  val urlType: StructType = StructType(Seq(
    StructField("canonical", StringType, nullable = false),
    StructField("domain", StringType, nullable = false)))

  private val unreserved: Array[Boolean] = {
    val a = new Array[Boolean](128)
    ('a' to 'z').foreach(c => a(c) = true)
    ('A' to 'Z').foreach(c => a(c) = true)
    ('0' to '9').foreach(c => a(c) = true)
    "-._~".foreach(c => a(c) = true)
    a
  }

  /** Decode %-escapes of unreserved bytes, uppercase the hex of the
    * rest; malformed escapes pass through literally.
    */
  private def normEscapes(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        val v = Character.digit(s.charAt(i + 1), 16) * 16 +
          Character.digit(s.charAt(i + 2), 16)
        if (v < 128 && unreserved(v)) sb.append(v.toChar)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute path. */
  private def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val segs = path.split("/", -1)
    var endsDir = path.endsWith("/")
    segs.foreach {
      case "" | "." => ()
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case s => out += s
    }
    // "/a/b/.." and "/a/b/." address directories — keep the slash form
    if (segs.nonEmpty && (segs.last == "." || segs.last == ".."))
      endsDir = true
    val joined = "/" + out.mkString("/")
    if (endsDir && joined != "/") joined + "/" else joined
  }

  def canonicalize(url: String): (String, String) = {
    val si = url.indexOf("://")
    if (si <= 0) return (url, "")
    val scheme = url.substring(0, si).toLowerCase(java.util.Locale.ROOT)
    val rest = url.substring(si + 3)
    // authority ends at the first of / ? #
    var ae = 0
    while (ae < rest.length && rest.charAt(ae) != '/' &&
           rest.charAt(ae) != '?' && rest.charAt(ae) != '#') ae += 1
    val auth = rest.substring(0, ae).toLowerCase(java.util.Locale.ROOT)
    val (host, port) = auth.lastIndexOf(':') match {
      case -1 => (auth, "")
      case ci if auth.substring(ci + 1).forall(_.isDigit) &&
                 ci + 1 < auth.length =>
        (auth.substring(0, ci), auth.substring(ci + 1))
      case _ => (auth, "")
    }
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443"))
    val tail = rest.substring(ae)
    val hashAt = tail.indexOf('#')
    val noFrag = if (hashAt >= 0) tail.substring(0, hashAt) else tail
    val qAt = noFrag.indexOf('?')
    val rawPath = if (qAt >= 0) noFrag.substring(0, qAt) else noFrag
    val rawQuery = if (qAt >= 0) noFrag.substring(qAt + 1) else ""
    val path = removeDotSegments(normEscapes(rawPath))
    val params = rawQuery.split("&").toSeq
      .filter(_.nonEmpty)
      .map(normEscapes)
      .filterNot(p => p.takeWhile(_ != '=')
        .toLowerCase(java.util.Locale.ROOT).startsWith("utm_"))
      .sorted
    val query = if (params.isEmpty) "" else "?" + params.mkString("&")
    val domain = if (host.startsWith("www.")) host.substring(4) else host
    (scheme + "://" + host + (if (keepPort) ":" + port else "") +
      path + query, domain)
  }

  case class UrlCanonicalizeExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = urlType

    override def nullSafeEval(input: Any): Any = {
      val (canon, domain) =
        canonicalize(input.asInstanceOf[UTF8String].toString)
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(canon), UTF8String.fromString(domain)))
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  def urlCanonical(url: Column): Column =
    toColumn(UrlCanonicalizeExpr(toExpression(url)))

  // ------------------------------------------------------------------
  // Synthetic variant generation (test scaffolding): each doc's page
  // arrives under three deterministic spellings that all canonicalize
  // to the same URL — case/port/fragment noise, a %-escaped path with
  // a dot-segment and a tracking param, and a parent-hop path with
  // unsorted params. The SQL oracle writes the canonical form
  // directly from doc_id arithmetic, so the canonicalizer is checked
  // against first principles.
  // ------------------------------------------------------------------

  /** Three wire spellings of doc `id`'s canonical URL
    * `https://www.example{id%50}.com/docs/{id}?a={id%7}&b={id%11}`.
    */
  def variants(id: Long): Seq[String] = {
    val n = id % 50; val x = id % 7; val y = id % 11
    Seq(
      s"HTTPS://WWW.Example$n.COM:443/docs/$id?b=$y&a=$x#sec2",
      s"https://www.example$n.com/d%6Fcs/./$id" +
        s"?a=$x&utm_source=feed&b=$y",
      s"https://www.example$n.com/x/../docs/$id?utm_campaign=z&b=$y&a=$x")
  }

  /** One (doc_id, variant_ix, url) row per spelling — pure column
    * string-building (mirrors [[variants]] byte-for-byte; spec-pinned)
    * so generation stays inside whole-stage codegen with no Encoder
    * round-trip. Per-row explode, no shuffle.
    */
  def urlVariantsFromDocs(docs: DataFrame): DataFrame = {
    val id = col("doc_id").cast("long")
    val n = (id % 50).cast("string")
    val x = (id % 7).cast("string")
    val y = (id % 11).cast("string")
    val ids = id.cast("string")
    val v0 = concat(lit("HTTPS://WWW.Example"), n, lit(".COM:443/docs/"),
      ids, lit("?b="), y, lit("&a="), x, lit("#sec2"))
    val v1 = concat(lit("https://www.example"), n, lit(".com/d%6Fcs/./"),
      ids, lit("?a="), x, lit("&utm_source=feed&b="), y)
    val v2 = concat(lit("https://www.example"), n, lit(".com/x/../docs/"),
      ids, lit("?utm_campaign=z&b="), y, lit("&a="), x)
    docs.select(id.as("doc_id"),
        posexplode(array(v0, v1, v2)).as(Seq("variant_ix", "url")))
      .select(col("doc_id"),
        col("variant_ix").cast("long").as("variant_ix"), col("url"))
  }
}
