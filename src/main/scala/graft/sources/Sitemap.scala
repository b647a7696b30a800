package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** sitemaps.org sitemap ingestion — the crawl FRONTIER source that
  * pairs with [[RobotsIngest]] (robots.txt's `Sitemap:` lines point
  * here): parse each host's sitemap XML into (loc, lastmod) entries,
  * then diff against crawl history to get the fetch frontier. (The
  * reference pipeline fetches a fixed API host — reference
  * `src/ingestion.py:32-54` — and has no crawl layer; brief-driven
  * scale work.)
  *
  * Scope (the codec-seam discipline): `<urlset>` documents — one
  * `<url>` entry per page with `<loc>` (required; entries without
  * one are skipped) and optional `<lastmod>`, both with the basic
  * XML entity escapes decoded (&amp; &lt; &gt; &quot; &apos; — the
  * set the protocol requires for loc values). The walk is a plain
  * forward tag scan: no XML library, no DTD/namespace machinery, no
  * regex — malformed tails simply stop contributing entries.
  * `<sitemapindex>` child locs parse with the same walk (a `<sitemap>`
  * entry is shaped like a `<url>` entry), so an index file yields its
  * child sitemap locations for a fetch loop to follow.
  *
  * Scale shape: one [[SitemapEntries]] expression row per HOST
  * (host-bounded, like the robots rule parse); entries explode into
  * URL-sized rows and the frontier diff is a canonical-key anti/left
  * join — page content never appears anywhere.
  */
object SitemapIngest {

  /** Decode the five predefined XML entities (+ decimal/hex numeric
    * references) in a loc/lastmod value.
    */
  private[graft] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 10) { sb.append(c); i += 1 }
        else {
          val name = s.substring(i + 1, semi)
          val rep: String = name match {
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _ =>
              if (name.startsWith("#x") || name.startsWith("#X"))
                try Character.toString(
                  Integer.parseInt(name.substring(2), 16))
                catch { case _: Exception => null }
              else if (name.startsWith("#"))
                try Character.toString(
                  Integer.parseInt(name.substring(1)))
                catch { case _: Exception => null }
              else null
          }
          if (rep == null) { sb.append(c); i += 1 }
          else { sb.append(rep); i = semi + 1 }
        }
      }
    }
    sb.toString
  }

  /** Extract the text content of the FIRST `<tag>…</tag>` inside
    * `xml[from, to)`; entity-decoded, whitespace-trimmed; null when
    * absent or unterminated.
    */
  private def childText(xml: String, from: Int, to: Int,
                        tag: String): String = {
    val open = "<" + tag + ">"
    val close = "</" + tag + ">"
    val s = xml.indexOf(open, from)
    if (s < 0 || s >= to) return null
    val e = xml.indexOf(close, s + open.length)
    if (e < 0 || e > to) return null
    decodeEntities(xml.substring(s + open.length, e).trim)
  }

  /** Parse a sitemap/sitemapindex document into (loc, lastmod)
    * entries, document order preserved. Entries without a loc are
    * skipped; a truncated trailing entry stops the walk.
    */
  def parseEntries(xml: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // <url> for urlset documents, <sitemap> for index documents —
    // both carry <loc> (+ optional <lastmod>) children
    Seq("url", "sitemap").foreach { entryTag =>
      val open = "<" + entryTag + ">"
      val close = "</" + entryTag + ">"
      var i = xml.indexOf(open)
      while (i >= 0) {
        val end = xml.indexOf(close, i + open.length)
        if (end < 0) i = -1 // truncated entry: stop
        else {
          val loc = childText(xml, i, end, "loc")
          if (loc != null && loc.nonEmpty)
            out += ((loc, childText(xml, i, end, "lastmod")))
          i = xml.indexOf(open, end + close.length)
        }
      }
    }
    out.toSeq
  }

  private val entryType = StructType(Seq(
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true)))

  /** Native expression: sitemap XML → array<struct<loc,lastmod>>.
    * Runs once per HOST row (host-bounded, never URL-bounded).
    */
  case class SitemapEntries(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(entryType, containsNull = false)
    override def nullable: Boolean = child.nullable

    def entriesOf(u: UTF8String): GenericArrayData =
      new GenericArrayData(parseEntries(u.toString).map {
        case (loc, lastmod) => InternalRow(
          UTF8String.fromString(loc),
          if (lastmod == null) null else UTF8String.fromString(lastmod))
      }.toArray[Any])

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) null else entriesOf(v.asInstanceOf[UTF8String])
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("sitemapEntries", this)
      defineCodeGen(ctx, ev, c =>
        s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.entriesOf($c)")
    }

    override protected def withNewChildInternal(n: Expression)
        : Expression = copy(child = n)
  }

  def sitemapEntries(xml: Column): Column =
    toColumn(SitemapEntries(toExpression(xml)))
}
