package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RSS 2.0 / Atom feed discovery (r9 verdict item 4) — the OTHER
  * URL-discovery channel next to sitemaps: feeds surface new and
  * updated pages between sitemap refreshes, and a production frontier
  * merges both channels keyed by CANONICAL URL before scheduling
  * fetches. (The reference pipeline fetches a fixed API host —
  * reference `src/ingestion.py:32-54` — and has no crawl layer;
  * brief-driven scale work.)
  *
  * Scope (the [[SitemapIngest]] tag-walk discipline — no XML library,
  * no regex, truncation-tolerant): RSS `<item>` entries with
  * `<link>url</link>` / `<pubDate>` / `<title>` children, and Atom
  * `<entry>` entries with `<link href="url"/>` (the ATTRIBUTE form —
  * Atom's link is an empty element) / `<updated>` / `<title>`. Both
  * entry shapes are walked in one parse, so a mixed or mislabeled
  * feed still yields its entries; the five predefined XML entities
  * (+ numeric references) decode in every extracted value; an entry
  * without a resolvable link is skipped; an unterminated trailing
  * entry stops the walk (a torn feed contributes its intact prefix).
  *
  * Scale shape: one [[FeedEntries]] expression row per FEED
  * (host-bounded, like the robots/sitemap parses); entries explode
  * into URL-sized rows that canonicalize ([[UrlCanonicalize]]) and
  * merge into the sitemap frontier with a canonical-URL-keyed join —
  * feed XML never moves past its host row.
  */
object FeedIngest {

  /** One discovered entry: resolved link + the raw date string
    * (RSS pubDate or Atom updated) + title; date/title null when
    * absent.
    */
  final case class FeedEntry(loc: String, updated: String,
                             title: String)

  import SitemapIngest.decodeEntities

  /** Text of the FIRST `<tag>…</tag>` inside `[from, to)` —
    * entity-decoded, trimmed; null when absent/unterminated. Exact
    * open tag (`<tag>`), so Atom's attribute-form `<link href…>`
    * deliberately does NOT match the text form.
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

  /** One attribute's value inside an open-tag segment; null when
    * absent. Double-quoted form only (the Atom norm).
    */
  private def attrOf(seg: String, name: String): String = {
    val key = name + "=\""
    val hi = seg.indexOf(key)
    if (hi < 0) return null
    val vEnd = seg.indexOf('"', hi + key.length)
    if (vEnd < 0) return null
    seg.substring(hi + key.length, vEnd).trim
  }

  /** The entry's link: RSS text form first, then Atom's
    * `href="…"` attribute form. Real Atom entries list several
    * `<link>` tags and often put `rel="self"` / `rel="edit"` before
    * the page link, so ALL link tags in the entry are scanned and the
    * first `rel="alternate"` (or rel-less — alternate is Atom's
    * default, RFC 4287 §4.2.7.2) wins; self/edit/etc never resolve.
    */
  private def linkOf(xml: String, from: Int, to: Int): String = {
    val text = childText(xml, from, to, "link")
    if (text != null && text.nonEmpty) return text
    var s = xml.indexOf("<link", from)
    while (s >= 0 && s < to) {
      val gt = xml.indexOf('>', s)
      if (gt < 0 || gt > to) return null // torn tag: stop
      val seg = xml.substring(s, gt)
      val rel = attrOf(seg, "rel")
      if (rel == null || rel == "alternate") {
        val href = attrOf(seg, "href")
        if (href != null) {
          val v = decodeEntities(href)
          if (v.nonEmpty) return v
        }
      }
      s = xml.indexOf("<link", gt)
    }
    null
  }

  /** Parse a feed document into entries, document order preserved
    * per entry shape (RSS items, then Atom entries — a well-formed
    * feed only has one shape).
    */
  def parseEntries(xml: String): Seq[FeedEntry] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FeedEntry]
    Seq("item", "entry").foreach { entryTag =>
      val open = "<" + entryTag + ">"
      val close = "</" + entryTag + ">"
      var i = xml.indexOf(open)
      while (i >= 0) {
        val end = xml.indexOf(close, i + open.length)
        if (end < 0) i = -1 // truncated entry: stop
        else {
          val loc = linkOf(xml, i, end)
          if (loc != null) {
            val date = childText(xml, i, end, "pubDate") match {
              case null => childText(xml, i, end, "updated")
              case d => d
            }
            out += FeedEntry(loc, date, childText(xml, i, end, "title"))
          }
          i = xml.indexOf(open, end + close.length)
        }
      }
    }
    out.toSeq
  }

  private val entryType = StructType(Seq(
    StructField("loc", StringType, nullable = false),
    StructField("updated", StringType, nullable = true),
    StructField("title", StringType, nullable = true)))

  /** Native expression: feed XML → array<struct<loc,updated,title>>.
    * Runs once per FEED row (host-bounded, never URL-bounded).
    */
  case class FeedEntries(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(entryType, containsNull = false)
    override def nullable: Boolean = child.nullable

    def entriesOf(u: UTF8String): GenericArrayData =
      new GenericArrayData(parseEntries(u.toString).map { e =>
        InternalRow(
          UTF8String.fromString(e.loc),
          if (e.updated == null) null
          else UTF8String.fromString(e.updated),
          if (e.title == null) null
          else UTF8String.fromString(e.title))
      }.toArray[Any])

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) null else entriesOf(v.asInstanceOf[UTF8String])
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("feedEntries", this)
      defineCodeGen(ctx, ev, c =>
        s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.entriesOf($c)")
    }

    override protected def withNewChildInternal(n: Expression)
        : Expression = copy(child = n)
  }

  def feedEntries(xml: Column): Column =
    toColumn(FeedEntries(toExpression(xml)))
}
