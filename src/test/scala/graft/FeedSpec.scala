package graft

import org.apache.spark.sql.functions._
import graft.sources.FeedIngest
import graft.sources.FeedIngest.FeedEntry

/** RSS/Atom feed parsing goldens (r9 verdict item 4): both entry
  * shapes, the attribute-form Atom link, entity decode, and the
  * hand-truncated-feed tolerance the Sitemap parser pins.
  */
class FeedSpec extends SparkSpec {

  private val rss =
    """<?xml version="1.0"?><rss version="2.0"><channel>
      |<title>chan</title><link>http://h/</link>
      |<item><link>http://h/a</link>
      |<pubDate>Mon, 01 Jun 2026 10:00:00 GMT</pubDate>
      |<title>A &amp; B</title></item>
      |<item><title>no link: skipped</title></item>
      |<item><link>http://h/b?x=1&amp;y=2</link></item>
      |</channel></rss>""".stripMargin

  private val atom =
    """<feed xmlns="http://www.w3.org/2005/Atom">
      |<title>chan</title>
      |<entry><link href="http://h/p%20q" rel="alternate"/>
      |<updated>2026-06-01T10:00:00Z</updated>
      |<title>&#65;tom</title></entry>
      |<entry><link href="http://h/r"/></entry>
      |</feed>""".stripMargin

  test("RSS items: text-form link, pubDate, entity-decoded title; " +
      "linkless items skipped") {
    // the channel-level <link>http://h/</link> sits OUTSIDE any
    // <item> and must not surface
    assert(FeedIngest.parseEntries(rss) == Seq(
      FeedEntry("http://h/a", "Mon, 01 Jun 2026 10:00:00 GMT",
        "A & B"),
      FeedEntry("http://h/b?x=1&y=2", null, null)))
  }

  test("Atom entries: attribute-form link, updated, numeric entity") {
    assert(FeedIngest.parseEntries(atom) == Seq(
      FeedEntry("http://h/p%20q", "2026-06-01T10:00:00Z", "Atom"),
      FeedEntry("http://h/r", null, null)))
  }

  test("Atom multi-link entries: rel=self/edit before the page link " +
      "never win; alternate or rel-less resolves") {
    val multi =
      """<feed>
        |<entry><link rel="self" href="http://h/feed/1"/>
        |<link rel="edit" href="http://h/edit/1"/>
        |<link rel="alternate" href="http://h/page1"/></entry>
        |<entry><link rel="self" href="http://h/feed/2"/>
        |<link href="http://h/page2"/></entry>
        |<entry><link rel="self" href="http://h/feed/3"/></entry>
        |</feed>""".stripMargin
    // entry 3 has ONLY a self link — no resolvable page URL: skipped
    assert(FeedIngest.parseEntries(multi) == Seq(
      FeedEntry("http://h/page1", null, null),
      FeedEntry("http://h/page2", null, null)))
  }

  test("hand-truncated feed yields its intact prefix") {
    // tear mid-way through the second item's link text
    val torn = rss.substring(0, rss.indexOf("http://h/b") + 4)
    assert(FeedIngest.parseEntries(torn) == Seq(
      FeedEntry("http://h/a", "Mon, 01 Jun 2026 10:00:00 GMT",
        "A & B")))
    // tear inside an Atom href attribute: entry contributes nothing
    val tornAtom = atom.substring(0, atom.indexOf("p%20q"))
    assert(FeedIngest.parseEntries(tornAtom).isEmpty)
  }

  test("expression round-trip over a DataFrame") {
    import spark.implicits._
    val out = Seq(("r", rss), ("a", atom)).toDF("k", "xml")
      .select(col("k"),
        explode(FeedIngest.feedEntries(col("xml"))).as("en"))
      .select(col("k"), col("en.loc"), col("en.updated"),
        col("en.title"))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)).orNull, Option(r.getString(3)).orNull))
      .toSet
    assert(out == Set(
      ("r", "http://h/a", "Mon, 01 Jun 2026 10:00:00 GMT", "A & B"),
      ("r", "http://h/b?x=1&y=2", null, null),
      ("a", "http://h/p%20q", "2026-06-01T10:00:00Z", "Atom"),
      ("a", "http://h/r", null, null)))
  }
}
