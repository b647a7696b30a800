package graft

import org.apache.spark.sql.functions._
import graft.sources.SitemapIngest

/** Sitemap XML ingestion: the tag-walk parser's goldens (urlset,
  * sitemapindex, entity decode, skipped/truncated entries) and the
  * native-expression round-trip.
  */
class SitemapSpec extends SparkSpec {

  test("urlset: loc + optional lastmod, document order") {
    val xml = """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |<url><loc>http://a/1</loc><lastmod>2026-01-02</lastmod></url>
      |<url><loc> http://a/2 </loc></url>
      |<url><lastmod>2026-03-04</lastmod></url>
      |<url><loc>http://a/3</loc><lastmod>2026-03-05</lastmod></url>
      |</urlset>""".stripMargin
    assert(SitemapIngest.parseEntries(xml) == Seq(
      ("http://a/1", "2026-01-02"),
      ("http://a/2", null), // trimmed, lastmod absent
      ("http://a/3", "2026-03-05"))) // loc-less entry skipped
  }

  test("sitemapindex: child sitemap locs parse with the same walk") {
    val xml = "<sitemapindex>" +
      "<sitemap><loc>http://a/s1.xml</loc>" +
      "<lastmod>2026-02-02</lastmod></sitemap>" +
      "<sitemap><loc>http://a/s2.xml</loc></sitemap>" +
      "</sitemapindex>"
    assert(SitemapIngest.parseEntries(xml) == Seq(
      ("http://a/s1.xml", "2026-02-02"), ("http://a/s2.xml", null)))
  }

  test("entity decode: the five predefined + numeric references") {
    val xml = "<urlset><url>" +
      "<loc>http://a/p?x=1&amp;y=2&lt;3&gt;&quot;&apos;&#65;&#x42;</loc>" +
      "</url></urlset>"
    assert(SitemapIngest.parseEntries(xml) ==
      Seq(("http://a/p?x=1&y=2<3>\"'AB", null)))
    // unknown/invalid references pass through literally
    assert(SitemapIngest.decodeEntities("a&unknown;b&#xZZ;c") ==
      "a&unknown;b&#xZZ;c")
  }

  test("truncated trailing entry stops the walk cleanly") {
    val xml = "<urlset><url><loc>http://a/1</loc></url>" +
      "<url><loc>http://a/2</loc>" // no </url>, no </urlset>
    assert(SitemapIngest.parseEntries(xml) ==
      Seq(("http://a/1", null)))
    assert(SitemapIngest.parseEntries("") == Seq())
    assert(SitemapIngest.parseEntries("not xml at all") == Seq())
  }

  test("expression round-trip over a DataFrame") {
    import spark.implicits._
    val xml = "<urlset><url><loc>http://h/1</loc>" +
      "<lastmod>2026-05-06</lastmod></url>" +
      "<url><loc>http://h/2</loc></url></urlset>"
    val out = Seq(("h", xml)).toDF("host", "xml")
      .select(col("host"),
        explode(SitemapIngest.sitemapEntries(col("xml"))).as("en"))
      .select(col("en.loc"), col("en.lastmod"))
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
      .toSeq
    assert(out == Seq(("http://h/1", Some("2026-05-06")),
      ("http://h/2", None)))
  }
}
