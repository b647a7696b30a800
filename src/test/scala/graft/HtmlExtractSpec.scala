package graft

import graft.text.HtmlExtract

/** HTML main-content extraction: hand-built golden pages (the parse
  * cases the synthetic generator can't isolate one at a time), the
  * generator round-trip contract, and chrome rejection.
  */
class HtmlExtractSpec extends SparkSpec {

  private def extract(html: String) = {
    import spark.implicits._
    Seq(html).toDF("h")
      .select(HtmlExtract.htmlExtract(org.apache.spark.sql.functions
        .col("h")).as("x"))
      .select("x.title", "x.main_text", "x.n_paragraphs", "x.n_links",
        "x.link_text_chars")
      .collect().head
  }

  test("golden page: title, paragraph text, chrome rejection") {
    val r = extract(
      "<html><head><title>My &amp; Title</title>" +
        "<script>if (1 < 2) { alert('<p>not a para</p>'); }</script>" +
        "</head><body>" +
        "<nav><a href=\"/\">Home</a></nav>" +
        "<p>plain text</p>" +
        "<p>with <a href=\"/x\">a link</a> inside</p>" +
        "<footer>&copy; corp</footer></body></html>")
    assert(r.getString(0) == "My & Title")
    assert(r.getString(1) == "plain text\nwith a link inside")
    assert(r.getLong(2) == 2L)
    // the nav link is chrome, only the in-paragraph link counts
    assert(r.getLong(3) == 1L)
    assert(r.getLong(4) == "a link".length.toLong)
  }

  test("entities decode only the generated three; unknown pass through") {
    val r = extract("<p>&lt;tag&gt; &amp; &nbsp; &amp</p>")
    assert(r.getString(1) == "<tag> & &nbsp; &amp")
  }

  test("numeric references: printable BMP decode, the rest literal") {
    val r = extract("<p>&#65;&#x41;&#x6a; &#169;</p>")
    assert(r.getString(1) == "AAj ©")
    // unterminated, control-range, surrogate, and overflow stay literal
    val bad = extract("<p>&#65 &#12; &#xD800; &#1114112; &#;</p>")
    assert(bad.getString(1) == "&#65 &#12; &#xD800; &#1114112; &#;")
  }

  test("style blocks and unterminated tags don't corrupt the walk") {
    val r = extract(
      "<style>p::before { content: '<'; }</style><p>ok</p><p>tail<")
    assert(r.getString(1) == "ok\ntail")
    assert(r.getLong(2) == 2L)
  }

  test("tags with attributes and self-closing noise inside paragraphs") {
    val r = extract("<p>one<br/>two <b class=\"x\">bold</b></p>")
    assert(r.getString(1) == "onetwo bold")
    assert(r.getLong(3) == 0L)
  }

  test("generator round-trip: extraction equals the windowed original") {
    // 100 tokens -> 3 paragraphs (40/40/20); paragraph 1 is linked
    val words = (0 until 100).map(i => s"w$i")
    val text = words.mkString(" ")
    val html = HtmlExtract.renderPage(9L, "web", text)
    val r = extract(html)
    assert(r.getString(0) == "Doc 9 (web)")
    val expected = Seq(words.slice(0, 40), words.slice(40, 80),
      words.slice(80, 100)).map(_.mkString(" ")).mkString("\n")
    assert(r.getString(1) == expected)
    assert(r.getLong(2) == 3L)
    assert(r.getLong(3) == 1L)
    assert(r.getLong(4) == "w40".length.toLong)
  }

  test("generator round-trip survives markup-hostile characters") {
    val text = "a<b> c&d &amp; <script>boom</script> " +
      ((0 until 45).map(_ => "x").mkString(" "))
    val html = HtmlExtract.renderPage(3L, "s&p", text)
    val r = extract(html)
    assert(r.getString(0) == "Doc 3 (s&p)")
    // paragraph join with \n at the 40-token boundary, content intact
    val toks = text.split(" ", -1)
    val expected = toks.grouped(40).map(_.mkString(" ")).mkString("\n")
    assert(r.getString(1) == expected)
    // paragraph 1 links its first token
    assert(r.getLong(3) == 1L)
    assert(r.getLong(4) == toks(40).length.toLong)
  }

  test("empty text still renders and extracts one empty paragraph") {
    val r = extract(HtmlExtract.renderPage(0L, "web", ""))
    assert(r.getString(1) == "")
    assert(r.getLong(2) == 1L)
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
  }
}
