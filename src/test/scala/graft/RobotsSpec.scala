package graft

import org.apache.spark.sql.functions._
import graft.sources.RobotsIngest
import graft.sources.RobotsIngest.Rule

/** robots.txt screening (RFC 9309): parser group selection, the
  * glob matcher's prefix/star/anchor semantics, longest-match
  * precedence with the Allow tiebreak, and the native-expression
  * round-trip through a DataFrame.
  */
class RobotsSpec extends SparkSpec {

  // ---- matcher ----

  test("prefix match: un-anchored patterns match any extension") {
    assert(RobotsIngest.matchLen("/nav/menu", "/nav") == 4)
    assert(RobotsIngest.matchLen("/nav", "/nav") == 4)
    assert(RobotsIngest.matchLen("/na", "/nav") == -1)
    assert(RobotsIngest.matchLen("/xnav", "/nav") == -1)
  }

  test("star wildcard: any sequence, including empty") {
    assert(RobotsIngest.matchLen("/a/b/c.pdf", "/a/*.pdf") == 8)
    assert(RobotsIngest.matchLen("/a/.pdf", "/a/*.pdf") == 8)
    assert(RobotsIngest.matchLen("/a/b/c.pdfx", "/a/*.pdf") == 8,
      "un-anchored star pattern is still a prefix match")
    assert(RobotsIngest.matchLen("/b/c.pdf", "/a/*.pdf") == -1)
    // backtracking: the star must try later bindings
    assert(RobotsIngest.matchLen("/x.tmp.tmp", "/*.tmp$") == 7)
  }

  test("$ anchor: must consume the path exactly") {
    assert(RobotsIngest.matchLen("/f/1.tmp", "/*.tmp$") == 7)
    assert(RobotsIngest.matchLen("/f/1.tmpx", "/*.tmp$") == -1)
    assert(RobotsIngest.matchLen("/id/44", "/id/44$") == 7)
    assert(RobotsIngest.matchLen("/id/445", "/id/44$") == -1)
    assert(RobotsIngest.matchLen("/id/14", "/id/*4$") == 7)
    assert(RobotsIngest.matchLen("/id/4", "/id/*4$") == 7,
      "star binds the empty sequence")
  }

  test("trailing star consumes the rest under an anchor too") {
    assert(RobotsIngest.matchLen("/anything/at/all", "/*$") == 3)
    assert(RobotsIngest.matchLen("/a", "/a*$") == 4)
  }

  // ---- decision ----

  test("longest match wins; Allow wins ties; no match allows") {
    val rules = Seq(Rule(false, "/nav"), Rule(true, "/nav/ok*"))
    assert(RobotsIngest.decide("/nav/menu", rules) ==
      ((false, "/nav", 4)))
    assert(RobotsIngest.decide("/nav/ok/7", rules) ==
      ((true, "/nav/ok*", 8)))
    assert(RobotsIngest.decide("/about", rules) == ((true, null, 0)))
    // exact tie: Allow wins regardless of rule order
    val tie = Seq(Rule(false, "/p/ab"), Rule(true, "/p/a*"))
    assert(RobotsIngest.decide("/p/ab", tie)._1,
      "equal-length Allow must win the tie")
  }

  // ---- parser ----

  private val body =
    """# robots
      |User-agent: other-bot
      |Disallow: /
      |
      |User-agent: *
      |Disallow: /nav   # trailing comment
      |Allow: /nav/ok*
      |Disallow:
      |Crawl-delay: 2
      |Sitemap: http://x/s.xml
      |""".stripMargin

  test("parser: * group, comment strip, empty Disallow is a no-op") {
    val rules = RobotsIngest.parseRules(body)
    assert(rules == Seq(Rule(false, "/nav"), Rule(true, "/nav/ok*")))
  }

  test("parser: exact agent group OVERRIDES the * group (RFC 2.2.1)") {
    val withAgent = "User-agent: GraftBot\nDisallow: /secret\n\n" + body
    val rules = RobotsIngest.parseRules(withAgent, "graftbot")
    assert(rules == Seq(Rule(false, "/secret")),
      "agent-specific group must replace, not extend, the * group")
    // a different agent still reads the * group
    assert(RobotsIngest.parseRules(withAgent, "nobody") ==
      Seq(Rule(false, "/nav"), Rule(true, "/nav/ok*")))
  }

  test("parser: consecutive User-agent lines share one group") {
    val multi = "User-agent: a-bot\nUser-agent: *\nDisallow: /x\n"
    assert(RobotsIngest.parseRules(multi) == Seq(Rule(false, "/x")))
    assert(RobotsIngest.parseRules(multi, "a-bot") ==
      Seq(Rule(false, "/x")))
  }

  test("parser: non-rule lines do not split a user-agent header block") {
    // de-facto REP parsers ignore unrecognized/non-rule lines without
    // terminating the header block: a and * here share ONE group (the
    // old behavior left a-bot with no rules at all)
    val interleaved = "User-agent: a-bot\nCrawl-delay: 1\n" +
      "User-agent: *\nDisallow: /x\n"
    assert(RobotsIngest.parseRules(interleaved) == Seq(Rule(false, "/x")))
    assert(RobotsIngest.parseRules(interleaved, "a-bot") ==
      Seq(Rule(false, "/x")))
    // but once rules have started, a later User-agent line still
    // begins a NEW group even with non-rule lines in between
    val twoGroups = "User-agent: a\nDisallow: /y\nCrawl-delay: 1\n" +
      "User-agent: b\nDisallow: /z\n"
    assert(RobotsIngest.parseRules(twoGroups, "a") ==
      Seq(Rule(false, "/y")))
    assert(RobotsIngest.parseRules(twoGroups, "b") ==
      Seq(Rule(false, "/z")))
  }

  test("parser: case-insensitive keys and CRLF lines") {
    val crlf = "USER-AGENT: *\r\nDISALLOW: /a\r\nALLOW: /a/b\r\n"
    assert(RobotsIngest.parseRules(crlf) ==
      Seq(Rule(false, "/a"), Rule(true, "/a/b")))
  }

  // ---- non-rule metadata: crawl-delay + sitemaps (r10) ----

  test("parseMeta: group-scoped crawl-delay, global sitemaps") {
    // the shared fixture: * group carries Crawl-delay: 2 and one
    // Sitemap line; other-bot's group has neither
    assert(RobotsIngest.parseMeta(body) ==
      ((Some(2.0), Seq("http://x/s.xml"))))
    // agent group present WITHOUT its own delay: group replacement
    // means NO delay (same semantics as rule groups), sitemaps stay
    // global
    val withAgent = "User-agent: GraftBot\nDisallow: /secret\n\n" + body
    assert(RobotsIngest.parseMeta(withAgent, "graftbot") ==
      ((None, Seq("http://x/s.xml"))))
    // agent group WITH its own delay wins over *
    val agentDelay = "User-agent: graftbot\nCrawl-delay: 0.5\n\n" + body
    assert(RobotsIngest.parseMeta(agentDelay, "graftbot")._1 ==
      Some(0.5))
    // malformed / non-positive delays are ignored
    assert(RobotsIngest.parseMeta(
      "User-agent: *\nCrawl-delay: soon\n")._1.isEmpty)
    assert(RobotsIngest.parseMeta(
      "User-agent: *\nCrawl-delay: -1\n")._1.isEmpty)
  }

  test("robotsMeta expression: struct round-trip over a DataFrame") {
    import spark.implicits._
    val out = Seq(("h1", body)).toDF("host", "robots_txt")
      .select(RobotsIngest.robotsMeta(
        org.apache.spark.sql.functions.col("robots_txt")).as("m"))
      .select("m.crawl_delay", "m.sitemaps")
      .head()
    assert(out.getDouble(0) == 2.0)
    assert(out.getSeq[String](1) == Seq("http://x/s.xml"))
  }

  // ---- native expressions over a DataFrame ----

  test("expression round-trip: rules array + decision struct") {
    import spark.implicits._
    val hosts = Seq(("h1", body)).toDF("host", "robots_txt")
      .select(col("host"),
        RobotsIngest.robotsRules(col("robots_txt")).as("rules"))
    val urls = Seq(("h1", "/nav/menu"), ("h1", "/nav/ok/3"),
      ("h1", "/about")).toDF("host", "path")
    val out = urls.join(broadcast(hosts), Seq("host"))
      .withColumn("dc",
        RobotsIngest.robotsDecide(col("path"), col("rules")))
      .select(col("path"),
        col("dc.allowed"), col("dc.rule"), col("dc.match_len"))
      .collect().map(r => (r.getString(0), r.getBoolean(1),
        Option(r.getString(2)), r.getInt(3))).toSet
    assert(out == Set(
      ("/nav/menu", false, Some("/nav"), 4),
      ("/nav/ok/3", true, Some("/nav/ok*"), 8),
      ("/about", true, None, 0)))
  }
}
