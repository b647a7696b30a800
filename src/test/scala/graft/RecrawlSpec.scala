package graft

import org.apache.spark.sql.Row
import graft.sources.Recrawl

/** Recrawl planner goldens (r9 verdict item 2): change-rate
  * estimation, the conditional-fetch decision's three branches
  * (lastmod hint / estimator fallback / never-crawled), and the
  * per-host politeness packing — all hand-computed.
  */
class RecrawlSpec extends SparkSpec {

  import spark.implicits._

  // frontier: host h1 carries the decision branches; h2 checks that
  // packing is per-host
  private def frontier = Seq[(String, String, Option[Long])](
    // loc, host, lastmod_day (None = no sitemap hint)
    ("u/new", "h1", Some(50L)),   // never crawled → fetch
    ("u/mod", "h1", Some(90L)),   // lastmod 90 > last crawl 60 → fetch
    ("u/old", "h1", Some(10L)),   // lastmod 10 < last crawl → NO fetch
    ("u/hot", "h1", None),        // no hint, high rate → fetch
    ("u/cold", "h1", None),       // no hint, low rate → NO fetch
    ("u/hot2", "h1", None),       // second estimator candidate
    ("u/other", "h2", Some(95L))  // different host → own slots
  ).toDF("loc", "host", "lastmod_day")

  private def history = Seq(
    // u/mod: 1 crawl, unchanged, day 60 → rate (0+.5)/2 = .25
    ("u/mod", 60L, false),
    // u/old: 1 crawl, changed, day 60 → rate .75 (rate is moot: the
    // lastmod hint says nothing changed since day 60)
    ("u/old", 60L, true),
    // u/hot: 3 crawls, 3 changed, last day 80 → rate 3.5/4 = .875
    // expected changes = .875 * 20 = 17.5 → fetch, pu = 17_500_000
    ("u/hot", 40L, true), ("u/hot", 60L, true), ("u/hot", 80L, true),
    // u/cold: 3 crawls, 0 changed, last day 80 → rate .5/4 = .125
    // expected = .125 * 20 = 2.5?? — no: pu = floor(.125*20*1e6+.5)
    //          = 2_500_000 ≥ 500_000 → would fetch. Make it colder:
    // last crawl day 99 → expected = .125 * 1 = .125 → pu = 125_000
    ("u/cold", 60L, false), ("u/cold", 80L, false), ("u/cold", 99L, false),
    // u/hot2: 1 crawl, changed, day 90 → rate .75, expected = .75*10
    // = 7.5 → pu = 7_500_000 → fetch
    ("u/hot2", 90L, true),
    // u/other: 1 crawl, unchanged, day 90; lastmod 95 > 90 → fetch
    ("u/other", 90L, false)
  ).toDF("loc", "crawl_day", "changed")

  test("decision branches, priorities, and per-host packing (slots=2)") {
    val out = Recrawl.plan(frontier, history, nowDay = 100L,
        slotsPerHost = 2)
      .collect().map(r => r.getString(1) -> r).toMap

    def f(r: Row, i: Int): Any = if (r.isNullAt(i)) null else r.get(i)
    // columns: host loc n_crawls n_changes last_crawl_day lastmod_day
    //          change_rate priority_units need_fetch host_rank cycle
    //          scheduled
    val need = out.view.mapValues(_.getBoolean(8)).toMap
    assert(need == Map("u/new" -> true, "u/mod" -> true,
      "u/old" -> false, "u/hot" -> true, "u/cold" -> false,
      "u/hot2" -> true, "u/other" -> true), s"need_fetch: $need")

    // change rates (smoothed): hot 3.5/4, cold .5/4, mod/hot2 .75/.25
    assert(out("u/hot").getDouble(6) == 0.875)
    assert(out("u/cold").getDouble(6) == 0.125)
    assert(out("u/mod").getDouble(6) == 0.25)
    assert(f(out("u/new"), 6) == null,
      "a never-crawled URL has no rate")
    assert(out("u/hot").getLong(7) == 17500000L)
    assert(out("u/cold").getLong(7) == 125000L)

    // h1 packing, slots=2: new URLs first (null priority ranks
    // ahead), then hot (17.5M) > hot2 (7.5M) > mod (10M)?? — no:
    // mod pu = floor(.25*40*1e6+.5) = 10_000_000 ranks ABOVE hot2.
    // Order: new(1), hot(2) | mod(3), hot2(4) → cycles 1,1,2,2
    assert(f(out("u/new"), 9) == 1L && f(out("u/new"), 10) == 1L)
    assert(f(out("u/hot"), 9) == 2L && f(out("u/hot"), 10) == 1L)
    assert(f(out("u/mod"), 9) == 3L && f(out("u/mod"), 10) == 2L)
    assert(f(out("u/hot2"), 9) == 4L && f(out("u/hot2"), 10) == 2L)
    // h2 has its own slots: its single candidate is rank 1, cycle 1
    assert(f(out("u/other"), 9) == 1L && f(out("u/other"), 10) == 1L)
    // scheduled == (cycle 1); non-candidates are false with null rank
    val sched = out.view.mapValues(_.getBoolean(11)).toMap
    assert(sched == Map("u/new" -> true, "u/hot" -> true,
      "u/mod" -> false, "u/hot2" -> false, "u/old" -> false,
      "u/cold" -> false, "u/other" -> true), s"scheduled: $sched")
    assert(f(out("u/old"), 9) == null && f(out("u/cold"), 10) == null)
  }

  test("per-host slot budgets: each host packs under its own " +
      "divisor; absent hosts use the default") {
    // h1 gets 1 slot per cycle (ranked candidates split 1 per
    // cycle); h2 is absent from the table -> default 3
    val slots = Seq(("h1", 1L)).toDF("host", "slots")
    val out = Recrawl.plan(frontier, history, nowDay = 100L,
        hostSlots = slots, defaultSlots = 3)
      .collect().map(r => r.getString(1) ->
        (if (r.isNullAt(10)) null else r.getLong(10))).toMap
    // h1 candidates rank new(1) hot(2) mod(3) hot2(4) -> cycles
    // 1,2,3,4 under slots=1
    assert(out("u/new") == 1L && out("u/hot") == 2L &&
      out("u/mod") == 3L && out("u/hot2") == 4L, s"cycles: $out")
    assert(out("u/other") == 1L, "default-slot host packs normally")
    assert(out("u/old") == null && out("u/cold") == null)
  }

  test("fetch-outcome loop: rates update, a second unchanged " +
      "observation drops below the fetch threshold, errors back off") {
    val fr2 = Seq[(String, String, Option[Long])](
      ("u/b", "h", None), ("u/c", "h", None),
      ("u/d", "h", None), ("u/e", "h", None)
    ).toDF("loc", "host", "lastmod_day")
    val h1 = Seq(
      ("u/b", 90L, false), // rate .5/2=.25, days 10 → pu 2.5M → fetch
      ("u/c", 90L, true),  // rate 1.5/2=.75 → pu 7.5M → fetch
      ("u/d", 85L, false)  // rate .25, days 15 → pu 3.75M → fetch
    ).toDF("loc", "crawl_day", "changed")
    val p1 = Recrawl.plan(fr2, h1, nowDay = 100L, slotsPerHost = 4)
    assert(p1.collect().forall(_.getBoolean(8)),
      "all four are cycle-1 candidates (u/e never crawled)")

    val outcomes = Seq(("u/b", "unchanged"), ("u/c", "changed"),
      ("u/d", "not_modified"), ("u/e", "error"))
      .toDF("loc", "status")
    val h2 = Recrawl.ingestOutcomes(h1, outcomes, fetchDay = 100L)
    val h2rows = h2.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    // content observations appended; 304 counts as unchanged; the
    // error appends NOTHING (it observed no content)
    assert(h2rows == Set(("u/b", 90L, false), ("u/c", 90L, true),
      ("u/d", 85L, false), ("u/b", 100L, false), ("u/c", 100L, true),
      ("u/d", 100L, false)), s"history after ingest: $h2rows")

    val led = Recrawl.errorLedger(outcomes, fetchDay = 100L)
    assert(led.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2))).toSeq == Seq(("u/e", 1L, 102L)))

    val p2 = Recrawl.planWithBackoff(fr2, h2, nowDay = 101L,
        slotsPerHost = 4, ledger = led)
      .collect().map(r => r.getString(1) -> r).toMap
    // u/b: unchanged twice → rate .5/3=.166667, days 1 → pu 166667
    // < 500000 → drops out of the plan
    assert(p2("u/b").getDouble(6) == 0.166667)
    assert(!p2("u/b").getBoolean(8), "unchanged-twice drops below")
    // u/c: changed again → rate 2.5/3=.833333 → pu 833333 → stays in
    assert(p2("u/c").getDouble(6) == 0.833333)
    assert(p2("u/c").getBoolean(8), "a hot URL keeps refetching")
    // u/d: the 304 counted as an unchanged observation
    assert(p2("u/d").getDouble(6) == 0.166667)
    assert(!p2("u/d").getBoolean(8))
    // u/e: never crawled (the errored fetch observed nothing) but
    // HELD by back-off until day 102
    assert(!p2("u/e").getBoolean(8) && p2("u/e").getBoolean(12),
      "an errored URL is backed off, not retried immediately")
    assert(!p2("u/b").getBoolean(12) && !p2("u/c").getBoolean(12))

    // ledger merge arithmetic: repeat error doubles the hold (cap 8),
    // a success clears the entry, a fresh error starts at 2 days
    val prev = led.unionByName(
      Seq(("u/y", 1L, 102L)).toDF("loc", "n_errors",
        "next_eligible_day"))
    val oc2 = Seq(("u/e", "error"), ("u/x", "error"),
      ("u/y", "unchanged")).toDF("loc", "status")
    val led2 = Recrawl.errorLedger(prev, oc2, fetchDay = 102L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(led2 == Map("u/e" -> ((2L, 106L)), "u/x" -> ((1L, 104L))),
      s"ledger after cycle 2: $led2")
  }

  test("crawl state persists: a restarted driver plans the next " +
      "cycle identically to an uninterrupted loop") {
    import graft.model.Artifacts
    val fr2 = Seq[(String, String, Option[Long])](
      ("u/b", "h", None), ("u/c", "h", None),
      ("u/d", "h", None), ("u/e", "h", None)
    ).toDF("loc", "host", "lastmod_day")
    val h1 = Seq(("u/b", 90L, false), ("u/c", 90L, true))
      .toDF("loc", "crawl_day", "changed")
    val outcomes = Seq(("u/b", "unchanged"), ("u/c", "changed"),
      ("u/e", "error")).toDF("loc", "status")
    // cycle 1 closes: history folds outcomes, ledger records the
    // error, quality priors come from downstream keep decisions
    val h2 = Recrawl.ingestOutcomes(h1, outcomes, fetchDay = 100L)
    val led = Recrawl.errorLedger(outcomes, fetchDay = 100L)
    val quality = Seq(("h", 0.25)).toDF("host", "keep_rate")
    // ... and the driver DIES here: state persists, the restarted
    // JVM loads it back
    val p = java.nio.file.Files
      .createTempDirectory("graft_crawl").toString + "/state"
    Artifacts.saveCrawlState(
      Artifacts.CrawlState(h2, led, quality), p)
    val loaded = Artifacts.loadCrawlState(spark, p)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    // cycle 2's plan from LOADED state == from the uninterrupted loop,
    // for both the back-off and the quality-prior paths
    val live1 = Recrawl.planWithBackoff(fr2, h2, nowDay = 101L,
      slotsPerHost = 4, ledger = led)
    val cold1 = Recrawl.planWithBackoff(fr2, loaded.history,
      nowDay = 101L, slotsPerHost = 4, ledger = loaded.errorLedger)
    assert(rows(cold1) == rows(live1) && rows(live1).nonEmpty)
    val live2 = Recrawl.planWithQuality(fr2, h2, nowDay = 101L,
      slotsPerHost = 4, hostQuality = quality)
    val cold2 = Recrawl.planWithQuality(fr2, loaded.history,
      nowDay = 101L, slotsPerHost = 4,
      hostQuality = loaded.hostQuality)
    assert(rows(cold2) == rows(live2) && rows(live2).nonEmpty)
    // the loaded ledger still holds u/e out of the plan
    val cold1m = cold1.collect()
      .map(r => r.getString(1) -> r.getBoolean(12)).toMap
    assert(cold1m("u/e"), "back-off survives the restart")
  }

  test("zero/negative slot budgets clamp to 1 — a very polite host " +
      "still fetches, one URL per cycle, no NaN cycles") {
    // Crawl-delay 60s under a 20s cycle → floor(20/60) = 0 slots;
    // without the clamp, cycle arithmetic divides by zero
    val slots = Seq(("h1", 0L), ("h2", -2L)).toDF("host", "slots")
    val out = Recrawl.plan(frontier, history, nowDay = 100L,
        hostSlots = slots, defaultSlots = 3)
      .collect().map(r => r.getString(1) ->
        (if (r.isNullAt(10)) null else r.getLong(10))).toMap
    assert(out("u/new") == 1L && out("u/hot") == 2L &&
      out("u/mod") == 3L && out("u/hot2") == 4L,
      s"slots=0 must behave as slots=1: $out")
    assert(out("u/other") == 1L)
    assert(out("u/old") == null && out("u/cold") == null)
  }
}
