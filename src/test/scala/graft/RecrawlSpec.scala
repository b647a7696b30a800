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
}
