package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableRound.pround

/** Recrawl planning / fetch scheduling — the stage between the
  * sitemap frontier (q155) and the fetch that every production
  * crawler runs continuously: given the frontier (what COULD be
  * fetched, with any `lastmod` hints the sitemap carried) and the
  * crawl history (when each URL was last fetched and whether it had
  * changed), decide WHAT to fetch this cycle and in what order.
  * (The reference pipeline fetches a fixed API host — reference
  * `src/ingestion.py:32-54` — and has no crawl layer; this is
  * brief-driven crawl-scale work, r9 verdict item 2.)
  *
  * Three classic components in one plan:
  *
  *  1. **Per-URL change-rate estimation** from crawl-history deltas:
  *     the smoothed frequency-of-change estimator
  *     `(n_changes + 0.5) / (n_crawls + 1)` (the add-half Laplace
  *     form of Cho & Garcia-Molina's change-frequency work — the
  *     prior keeps a single unchanged observation from freezing a
  *     URL forever).
  *  2. **Conditional-fetch decision** (the If-Modified-Since
  *     discipline applied at planning time): a URL with a sitemap
  *     `lastmod` newer than its last crawl needs a fetch — and one
  *     with an OLDER `lastmod` provably does not, whatever its
  *     estimated rate. URLs without a `lastmod` hint fall back to
  *     the estimator: fetch when the expected number of changes
  *     since the last crawl, `rate × days_since`, reaches 1/2.
  *     Never-crawled URLs (no history) always fetch — discovery
  *     outranks refresh.
  *  3. **Per-host politeness packing** (the q103 batch-packing
  *     idiom keyed on host): each host grants `slotsPerHost` fetch
  *     slots per cycle; candidates rank within their host by
  *     (priority desc, loc asc) — new URLs first (null priority
  *     ranks ahead), then by expected staleness — and the rank packs
  *     into cycles of `slotsPerHost`. `scheduled` marks cycle 1,
  *     this round's fetch list.
  *
  * Scale shape: the history aggregate is ONE exchange keyed by URL
  * (counts and a max — partial-aggregated map-side); the frontier
  * join is URL-keyed; the packing window partitions by HOST, so its
  * state is per-host-frontier-sized, never corpus-sized (a real
  * planner's per-cycle frontier per host is bounded by construction
  * — politeness caps how much one host can ever absorb; a pipeline
  * that only needs cycle-1 output would swap the window for the
  * bounded-heap `graft_topk` aggregate and skip the sort entirely).
  * Priority is computed in integer micro-units (floor(x·1e6 + 0.5))
  * from integer counts and day arithmetic, so rank order is
  * engine-exact.
  */
object Recrawl {

  /** Build the fetch plan.
    *
    * @param frontier (loc, host, lastmod_day: nullable long) — the
    *                 crawl frontier, e.g. q155's sitemap diff with
    *                 lastmod reduced to a day number
    * @param history  (loc, crawl_day: long, changed: boolean) — one
    *                 row per past fetch of a URL
    * @param nowDay   the planning day (same day scale as the inputs)
    * @param slotsPerHost fetch slots each host grants per cycle
    * @return one row per frontier URL:
    *         (host, loc, n_crawls, n_changes, last_crawl_day,
    *          lastmod_day, change_rate, priority_units, need_fetch,
    *          host_rank, cycle, scheduled) — host_rank/cycle are null
    *          and scheduled is false for URLs that don't need a fetch
    */
  def plan(frontier: DataFrame, history: DataFrame, nowDay: Long,
           slotsPerHost: Int): DataFrame =
    planWithSlots(
      frontier.withColumn("__slots", lit(slotsPerHost.toLong)),
      history, nowDay)

  /** Per-host politeness budgets (r10): each host's slot count comes
    * from a (host, slots) table — e.g. derived from its robots.txt
    * `Crawl-delay` via [[RobotsIngest.robotsMeta]] (slots per cycle =
    * cycle seconds / delay). Hosts absent from the table fall back to
    * `defaultSlots`. The slot table is host-bounded, so it
    * broadcasts at any corpus size.
    */
  def plan(frontier: DataFrame, history: DataFrame, nowDay: Long,
           hostSlots: DataFrame, defaultSlots: Int): DataFrame =
    planWithSlots(
      frontier.join(broadcast(hostSlots.select(col("host"),
          col("slots").cast("long").as("__slots"))),
          Seq("host"), "left")
        .withColumn("__slots",
          coalesce(col("__slots"), lit(defaultSlots.toLong))),
      history, nowDay)

  /** Close the crawl loop (r10 verdict item 2): fold one cycle's
    * per-URL fetch outcomes back into the crawl history the add-half
    * estimator reads, so the next cycle's plan reflects what the
    * fetches actually found.
    *
    * `outcomes` is (loc, status) with the four production results:
    *  - `changed`      — 200, content differs → (loc, day, true)
    *  - `unchanged`    — 200, content identical → (loc, day, false)
    *  - `not_modified` — 304 conditional hit: the server attested
    *    no change, the same observation as `unchanged` without the
    *    body transfer → (loc, day, false)
    *  - `error` — the fetch yielded NO content observation: no
    *    history row (an error says nothing about change rate); the
    *    back-off lives in [[errorLedger]] instead.
    *
    * Scale shape: a filter + projection unioned under the history
    * scan — outcomes are fetch-cycle-sized, never corpus-sized.
    */
  def ingestOutcomes(history: DataFrame, outcomes: DataFrame,
                     fetchDay: Long): DataFrame =
    history.unionByName(
      outcomes.filter(col("status")
          .isin("changed", "unchanged", "not_modified"))
        .select(col("loc"), lit(fetchDay).as("crawl_day"),
          (col("status") === "changed").as("changed")))

  /** Exponential back-off ledger for fetch errors: one row per URL
    * with an UNRESOLVED error — (loc, n_errors,
    * next_eligible_day = fetchDay + min(2^n_errors, 8) days). Any
    * non-error outcome clears the URL's entry (the next failure
    * starts over at 2 days); repeated errors double the hold up to
    * the 8-day cap. The ledger is error-population-sized and joins
    * broadcast-small against the frontier.
    */
  def errorLedger(prev: DataFrame, outcomes: DataFrame,
                  fetchDay: Long): DataFrame = {
    val err = outcomes.filter(col("status") === "error")
      .select(col("loc"), lit(true).as("__e"))
    val ok = outcomes.filter(col("status") =!= "error")
      .select(col("loc"), lit(true).as("__ok"))
    prev.join(err, Seq("loc"), "full")
      .join(ok, Seq("loc"), "left")
      .filter(col("__ok").isNull) // success resolves the entry
      .withColumn("n_errors",
        coalesce(col("n_errors"), lit(0L)) +
          when(col("__e").isNotNull, lit(1L)).otherwise(lit(0L)))
      .withColumn("next_eligible_day",
        when(col("__e").isNotNull, lit(fetchDay) +
          least(pow(lit(2.0), col("n_errors")), lit(8.0))
            .cast("long"))
          .otherwise(col("next_eligible_day")))
      .select(col("loc"), col("n_errors"), col("next_eligible_day"))
  }

  /** First-cycle ledger (no previous entries). */
  def errorLedger(outcomes: DataFrame, fetchDay: Long): DataFrame =
    outcomes.filter(col("status") === "error")
      .select(col("loc"), lit(1L).as("n_errors"),
        lit(fetchDay + 2L).as("next_eligible_day"))

  /** [[plan]] with the error back-off applied: a frontier URL whose
    * ledger entry says `next_eligible_day > nowDay` is held out of
    * this cycle (need_fetch false, rank/cycle null, and a
    * `backed_off` audit column appended) regardless of staleness —
    * including never-crawled URLs whose only fetch attempt errored.
    */
  def planWithBackoff(frontier: DataFrame, history: DataFrame,
                      nowDay: Long, slotsPerHost: Int,
                      ledger: DataFrame): DataFrame =
    planWithSlots(
      frontier.withColumn("__slots", lit(slotsPerHost.toLong))
        .join(broadcast(ledger.select(col("loc"),
          (col("next_eligible_day") > nowDay).as("__hold"))),
          Seq("loc"), "left"),
      history, nowDay)

  /** Per-host quality priors (r10 verdict item 6): crawl budget
    * should prefer hosts that historically yield KEEPABLE content,
    * so the staleness priority becomes the expected number of
    * keepable changed pages — rate × days_since × host keep-rate —
    * and the estimator-fallback fetch decision inherits the same
    * product (fetch when expected keepable changes ≥ 1/2): a host
    * whose content is 90% discarded needs 10× the staleness to earn
    * a slot. The lastmod-hint and never-crawled branches are
    * deliberately unaffected — provable freshness and discovery
    * outrank priors. `hostQuality` (host, keep_rate ∈ [0,1]) is
    * host-bounded → broadcast; absent hosts use `defaultQuality`.
    * The applied prior is echoed in a `keep_rate` output column.
    */
  def planWithQuality(frontier: DataFrame, history: DataFrame,
                      nowDay: Long, slotsPerHost: Int,
                      hostQuality: DataFrame,
                      defaultQuality: Double = 1.0): DataFrame =
    planWithSlots(
      frontier.withColumn("__slots", lit(slotsPerHost.toLong))
        .join(broadcast(hostQuality.select(col("host"),
          col("keep_rate").cast("double").as("__quality"))),
          Seq("host"), "left")
        .withColumn("__quality",
          coalesce(col("__quality"), lit(defaultQuality))),
      history, nowDay)

  private def planWithSlots(frontierRaw: DataFrame, history: DataFrame,
                            nowDay: Long): DataFrame = {
    // Slot budgets derived from Crawl-delay (floor(cycle/delay)) hit 0
    // for any delay longer than the cycle; 0 slots would make the
    // cycle arithmetic divide by zero (NaN→garbage cycles). A polite
    // host still gets fetched — just one URL per cycle — so clamp the
    // budget to >= 1 slot rather than silently dropping the host.
    val frontier = frontierRaw.withColumn("__slots",
      greatest(lit(1L), col("__slots")))
    // back-off hold (planWithBackoff attaches __hold): a held URL is
    // not a candidate this cycle whatever its staleness says
    val hasHold = frontierRaw.columns.contains("__hold")
    val hold =
      if (hasHold) coalesce(col("__hold"), lit(false)) else lit(false)
    // 1. change-rate estimate: one URL-keyed aggregate over history
    val hist = history.groupBy(col("loc"))
      .agg(count(lit(1)).as("n_crawls"),
        sum(when(col("changed"), lit(1L)).otherwise(lit(0L)))
          .as("n_changes"),
        max(col("crawl_day")).as("last_crawl_day"))
    val rate = (col("n_changes") + lit(0.5)) /
      (col("n_crawls") + lit(1.0))
    val days = lit(nowDay) - col("last_crawl_day")
    // quality prior (planWithQuality attaches __quality): the
    // priority becomes expected KEEPABLE changes
    val hasQuality = frontierRaw.columns.contains("__quality")
    val pu =
      if (hasQuality)
        floor(rate * days * col("__quality") * 1e6 + 0.5).cast("long")
      else floor(rate * days * 1e6 + 0.5).cast("long")
    val joined = frontier.join(hist, Seq("loc"), "left")
      .withColumn("priority_units",
        when(col("n_crawls").isNull, lit(null).cast("long"))
          .otherwise(pu))
      .withColumn("need_fetch",
        when(hold, lit(false))                  // error back-off
          .when(col("n_crawls").isNull, lit(true)) // never crawled
          .when(col("lastmod_day").isNotNull,   // conditional fetch
            col("lastmod_day") > col("last_crawl_day"))
          .otherwise(col("priority_units") >= lit(500000L)))
    // 2. politeness packing: ONE host-bounded window, no self-join —
    // non-candidates sort after every candidate (need_fetch desc
    // leads the ordering), so candidate ranks are exactly 1..k and
    // the non-candidates' row numbers are simply nulled out
    val w = Window.partitionBy(col("host"))
      .orderBy(col("need_fetch").desc,
        col("priority_units").desc_nulls_first,
        col("loc").asc)
    val outCols = Seq(col("host"), col("loc"),
      coalesce(col("n_crawls"), lit(0L)).as("n_crawls"),
      coalesce(col("n_changes"), lit(0L)).as("n_changes"),
      col("last_crawl_day"), col("lastmod_day"),
      when(col("n_crawls").isNotNull, pround(rate, 6))
        .as("change_rate"),
      col("priority_units"), col("need_fetch"),
      col("host_rank"), col("cycle"),
      when(col("need_fetch"), col("cycle") === 1L).otherwise(lit(false))
        .as("scheduled")) ++
      (if (hasHold) Seq(hold.as("backed_off")) else Nil) ++
      (if (hasQuality) Seq(col("__quality").as("keep_rate")) else Nil)
    joined
      .withColumn("host_rank",
        when(col("need_fetch"), row_number().over(w).cast("long")))
      .withColumn("cycle",
        floor((col("host_rank") - 1L).cast("double") /
          col("__slots").cast("double")).cast("long") + 1L)
      .select(outCols: _*)
  }
}
