package graft

import org.apache.spark.sql.functions._

/** q135/q136/q137 — the LM-data curation trio (decontamination,
  * perplexity filtering, DSIR importance weights). The driver's
  * DuckDB oracle proves engine parity; these specs prove the
  * SEMANTICS independently (a hand-rolled Scala differential for the
  * gram logic) and pin the scale-critical plan shapes (broadcast
  * semi-probe, ReusedExchange barriers, no corpus-sized
  * single-partition window).
  */
class LmPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, dir)

  private def toks(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  test("q135 agrees with a driver-side gram-set differential") {
    // independent reimplementation: plain Scala sets, no Spark, no
    // md5 — if the query's explode/semi-join/rollup disagrees with
    // naive set logic on ANY doc, something in the pipeline lies
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toMap
    def grams(tk: Array[String]): Seq[String] =
      if (tk.length < 8) Seq.empty
      else (0 to tk.length - 8).map(i => tk.slice(i, i + 8).mkString(" "))
    val bench = docs.filter(_._1 % 7 == 0).values.flatMap(grams).toSet
    val expected = docs.filter(_._1 % 7 != 0).map { case (id, tk) =>
      val g = grams(tk)
      val hit = g.filter(bench.contains)
      id -> (g.size.toLong, hit.distinct.size.toLong, hit.size.toLong)
    }
    val got = run("q135_decontaminate").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (ng, nhg, nho)) =>
      val (g1, g2, g3, flag) = got(id)
      assert((g1, g2, g3) == (ng, nhg, nho), s"doc $id mismatch")
      assert(flag == (nhg > 0), s"doc $id flag mismatch")
    }
    // the fixture corpus must actually exercise the hit path
    assert(expected.values.exists(_._2 > 0),
      "no contaminated docs at sf0.001 — differential is vacuous")
  }

  test("q135 probes the benchmark set with a broadcast semi-join") {
    val p = run("q135_decontaminate")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      p.take(2000))
  }

  test("q136 tercile cut: exact rank, ordered buckets, integer sizes") {
    val rows = run("q136_ngram_perplexity")
      .filter(col("ppl").isNotNull).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3),
        r.getString(4)))
    val n = rows.length
    // ppl_rank is exactly the naive (ppl, doc_id) sort order —
    // i.e. the bucketed two-level construction is EXACT, not approx
    val naive = rows.sortBy(t => (t._2, t._1)).map(_._1)
    val byRank = rows.sortBy(_._3).map(_._1)
    assert(rows.map(_._3).sorted.toSeq == (1L to n).toSeq)
    assert(naive.toSeq == byRank.toSeq)
    // bucket = pure integer arithmetic on the rank
    rows.foreach { case (id, _, r, b) =>
      val want = if (r * 3 <= n) "head"
        else if (r * 3 <= 2L * n) "middle" else "tail"
      assert(b == want, s"doc $id bucket")
    }
    // ordering consistency: max(head ppl) <= min(middle ppl) etc.
    def pplOf(b: String) = rows.filter(_._4 == b).map(_._2)
    assert(pplOf("head").max <= pplOf("middle").min)
    assert(pplOf("middle").max <= pplOf("tail").min)
  }

  test("q136/q137 rank over the SERVED score frame — no in-plan " +
      "scoring recompute") {
    // pre-r10 this asserted a ReusedExchange barrier (the scoring
    // branch appeared twice in the rank and had to execute once);
    // the served score frame (NgramLm.cachedScoreFrame, r9 verdict
    // item 1) enforces the same property strictly harder: the whole
    // scoring branch — explode, model joins, per-doc aggregate — is
    // now a single materialized Scan ExistingRDD, so the plan must
    // contain NO Generate (explode) at all
    for (q <- Seq("q136_ngram_perplexity", "q137_dsir_weights")) {
      val p = run(q).queryExecution.executedPlan.toString
      assert(p.contains("Scan ExistingRDD"),
        s"$q must rank over the served frame: ${p.take(600)}")
      assert(!p.contains("Generate"),
        s"$q must not re-explode the corpus: ${p.take(2000)}")
    }
  }

  test("q137 selects exactly the top quartile by per-feature weight") {
    val rows = run("q137_dsir_weights")
      .filter(col("sel_rank").isNotNull).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getLong(4),
        r.getBoolean(5)))
    val n = rows.length
    assert(rows.map(_._3).sorted.toSeq == (1L to n).toSeq)
    // rank follows (avg_lw DESC, doc_id ASC)
    val naive = rows.sortBy(t => (-t._2, t._1)).map(_._1)
    assert(naive.toSeq == rows.sortBy(_._3).map(_._1).toSeq)
    rows.foreach { case (id, _, r, sel) =>
      assert(sel == (r * 4 <= n), s"doc $id selection")
    }
    assert(rows.count(_._4) == n / 4)
    // every selected doc outranks every unselected one by weight
    if (rows.exists(_._4) && rows.exists(!_._4))
      assert(rows.filter(_._4).map(_._2).min >=
        rows.filter(!_._4).map(_._2).max - 1e-12)
  }
}
