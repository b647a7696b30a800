package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge LEARNING (Sennrich et al., "Neural Machine Translation of
  * Rare Words with Subword Units", ACL'16) — tokenizer TRAINING as a
  * distributed pipeline, complementing the pinned-table APPLY path
  * ([[TextAnalysis.bpePieceCount]], q112).
  *
  * The classic formulation: ONE corpus-sized pass builds the
  * word-frequency table; every learning iteration after that runs on
  * the vocabulary only (distinct words), so per-iteration cost is
  * vocab-sized and corpus-independent — the same offline-fit
  * discipline as `Similarity.kmeansRefine`. Each round counts
  * adjacent symbol pairs weighted by word frequency, picks the argmax
  * under a pinned total order (count DESC, pair ASC — ties can't
  * diverge across engines), collects that ONE row to the driver (the
  * merge list IS the model), and rewrites the vocab's symbol
  * sequences.
  *
  * Self-pairs (a == b) are excluded from learning: their greedy merge
  * is run-parity-dependent (left-to-right in "e e e" merges only the
  * first two), which has no clean relational form. With a ≠ b,
  * adjacent matches can never overlap, so "merge all matches
  * simultaneously" IS the greedy left-to-right result — exactly
  * expressible in both engines, and the DuckDB oracle replays the
  * whole training loop as a generated CTE chain to prove it.
  */
object BpeLearn {

  final case class Merge(merge_rank: Int, sym_a: String, sym_b: String,
                         merged: String, pair_count: Long)

  /** Apply a whole batch of pairwise symbol-DISJOINT merges in ONE
    * transform pass. Disjointness (no symbol consumed or produced by
    * one batch member appears in another) makes the simultaneous
    * rewrite exact: a position can match at most one pair, and
    * (a, b) / (c, d) occurrences can never overlap (an overlap would
    * force b = c). One shallow expression regardless of batch size —
    * folding per-merge [[applyMerge]] calls instead nests HOF lambdas
    * batch-deep and blows the analyzer's resolution iteration cap.
    */
  private def applyMergeBatch(syms: Column,
                              batch: Seq[(String, String)]): Column = {
    val n = size(syms)
    filter(
      transform(sequence(lit(1), n), i => {
        val cur = element_at(syms, i)
        val nxt = element_at(syms, (i + lit(1)).cast("int"))
        val prv = element_at(syms, (i - lit(1)).cast("int"))
        val mergedHead = batch.map { case (a, b) =>
          when(cur === lit(a) && i < n && nxt === lit(b), lit(a + b))
        }
        val dropped = batch.map { case (a, b) =>
          i > lit(1) && prv === lit(a) && cur === lit(b)
        }.reduce(_ || _)
        when(dropped, lit(null).cast("string"))
          .otherwise(coalesce(mergedHead :+ cur: _*))
      }),
      x => x.isNotNull)
  }

  /** Apply one (a, b) merge to a symbol-array column — simultaneous
    * non-overlapping rewrite (exact greedy semantics for a ≠ b).
    */
  private def applyMerge(syms: Column, a: String, b: String): Column = {
    val n = size(syms)
    filter(
      transform(sequence(lit(1), n), i =>
        when(element_at(syms, i) === lit(a) && i < n &&
          element_at(syms, (i + lit(1)).cast("int")) === lit(b),
          concat(lit(a), lit(b)))
          .when(i > lit(1) &&
            element_at(syms, (i - lit(1)).cast("int")) === lit(a) &&
            element_at(syms, i) === lit(b),
            lit(null).cast("string"))
          .otherwise(element_at(syms, i))),
      x => x.isNotNull)
  }

  /** The per-round pair-count aggregate: adjacent symbol pairs
    * weighted by word frequency, self-pairs excluded, sorted under
    * the pinned total order (count DESC, pair ASC).
    */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("freq"),
        explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("a"),
              element_at(col("syms"),
                (i + lit(1)).cast("int")).as("b"))))
          .otherwise(array().cast(
            "array<struct<a:string,b:string>>"))).as("p"))
      .filter(col("p.a") =!= col("p.b"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc)

  private def buildVocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))))

  /** Learn `nMerges` merges over whitespace tokens of `textCol` —
    * EXACT greedy (one merge per round; the mode the q128 oracle
    * replays). Returns the ranked merge table (the trained tokenizer
    * model).
    *
    * Per-round lineage is truncated with an eager `localCheckpoint`
    * (r6 ADVICE item 3): without it, round r's collect re-executes
    * all r−1 prior rewrites (O(r²) total work) and the analyzed plan
    * nests transform/filter/case chains r deep — fine at 8 merges,
    * divergent at a real merge count. The checkpoint each round is
    * vocab-sized (distinct words), never corpus-sized.
    */
  def learnMerges(docs: DataFrame, textCol: String = "text",
                  nMerges: Int = 8): Seq[Merge] = {
    require(nMerges > 0, s"nMerges=$nMerges must be > 0")
    val vocab0 = buildVocab(docs, textCol).persist()
    var vocab = vocab0
    try {
      val out = Seq.newBuilder[Merge]
      var r = 1
      var exhausted = false
      while (r <= nMerges && !exhausted) {
        val top = pairCounts(vocab).limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val row = top.head
          val (a, b) = (row.getString(0), row.getString(1))
          out += Merge(r, a, b, a + b, row.getLong(2))
          val next = graft.model.Checkpoints.materializeFresh(vocab
            .withColumn("syms", applyMerge(col("syms"), a, b)))
          // release the superseded round's checkpoint blocks (a plain
          // Dataset.unpersist goes through the CacheManager and never
          // touches checkpoint-backed RDD storage — r7 ADVICE item 2)
          if (vocab ne vocab0) graft.model.Checkpoints.release(vocab)
          vocab = next
          r += 1
        }
      }
      out.result()
    } finally {
      vocab0.unpersist(false)
      if (vocab ne vocab0) graft.model.Checkpoints.release(vocab)
    }
  }

  /** BATCHED merge learning (r6 verdict item 3): accept up to
    * `batchSize` merges per round instead of one, so learning a
    * 32k-merge vocabulary costs ~dozens of Spark rounds rather than
    * 32k driver round-trips. Returns (merges, roundsRun).
    *
    * Soundness: within a round, accepted pairs are taken in the
    * pinned order (count DESC, pair ASC) and must be pairwise
    * NON-INTERACTING — a candidate (c, d) is rejected for this round
    * if c, d, or the produced symbol c+d collides with any symbol an
    * earlier-accepted merge consumes OR produces. Disjointness makes
    * each accepted pair's count invariant under the earlier merges of
    * the same round (merging (a, b) only touches pairs overlapping an
    * (a, b) occurrence), so every accepted merge has exactly the
    * count sequential greedy would have seen. The approximation is in
    * ORDER only: sequential greedy might interleave a NEW pair
    * (x, ab) created mid-round if it out-counts a later batch member.
    * On corpora where no created pair beats the batch tail — the
    * common case at real merge counts, where counts fall slowly —
    * batched == sequential exactly (BpeLearnBatchedSpec pins this on
    * a constructed corpus); the exact mode remains the oracle path.
    *
    * Each round is ONE pair-count aggregate + one batch-sized collect
    * + one vocab rewrite (all accepted merges folded into a single
    * projection) + an eager vocab-sized localCheckpoint (lineage
    * truncation — ADVICE item 3).
    */
  def learnMergesBatched(docs: DataFrame, textCol: String = "text",
                         nMerges: Int = 8, batchSize: Int = 4)
      : (Seq[Merge], Int) = {
    require(nMerges > 0, s"nMerges=$nMerges must be > 0")
    require(batchSize > 0, s"batchSize=$batchSize must be > 0")
    val vocab0 = buildVocab(docs, textCol).persist()
    var vocab = vocab0
    try {
      val out = Seq.newBuilder[Merge]
      var rank = 1
      var rounds = 0
      var exhausted = false
      while (rank <= nMerges && !exhausted) {
        // over-collect (candidates may be rejected for interaction);
        // the batch is still chosen strictly in the pinned order
        val want = math.min(batchSize, nMerges - rank + 1)
        val top = pairCounts(vocab).limit(want * 4).collect()
        rounds += 1
        if (top.isEmpty) exhausted = true
        else {
          val claimed = scala.collection.mutable.Set.empty[String]
          val accepted = Seq.newBuilder[(String, String, Long)]
          var n = 0
          top.iterator.takeWhile(_ => n < want).foreach { row =>
            val (a, b) = (row.getString(0), row.getString(1))
            if (!claimed(a) && !claimed(b) && !claimed(a + b)) {
              accepted += ((a, b, row.getLong(2)))
              claimed ++= Seq(a, b, a + b)
              n += 1
            }
          }
          val batch = accepted.result()
          batch.foreach { case (a, b, cnt) =>
            out += Merge(rank, a, b, a + b, cnt)
            rank += 1
          }
          val next = graft.model.Checkpoints.materializeFresh(vocab
            .withColumn("syms", applyMergeBatch(col("syms"),
              batch.map { case (a, b, _) => (a, b) })))
          if (vocab ne vocab0) graft.model.Checkpoints.release(vocab)
          vocab = next
        }
      }
      (out.result(), rounds)
    } finally {
      vocab0.unpersist(false)
      if (vocab ne vocab0) graft.model.Checkpoints.release(vocab)
    }
  }
}
