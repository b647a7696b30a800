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

  /** Learn `nMerges` merges over whitespace tokens of `textCol`.
    * Returns the ranked merge table (the trained tokenizer model).
    */
  def learnMerges(docs: DataFrame, textCol: String = "text",
                  nMerges: Int = 8): Seq[Merge] = {
    require(nMerges > 0, s"nMerges=$nMerges must be > 0")
    val vocab0 = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))))
      .persist()
    try {
      var vocab = vocab0
      val out = Seq.newBuilder[Merge]
      var r = 1
      var exhausted = false
      while (r <= nMerges && !exhausted) {
        val top = vocab
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
          .limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val row = top.head
          val (a, b) = (row.getString(0), row.getString(1))
          out += Merge(r, a, b, a + b, row.getLong(2))
          vocab = vocab.withColumn("syms",
            applyMerge(col("syms"), a, b))
          r += 1
        }
      }
      out.result()
    } finally vocab0.unpersist(false)
  }
}
