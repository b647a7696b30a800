package graft.model

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persistence for trained engine artifacts — the "tiny persisted
  * table" leg of the fit-once discipline: IVF/PQ centroids
  * ([[graft.sim.Similarity.trainedCentroids]]), unigram-LM piece
  * inventories ([[graft.text.UnigramLm.cachedInventory]]), blocklist
  * pattern tables ([[graft.text.MultiPattern.cachedPatterns]]), BPE
  * merge lists ([[graft.text.BpeLearn]]), PQ codebooks
  * ([[graft.sim.Pq]]), the q134 suffix-array span table, and linear-
  * model weight vectors (q140) — every trained state the catalog
  * produces.
  *
  * In production, training runs offline and the online path loads the
  * artifact — the session-scoped caches cover re-execution within a
  * job; these parquet round-trips cover handoff ACROSS jobs/clusters.
  * All artifacts are model-sized (centroids: nlist×dims doubles;
  * vocab: |pieces| rows; patterns: |list| rows), so a single-file
  * parquet write/read is the whole story — no partitioning concerns.
  *
  * Round-trips are EXACT: doubles and longs pass through parquet
  * bit-for-bit, and explicit ordinal columns pin element and row
  * order (never rely on file order).
  */
object Artifacts {

  /** (cell_id, embedding) rows; element order pinned by the array
    * column itself.
    */
  def saveCentroids(spark: SparkSession, path: String,
                    centroids: Seq[Array[Double]]): Unit = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cell_id", "embedding")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadCentroids(spark: SparkSession,
                    path: String): Seq[Array[Double]] =
    spark.read.parquet(path)
      .orderBy(col("cell_id").asc)
      .collect()
      .map(_.getSeq[Double](1).toArray).toSeq

  /** (piece, units) vocab rows — [[graft.text.UnigramLm]]'s
    * inventory shape (also fits any (string, long) scored table).
    * Row order pins by piece, matching fitInventory's sortBy.
    */
  def saveVocab(spark: SparkSession, path: String,
                vocab: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    vocab.toDF("piece", "units")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadVocab(spark: SparkSession,
                path: String): Seq[(String, Long)] =
    spark.read.parquet(path)
      .orderBy(col("piece").asc)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Ordered pattern list — [[graft.text.MultiPattern]]'s blocklist
    * (pattern ids are positional, so order is part of the artifact).
    */
  def savePatterns(spark: SparkSession, path: String,
                   patterns: Seq[String]): Unit = {
    import spark.implicits._
    patterns.zipWithIndex.map { case (p, i) => (i, p) }
      .toDF("pattern_id", "pattern")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadPatterns(spark: SparkSession, path: String): Seq[String] =
    spark.read.parquet(path)
      .orderBy(col("pattern_id").asc)
      .collect()
      .map(_.getString(1)).toSeq

  /** BPE merge list — [[graft.text.BpeLearn]]'s trained model (r7
    * verdict item 6). Rank order IS the model (greedy apply resolves
    * ties by rank), and ranks are explicit columns, so file order
    * never matters.
    */
  def saveMerges(spark: SparkSession, path: String,
                 merges: Seq[graft.text.BpeLearn.Merge]): Unit = {
    import spark.implicits._
    merges.toDF()
      .select(col("merge_rank"), col("sym_a"), col("sym_b"),
        col("merged"), col("pair_count"))
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadMerges(spark: SparkSession,
                 path: String): Seq[graft.text.BpeLearn.Merge] =
    spark.read.parquet(path)
      .orderBy(col("merge_rank").asc)
      .collect()
      .map(r => graft.text.BpeLearn.Merge(
        r.getAs[Int]("merge_rank"), r.getAs[String]("sym_a"),
        r.getAs[String]("sym_b"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count"))).toSeq

  /** PQ codebooks (m subspaces × k codes × dsub dims) —
    * [[graft.sim.Pq]]'s trained quantizer. (sub, code) ordinals pin
    * row order; the embedding array pins element order.
    */
  def saveCodebooks(spark: SparkSession, path: String,
                    codebooks: Seq[Seq[Seq[Double]]]): Unit = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cb, sub) =>
      cb.zipWithIndex.map { case (c, code) => (sub, code, c) }
    }.toDF("sub", "code", "embedding")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadCodebooks(spark: SparkSession,
                    path: String): Seq[Seq[Seq[Double]]] =
    spark.read.parquet(path)
      .orderBy(col("sub").asc, col("code").asc)
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.map(_._2).toSeq }

  /** The q134 suffix-array span table — an OFFLINE INDEX (per-doc
    * maximal-repeat aggregates, only docs with spans ≥ minLen), so
    * it persists like any other trained state: build once per
    * corpus, load per session. The loaded frame is a plain scan —
    * consuming it can never trigger an SA rebuild.
    */
  def saveSpanTable(spans: org.apache.spark.sql.DataFrame,
                    path: String): Unit =
    spans.write.mode("overwrite").parquet(path)

  def loadSpanTable(spark: SparkSession,
                    path: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(path)

  /** The q136/q151 bigram LM — [[NgramLm.BigramLm]]. Only the pair
    * counts persist: ctx/cont/nall/v are exact integer projections of
    * c12, so [[loadNgram]] re-derives them with vocab-bounded
    * aggregates (never a corpus scan) and materializes the result —
    * the loaded model is bit-identical to the fitted one. Unlike the
    * other artifacts this one is NOT driver-sized at scale (billions
    * of distinct bigrams at 100 TB), so it writes distributed —
    * no repartition(1), no collect.
    */
  def saveNgram(model: NgramLm.BigramLm, path: String): Unit =
    model.c12.write.mode("overwrite").parquet(path)

  def loadNgram(spark: SparkSession, path: String): NgramLm.BigramLm = {
    val c12 = Checkpoints.materialize(spark.read.parquet(path))
    // SAME derivation as the fitter (NgramLm.deriveTables) — a loaded
    // artifact can never drift from a fitted model
    val (ctx, cont, nall, v) = NgramLm.deriveTables(c12)
    NgramLm.BigramLm(c12, ctx, cont, nall, v)
  }

  /** Trigram model persistence (r9 verdict item 5's artifact side):
    * both orders' BASE count tables only — c123 under `/c123`, the
    * shared bigram c12 under `/c12` — with every derived table
    * rebuilt on load via the fitter's own derivations, the same
    * no-drift rule as [[loadNgram]].
    */
  def saveTrigram(model: NgramLm.TrigramLm, path: String): Unit = {
    model.c123.write.mode("overwrite").parquet(s"$path/c123")
    saveNgram(model.bigram, s"$path/c12")
  }

  def loadTrigram(spark: SparkSession,
                  path: String): NgramLm.TrigramLm = {
    val c123 = Checkpoints.materialize(
      spark.read.parquet(s"$path/c123"))
    val (ctx12, n3) = NgramLm.deriveTrigramTables(c123)
    NgramLm.TrigramLm(c123, ctx12, n3, loadNgram(spark, s"$path/c12"))
  }

  /** The served MinHash signature table (id, sig, sig_fp) —
    * [[graft.dedup.Dedup]]'s fit-once state (r10 verdict item 3's
    * missing artifact). Corpus-sized (one row per doc), so it writes
    * DISTRIBUTED — no repartition(1), no collect; [[loadSigs]]
    * restores the sig_fp partitioning the banded consumers expect
    * and materializes, so serving from a loaded table schedules zero
    * signature-hash jobs. Wire a loaded table into the serving path
    * with [[graft.dedup.Dedup.installSigs]].
    */
  def saveSigs(sigs: org.apache.spark.sql.DataFrame,
               path: String): Unit =
    sigs.write.mode("overwrite").parquet(path)

  def loadSigs(spark: SparkSession,
               path: String): org.apache.spark.sql.DataFrame =
    Checkpoints.materialize(
      spark.read.parquet(path).repartition(col("sig_fp")))

  /** The VERSIONED IVF index (r13 — r12 verdict Next #4): (centroids,
    * cell assignments) persisted as ONE unit, so the maintenance loop
    * — audit ([[graft.sim.Similarity.ivfCellStats]] →
    * `dirtyCellsFromStats`) → dirty-cell refresh
    * (`ivfRefreshDirtyCells`) → persist → reload → re-audit —
    * survives the JVM the way crawl state does. Assignments write
    * PARTITIONED BY CELL: that is the physical property the
    * refresh's partition pruning rides (IvfRefreshSpec's listener
    * case reads ZERO clean-cell rows), so the layout is part of the
    * artifact contract, not an optimization a caller may skip.
    * Centroids reuse the exact [[saveCentroids]] round-trip
    * (bit-exact doubles, cell_id-pinned order).
    */
  def saveIvfIndex(spark: SparkSession, path: String,
                   centroids: Seq[Array[Double]],
                   assigned: org.apache.spark.sql.DataFrame): Unit = {
    saveCentroids(spark, s"$path/centroids", centroids)
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/assignments")
  }

  def loadIvfIndex(spark: SparkSession, path: String)
      : (Seq[Array[Double]], org.apache.spark.sql.DataFrame) =
    (loadCentroids(spark, s"$path/centroids"),
      spark.read.parquet(s"$path/assignments"))

  /** The INCREMENTAL suffix index (r13) — the q134 span table plus
    * the per-position gram index
    * ([[graft.dedup.SuffixRepeats.gramIndex]]) persisted as ONE
    * versioned unit, so each ingest cycle loads the pair, runs
    * [[graft.dedup.SuffixRepeats.mergeSpanList]] over the arriving
    * batch, and persists the next version — the exact-substring
    * family's crawl-state-style loop. Spans are doc-count-sized
    * (materialized on load); the gram index is corpus-token-sized
    * and stays a PLAIN SCAN — it is read once per cycle as the probe
    * side of a semi-join, and pinning it in executor storage would
    * trade the cluster's memory for nothing.
    */
  def saveSuffixIndex(spans: org.apache.spark.sql.DataFrame,
                      grams: org.apache.spark.sql.DataFrame,
                      path: String): Unit = {
    spans.write.mode("overwrite").parquet(s"$path/spans")
    grams.write.mode("overwrite").parquet(s"$path/grams")
  }

  def loadSuffixIndex(spark: SparkSession, path: String)
      : (org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) =
    (Checkpoints.materialize(spark.read.parquet(s"$path/spans")),
      spark.read.parquet(s"$path/grams"))

  /** The served SimHash signature table (id, sh) —
    * [[graft.dedup.Dedup.simhashTable]]'s fit-once state, the history
    * side of the batch-vs-served probe
    * ([[graft.dedup.Dedup.simhashBatchEdges]]). Corpus-sized → one
    * row per doc, distributed write; [[loadSimhashSigs]] restores the
    * `sh` partitioning the collapse consumers expect and
    * materializes, so a loaded table serves with zero signature-hash
    * jobs. Wire it back with
    * [[graft.dedup.Dedup.installSimhashSigs]].
    */
  def saveSimhashSigs(sigs: org.apache.spark.sql.DataFrame,
                      path: String): Unit =
    sigs.write.mode("overwrite").parquet(path)

  def loadSimhashSigs(spark: SparkSession,
                      path: String): org.apache.spark.sql.DataFrame =
    Checkpoints.materialize(
      spark.read.parquet(path).repartition(col("sh")))

  /** The served SRP signature table (id, embedding, sig) —
    * [[graft.sim.Similarity.srpTable]]'s fit-once state, the history
    * side of the embedding batch probe
    * ([[graft.sim.Similarity.srpBatchEdges]]). Corpus-sized → one row
    * per vector, distributed write; [[loadSrpTable]] restores the id
    * partitioning the banding consumers expect (the CollapseProject
    * barrier) and materializes, so a loaded table serves with zero
    * plane-projection jobs.
    */
  def saveSrpTable(table: org.apache.spark.sql.DataFrame,
                   path: String): Unit =
    table.write.mode("overwrite").parquet(path)

  def loadSrpTable(spark: SparkSession, path: String,
                   idCol: String = "vec_id")
      : org.apache.spark.sql.DataFrame =
    Checkpoints.materialize(
      spark.read.parquet(path).repartition(col(idCol)))

  /** The served near-dup pair table (id_a, id_b, jaccard) —
    * [[graft.dedup.Dedup.nearDuplicates]]'s `servePairs` index
    * ([[saveSigs]]'s twin one stage later). Pair-sliver-sized but
    * corpus-proportional → distributed write. Wire a loaded table
    * back with [[graft.dedup.Dedup.installPairs]].
    */
  def savePairs(pairs: org.apache.spark.sql.DataFrame,
                path: String): Unit =
    pairs.write.mode("overwrite").parquet(path)

  def loadPairs(spark: SparkSession,
                path: String): org.apache.spark.sql.DataFrame =
    Checkpoints.materialize(spark.read.parquet(path))

  /** The crawl loop's operational state (r12 — r11 verdict Next #4):
    * everything [[graft.sources.Recrawl]]'s next cycle reads that
    * previously lived only as caller-carried DataFrames and died with
    * the JVM —
    *  - `history` (loc, crawl_day, changed): the add-half change-rate
    *    estimator's observations, grown by `ingestOutcomes`;
    *  - `errorLedger` (loc, n_errors, next_eligible_day): the
    *    exponential back-off `planWithBackoff` enforces — losing it
    *    mid-loop would re-hammer every erroring host at full rate;
    *  - `hostQuality` (host, keep_rate): the keep-rate priors
    *    `planWithQuality` folds into staleness priority.
    * A restarted driver loads the state and plans the next cycle
    * IDENTICALLY to an uninterrupted loop (RecrawlSpec asserts the
    * plan across a save/load boundary bit-for-bit). History is
    * crawl-log-sized → distributed write; ledger and quality are
    * error-/host-bounded but write the same way for uniformity —
    * all columns are longs/booleans/doubles-from-ratios, so the
    * round-trips are exact.
    */
  case class CrawlState(history: org.apache.spark.sql.DataFrame,
                        errorLedger: org.apache.spark.sql.DataFrame,
                        hostQuality: org.apache.spark.sql.DataFrame)

  def saveCrawlState(state: CrawlState, path: String): Unit = {
    state.history.write.mode("overwrite").parquet(s"$path/history")
    state.errorLedger.write.mode("overwrite")
      .parquet(s"$path/error_ledger")
    state.hostQuality.write.mode("overwrite")
      .parquet(s"$path/host_quality")
  }

  def loadCrawlState(spark: SparkSession, path: String): CrawlState =
    CrawlState(
      Checkpoints.materialize(spark.read.parquet(s"$path/history")),
      Checkpoints.materialize(
        spark.read.parquet(s"$path/error_ledger")),
      Checkpoints.materialize(
        spark.read.parquet(s"$path/host_quality")))

  /** The served duplicate-cluster label table (doc_id, cluster_id) —
    * [[graft.dedup.Dedup.duplicateClusters]]'s output and
    * [[graft.dedup.Dedup.mergeClusters]]'s input/output: production
    * dedup is a loop, so the labels persist between ingest cycles and
    * each batch's new edges merge into the LOADED table instead of
    * re-propagating the full edge list. Corpus-sized → distributed
    * write; both columns are longs, so the round-trip is exact.
    */
  def saveLabels(labels: org.apache.spark.sql.DataFrame,
                 path: String): Unit =
    labels.write.mode("overwrite").parquet(path)

  def loadLabels(spark: SparkSession,
                 path: String): org.apache.spark.sql.DataFrame =
    Checkpoints.materialize(spark.read.parquet(path))

  /** A served per-doc LM score frame — [[NgramLm.cachedScoreFrame]]'s
    * derived trained state (q136/q151/q156/q166's warm input).
    * Corpus-sized → distributed write; the columns are integer
    * counts and 4dp-rounded doubles, so the round-trip is exact and
    * a loaded frame is bit-equal to a rebuilt one. Wire it back with
    * [[NgramLm.installScoreFrame]].
    */
  def saveScoreFrame(frame: org.apache.spark.sql.DataFrame,
                     path: String): Unit =
    frame.write.mode("overwrite").parquet(path)

  def loadScoreFrame(spark: SparkSession,
                     path: String): org.apache.spark.sql.DataFrame =
    Checkpoints.materialize(spark.read.parquet(path))

  /** Linear-model weight vectors — q140's trained quality classifier
    * (and any (feature, weight) model). The ordinal pins position so
    * the margin expression rebuilds in training order; the name makes
    * the artifact self-describing across jobs.
    */
  def saveWeights(spark: SparkSession, path: String,
                  weights: Seq[(String, Double)]): Unit = {
    import spark.implicits._
    weights.zipWithIndex
      .map { case ((name, w), i) => (i, name, w) }
      .toDF("ordinal", "feature", "weight")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadWeights(spark: SparkSession,
                  path: String): Seq[(String, Double)] =
    spark.read.parquet(path)
      .orderBy(col("ordinal").asc)
      .collect()
      .map(r => (r.getAs[String]("feature"), r.getAs[Double]("weight")))
      .toSeq
}
