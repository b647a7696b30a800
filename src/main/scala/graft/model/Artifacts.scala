package graft.model

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persistence for trained engine artifacts — the "tiny persisted
  * table" leg of the fit-once discipline: IVF/PQ centroids
  * ([[graft.sim.Similarity.trainedCentroids]]), unigram-LM piece
  * inventories ([[graft.text.UnigramLm.cachedInventory]]), and
  * blocklist pattern tables
  * ([[graft.text.MultiPattern.cachedPatterns]]).
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
}
