package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.model.Artifacts
import graft.sim.Similarity
import graft.text.{MultiPattern, UnigramLm}

/** Artifact persistence: exact round-trips for every trained-model
  * shape, and the production handoff — a LOADED artifact drives the
  * online path with zero training jobs.
  */
class ArtifactsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_art_$name").toString + "/a"

  test("centroids round-trip bit-for-bit, order pinned by cell_id") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = Similarity.trainedCentroids(vecs, nlist = 4, iters = 2)
    val p = tmp("cent")
    Artifacts.saveCentroids(spark, p, cents)
    val back = Artifacts.loadCentroids(spark, p)
    assert(back.length == cents.length)
    cents.zip(back).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "centroid drifted")
    }
  }

  test("unigram inventory round-trips and drives Viterbi identically") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val inv = UnigramLm.cachedInventory(d, "text")
    val p = tmp("vocab")
    Artifacts.saveVocab(spark, p, inv)
    val back = Artifacts.loadVocab(spark, p)
    assert(back == inv)
    // the handoff: scoring with the LOADED inventory runs no fit
    val before = UnigramLm.fitRunCount.get()
    val a = d.withColumn("st", UnigramLm.viterbiStats(col("text"), back))
      .select(col("doc_id"), col("st.n_pieces"), col("st.cost_units"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(UnigramLm.fitRunCount.get() == before,
      "loading an artifact must not trigger training")
    val b = d.withColumn("st", UnigramLm.viterbiStats(col("text"), inv))
      .select(col("doc_id"), col("st.n_pieces"), col("st.cost_units"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
  }

  test("pattern list round-trips with positional ids intact") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val pats = MultiPattern.cachedPatterns(d, "text")
    val p = tmp("pats")
    Artifacts.savePatterns(spark, p, pats)
    assert(Artifacts.loadPatterns(spark, p) == pats)
  }
}
