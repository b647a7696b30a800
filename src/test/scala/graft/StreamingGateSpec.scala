package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingIngest

object GatedSinkCrash {
  @volatile var armOnBatch: Long = -1L
}

/** Streaming near-dup admission gate composed with the exactly-once
  * canonical sink (r6 verdict item 7): a kill inside the torn window
  * plus a checkpointed restart must equal the batch gate's output —
  * no re-crawl admitted, nothing admitted twice, nothing lost.
  */
class StreamingGateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val baseText = "alpha bravo charlie delta echo foxtrot golf " +
    "hotel india juliet kilo lima mike november oscar papa quebec " +
    "romeo sierra tango"
  private val editText = baseText.replace("tango", "zulu") // near-dup
  private val novelText = "one red two blue three green four yellow " +
    "five purple six orange seven pink eight gray nine white ten " +
    "black eleven cyan twelve brown"

  private def writeDocs(dir: String, file: String,
                        rows: Seq[(Long, String)]): Unit =
    Files.write(Paths.get(dir, file),
      rows.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }
        .mkString("\n").getBytes("UTF-8"))

  private def runGated(landing: String, canonical: String,
                       checkpoint: String): Unit = {
    val q = spark.readStream
      .schema("doc_id bigint, text string")
      .option("maxFilesPerTrigger", 1)
      .json(landing)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        StreamingIngest.commitBatch(
          StreamingIngest.gateBatch(batch, canonical, "doc_id", "text",
            threshold = 0.5),
          canonical, id,
          afterPublish = () =>
            if (GatedSinkCrash.armOnBatch == id) {
              GatedSinkCrash.armOnBatch = -1L
              throw new RuntimeException("injected crash in torn window")
            })
      }
      .start()
    q.awaitTermination()
  }

  private def committedIds(canonical: String): Seq[Long] =
    StreamingIngest.readCanonicalCommitted(spark, canonical)
      .select($"doc_id").as[Long].collect().toSeq.sorted

  test("gate rejects verbatim + near-dup re-crawls, admits novel docs") {
    val landing = tmp("graft_gate_landing")
    val canonical = tmp("graft_gate_table")
    val checkpoint = tmp("graft_gate_ckpt")
    writeDocs(landing, "f0.json", Seq(0L -> baseText, 1L -> novelText))
    runGated(landing, canonical, checkpoint)
    assert(committedIds(canonical) == Seq(0L, 1L))
    // second crawl: 2 = verbatim re-crawl of 0, 3 = light edit of 0
    // (jaccard ≈ 0.7 over word trigrams), 4 = genuinely new, 5 =
    // exact within-batch duplicate of 4 (first-by-id survives)
    val fresh = "totally separate corpus content with many distinct " +
      "words appearing exactly once in this novel document body here"
    writeDocs(landing, "f1.json", Seq(2L -> baseText, 3L -> editText,
      4L -> fresh, 5L -> fresh))
    runGated(landing, canonical, checkpoint)
    assert(committedIds(canonical) == Seq(0L, 1L, 4L))
  }

  test("kill in the torn window + restart == batch gate, exactly once") {
    val landing = tmp("graft_gate2_landing")
    val canonical = tmp("graft_gate2_table")
    val checkpoint = tmp("graft_gate2_ckpt")
    writeDocs(landing, "f0.json", Seq(0L -> baseText, 1L -> novelText))
    runGated(landing, canonical, checkpoint)
    writeDocs(landing, "f1.json", Seq(2L -> baseText, 4L ->
      ("brand new material for the crash batch with its own distinct " +
        "vocabulary spread over enough words to shingle cleanly")))
    // crash AFTER batch 1's data rename, BEFORE its marker
    GatedSinkCrash.armOnBatch = 1L
    val ex = intercept[Exception](
      runGated(landing, canonical, checkpoint))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("injected crash")))
    // torn: the orphan exists on disk but the committed view — which
    // is also what the gate reads as history — cannot see it
    val fs = new org.apache.hadoop.fs.Path(canonical)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(canonical, "batch=1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(canonical, "_txn/1")))
    assert(committedIds(canonical) == Seq(0L, 1L))
    // restart from the same checkpoint: replay re-gates against the
    // committed history and publishes exactly once
    runGated(landing, canonical, checkpoint)
    assert(committedIds(canonical) == Seq(0L, 1L, 4L))
    val n4 = StreamingIngest.readCanonicalCommitted(spark, canonical)
      .filter($"doc_id" === 4L).count()
    assert(n4 == 1L, s"doc 4 admitted $n4 times; exactly-once broken")
  }

  test("near-dup gate estimate clears / misses the threshold as built") {
    // pin the fixture's signal so the spec fails loudly if the
    // minhash parameters drift: the light edit must exceed 0.5, the
    // novel text must miss it
    val hist = Seq(0L -> baseText).toDF("doc_id", "text")
    val probe = Seq(3L -> editText, 4L -> novelText).toDF("doc_id", "text")
    val m = graft.dedup.Dedup
      .incrementalNearDup(probe, hist, threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(m == Set(3L))
  }
}
