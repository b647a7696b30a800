package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingIngest

/** Crash-injection flag for the torn-window test: the foreachBatch
  * closure runs on the driver, so a static volatile is visible to
  * both the sink and the asserting test.
  */
object CanonicalSinkCrash {
  @volatile var armOnBatch: Long = -1L
}

/** Exactly-once canonical sink (r5 verdict item 8): a kill inside the
  * publish-to-marker window plus a checkpointed restart must yield
  * EXACTLY the batch result — no lost batch, no duplicated batch,
  * and no reader-visible torn state at any point.
  */
class CanonicalSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Five single-row JSON files so AvailableNow with
    * maxFilesPerTrigger=2 splits the run into multiple micro-batches.
    */
  private def stageLanding(): String = {
    val dir = tmp("graft_canon_landing")
    (0 until 5).foreach { i =>
      Files.write(java.nio.file.Paths.get(dir, s"f$i.json"),
        s"""{"k":$i,"v":"row$i"}""".getBytes)
    }
    dir
  }

  private def sink(landing: String, canonical: String,
                   checkpoint: String): Unit = {
    val src = spark.readStream
      .schema("k bigint, v string")
      .option("maxFilesPerTrigger", 2)
      .json(landing)
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        StreamingIngest.commitBatch(batch, canonical, id,
          afterPublish = () =>
            if (CanonicalSinkCrash.armOnBatch == id) {
              CanonicalSinkCrash.armOnBatch = -1L
              throw new RuntimeException("injected crash in torn window")
            })
      }
      .start()
    q.awaitTermination()
  }

  test("kill in the torn window + restart == batch output, exactly once") {
    val landing = stageLanding()
    val canonical = tmp("graft_canon_table")
    val checkpoint = tmp("graft_canon_ckpt")
    // first run crashes AFTER batch 1's data rename, BEFORE its marker
    CanonicalSinkCrash.armOnBatch = 1L
    val ex = intercept[Exception](sink(landing, canonical, checkpoint))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("injected crash")))
    val fs = new org.apache.hadoop.fs.Path(canonical)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // torn state on disk: batch 1's data dir exists, marker does not —
    // and the committed view cannot see it
    assert(fs.exists(new org.apache.hadoop.fs.Path(canonical, "batch=1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(canonical, "_txn/1")))
    val visible = StreamingIngest
      .readCanonicalCommitted(spark, canonical)
      .select($"k").as[Long].collect().toSet
    assert(visible.subsetOf(Set(0L, 1L, 2L, 3L, 4L)) && visible.size < 5)
    // restart from the SAME checkpoint: the replayed batch must clean
    // its orphan and publish exactly once, then the rest completes
    sink(landing, canonical, checkpoint)
    val rows = StreamingIngest.readCanonicalCommitted(spark, canonical)
      .select($"k", $"v").as[(Long, String)].collect().sorted.toSeq
    assert(rows == (0 until 5).map(i => (i.toLong, s"row$i")))
  }

  test("a replayed committed batch is a no-op (marker short-circuit)") {
    val canonical = tmp("graft_canon_replay")
    val first = Seq((1L, "original")).toDF("k", "v")
    StreamingIngest.commitBatch(first, canonical, 7L)
    // a redelivery with DIFFERENT content must not republish
    StreamingIngest.commitBatch(
      Seq((1L, "corrupted-redelivery")).toDF("k", "v"), canonical, 7L)
    val got = StreamingIngest.readCanonicalCommitted(spark, canonical)
      .select($"v").as[String].collect().toSeq
    assert(got == Seq("original"))
  }

  test("pre-rename crash garbage is cleaned on replay") {
    val canonical = tmp("graft_canon_tmpclean")
    val fs = new org.apache.hadoop.fs.Path(canonical)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash during the tmp write: junk under __tmp_batch_3
    val junk = new org.apache.hadoop.fs.Path(canonical,
      "__tmp_batch_3/part-junk")
    val out = fs.create(junk, true); out.write(1); out.close()
    StreamingIngest.commitBatch(Seq((3L, "x")).toDF("k", "v"),
      canonical, 3L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(canonical,
      "__tmp_batch_3")))
    val got = StreamingIngest.readCanonicalCommitted(spark, canonical)
      .select($"k").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }
}
