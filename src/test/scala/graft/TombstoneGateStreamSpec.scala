package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sampling.Sampling
import graft.streaming.StreamingIngest
import graft.text.TextAnalysis

/** Streaming ≡ batch for the tombstone-aware admission gate: the
  * micro-batched stream (one file per trigger, so within-stream
  * duplicates span BATCH BOUNDARIES) must admit exactly the rows the
  * q165 batch gate admits, reasons included.
  */
class TombstoneGateStreamSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batched streaming admissions == q165 batch admissions") {
    // pick ids on either side of the md5 hash split (q165's scenario)
    val fr = spark.range(0, 300)
      .select(col("id"), Sampling.hashFraction(col("id"), "incr")
        .as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def notSeed(id: Long) = id % 17 != 3
    val histIds = (0L until 300L).filter(fr(_) < 0.8)
    val newIds = (0L until 300L)
      .filter(id => fr(id) >= 0.8 && notSeed(id))
    val hTomb = histIds.find(_ % 17 == 3).get
    val hLive = histIds.find(notSeed).get
    val Seq(n1, n2, n3, n4) = newIds.take(4)
    val docs = Seq(
      (hTomb, "purged text only ever in tombstoned history"),
      (hLive, "live history text still blocking"),
      (n1, "purged text only ever in tombstoned history"),
      (n2, "live history text still blocking"),
      (n3, "brand new text shared within the batch"),
      (n4, "brand new text shared within the batch"))

    // ---- batch side: q165 over the parquet table ----
    val dir = Files.createTempDirectory("tgs").toString
    docs.map { case (id, tx) => (id, "sx", "en", tx) }
      .toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batchAdmitted = SparkEntry
      .queries("q165_tombstone_gate")(spark, dir)
      .filter(col("admitted"))
      .collect().map(r => r.getString(1) -> r.getString(3)).toSet

    // ---- streaming side: history flags + one file per NEW doc ----
    val histLive = docs.filter { case (id, _) => fr(id) < 0.8 }
      .map { case (id, tx) =>
        (tx, id % 17 != 3) // all hist sources are "sx": seed = %17
      }.groupBy(_._1).map { case (tx, rows) =>
        fpOf(tx) -> rows.exists(_._2)
      }
    val landing = Files.createTempDirectory("tgs_land").toString
    docs.filter { case (id, _) => fr(id) >= 0.8 }
      .sortBy(_._1).zipWithIndex.foreach { case ((id, tx), i) =>
        Files.write(Paths.get(landing, f"d$i%03d.json"),
          s"""{"doc_id":$id,"text":"$tx"}""".getBytes("UTF-8"))
      }
    val pairs = spark.readStream
      .schema("doc_id bigint, text string")
      .option("maxFilesPerTrigger", 1) // n3 and n4 arrive in
      .json(landing)                   // DIFFERENT micro-batches
      .select(TextAnalysis.fingerprint(col("text")).as("fp"),
        col("doc_id").cast("string").as("payload"))
      .as[(String, String)]
    val q = StreamingIngest.admissionStream(pairs, histLive)
      .toDF("fp", "payload", "reason")
      .writeStream.format("memory").queryName("tgs_out")
      .option("checkpointLocation",
        Files.createTempDirectory("tgs_ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("tgs_out")
      .collect().map(r => r.getString(0) -> r.getString(2)).toSet

    assert(streamed == batchAdmitted,
      s"streaming admissions must equal the batch gate's:\n" +
        s"stream=$streamed\nbatch=$batchAdmitted")
    assert(streamed.map(_._2) == Set("fresh", "history_purged"),
      "both admission reasons must be exercised")
    // the within-stream duplicate spanned micro-batches and was
    // dropped by STATE, not by within-batch dedup
    assert(streamed.size == 2)
  }

  test("same-batch duplicates admit the MIN payload — the batch " +
      "gate's orderBy(doc_id) choice, not iterator order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = StreamingIngest.admissionStream(input.toDS(), Map.empty)
      .toDF("fp", "payload", "reason")
      .writeStream.format("memory").queryName("tgs_min")
      .outputMode("append").start()
    // one trigger carries three rows of the same fingerprint
    input.addData(("fpA", "doc9"), ("fpA", "doc2"), ("fpA", "doc5"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("tgs_min")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2))).toSeq
    assert(out == Seq(("fpA", "doc2", "fresh")),
      s"must admit the minimum payload deterministically: $out")
  }

  private def fpOf(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(TextAnalysis.fingerprint(col("text")))
      .head().getString(0)
  }
}
