package graft

import org.apache.spark.sql.functions._
import graft.sampling.Sampling
import graft.text.TextAnalysis

/** Training-data prep operators: token-window chunking and
  * deterministic (hash-keyed) stratified sampling.
  */
class SamplingChunkSpec extends SparkSpec {
  import spark.implicits._

  test("tokenChunks windows with overlap; trailing chunk is short") {
    // 10 tokens, chunkSize=4, step=3 → starts 1,4,7,10 → sizes 4,4,4,1
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val chunks = Seq((1L, text)).toDF("doc_id", "text")
      .select(explode(TextAnalysis.tokenChunks($"text", 4, 3)).as("c"))
      .select($"c.chunk_idx", $"c.chunk_tokens")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[String](1))
    assert(chunks.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(chunks.map(_._2.length).toSeq == Seq(4, 4, 4, 1))
    // overlap: chunk 1 starts at token 4 (1-based), repeats t4
    assert(chunks(1)._2 == Seq("t4", "t5", "t6", "t7"))
    assert(chunks(3)._2 == Seq("t10"))
  }

  test("tokenChunks on an empty document yields one empty chunk") {
    val chunks = Seq((1L, "")).toDF("doc_id", "text")
      .select(explode(TextAnalysis.tokenChunks($"text", 64, 48)).as("c"))
      .select($"c.chunk_idx", size($"c.chunk_tokens").as("n"))
      .collect()
    assert(chunks.length == 1)
    assert(chunks(0).getInt(1) == 0)
  }

  test("tokenChunks rejects non-positive sizes") {
    intercept[IllegalArgumentException] {
      TextAnalysis.tokenChunks(col("text"), 0, 48)
    }
  }

  test("hashFraction is deterministic, in [0,1), and salt-sensitive") {
    val df = (1L to 200L).toDF("k")
    val fracs = df.select(Sampling.hashFraction($"k", "s1").as("f"))
      .collect().map(_.getDouble(0))
    assert(fracs.forall(f => f >= 0.0 && f < 1.0))
    val again = df.select(Sampling.hashFraction($"k", "s1").as("f"))
      .collect().map(_.getDouble(0))
    assert(fracs.sameElements(again)) // pure function of (key, salt)
    val other = df.select(Sampling.hashFraction($"k", "s2").as("f"))
      .collect().map(_.getDouble(0))
    assert(!fracs.sameElements(other)) // independent draw per salt
    // roughly uniform: mean of U[0,1) over 200 draws within ±0.1
    val mean = fracs.sum / fracs.length
    assert(mean > 0.4 && mean < 0.6, s"mean=$mean")
  }

  test("stratifiedSample keeps rate-1 strata, drops rate-0, defaults rest") {
    val df = (1L to 300L).map { i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "es" else "fr")
    }.toDF("doc_id", "lang")
    val kept = Sampling.stratifiedSample(df, "lang",
        Map("en" -> 1.0, "es" -> 0.0), $"doc_id", salt = "t")
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") == 100)       // rate 1.0 keeps everything
    assert(!kept.contains("es"))    // rate 0.0 drops the stratum
    assert(kept("fr") == 100)       // defaultRate = 1.0
  }

  test("assignSplit covers all rows, respects bounds, stays stable") {
    val df = (1L to 1000L).toDF("k")
    val splits = df.select($"k", Sampling.assignSplit($"k",
        Seq("train" -> 0.9, "val" -> 0.95, "test" -> 1.0), "s1")
        .as("split"))
      .groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.values.sum == 1000)
    assert(splits("train") > 800 && splits("train") < 950)
    assert(splits.keySet == Set("train", "val", "test"))
    // a key's split never changes when more data arrives
    val one = df.filter($"k" === 7L).select(Sampling.assignSplit($"k",
      Seq("train" -> 0.9, "val" -> 0.95, "test" -> 1.0), "s1"))
      .head().getString(0)
    val among = (1L to 5000L).toDF("k").filter($"k" === 7L)
      .select(Sampling.assignSplit($"k",
        Seq("train" -> 0.9, "val" -> 0.95, "test" -> 1.0), "s1"))
      .head().getString(0)
    assert(one == among)
  }

  test("assignSplit rejects unsorted bounds") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(col("k"), Seq("a" -> 0.9, "b" -> 0.5))
    }
  }

  test("packSequences splits the token stream at capacity boundaries") {
    import graft.sampling.Packing
    // one bucket (buckets=1): chunks of 60 tokens, capacity 100 —
    // first-token positions 0,60,120,180 → seqs 0,0,1,1
    val chunks = Seq((1L, 0, 60L), (1L, 1, 60L), (2L, 0, 60L),
      (2L, 1, 60L)).toDF("doc_id", "chunk_idx", "n_chunk_tokens")
    val packed = Packing.packSequences(chunks, capacity = 100,
        buckets = 1)
      .orderBy($"doc_id", $"chunk_idx")
      .collect()
      .map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset")))
    assert(packed.toSeq == Seq((0L, 0L), (0L, 60L), (1L, 20L), (1L, 80L)))
  }

  test("packSequences buckets are independent and repartition-stable") {
    import graft.sampling.Packing
    val chunks = (1L to 50L).flatMap(d => (0 until 3).map(i =>
      (d, i, 40L))).toDF("doc_id", "chunk_idx", "n_chunk_tokens")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packSequences(df, capacity = 64, buckets = 4)
        .select($"doc_id", $"chunk_idx", $"bucket", $"seq_id",
          $"seq_offset")
        .collect().map(_.toSeq).toSet
    val a = run(chunks)
    assert(a == run(chunks.repartition(13)))
    // every offset respects capacity, buckets match doc_id % 4
    a.foreach { row =>
      assert(row(4).asInstanceOf[Long] < 64)
      assert(row(2).asInstanceOf[Int] ==
        (row(0).asInstanceOf[Long] % 4).toInt)
    }
  }

  test("q65 packed sequences conserve chunks and tokens per bucket") {
    // Refactor guard (r2 verdict item 8): the packing aggregation must
    // account for EVERY chunk — per bucket, the sum of per-sequence
    // token counts equals the sum of the chunk token counts that went
    // in, and the sequence chunk counts sum to the chunk-table row
    // count. A packing change that drops or double-assigns a chunk
    // breaks one of these before any oracle run sees it.
    val dir = "/root/testdata/sf0.001"
    val chunkTable = SparkEntry.queries("q51_token_chunks")(spark, dir)
      .withColumn("bucket", pmod($"doc_id", lit(32)).cast("int"))
    val expected = chunkTable.groupBy($"bucket")
      .agg(count(lit(1)).as("n_chunks"),
        sum($"n_chunk_tokens").as("n_tokens"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val packed = SparkEntry.queries("q65_packed_sequences")(spark, dir)
      .groupBy($"bucket")
      .agg(sum($"n_chunks").as("n_chunks"),
        sum($"n_tokens").as("n_tokens"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(expected.nonEmpty)
    assert(packed == expected,
      "packed-sequence totals diverge from the chunk table")
  }

  test("stratifiedSample rate is approximate but repartition-stable") {
    val df = (1L to 1000L).map(i => (i, "en")).toDF("doc_id", "lang")
    val kept = Sampling.stratifiedSample(df, "lang", Map("en" -> 0.5),
      $"doc_id", salt = "t")
    val n = kept.count()
    assert(n > 400 && n < 600, s"kept=$n of 1000 at rate 0.5")
    // membership is per-key, not per-partition: repartitioning the
    // input must select the exact same rows
    val ids = kept.select($"doc_id").collect().map(_.getLong(0)).toSet
    val ids12 = Sampling.stratifiedSample(df.repartition(12), "lang",
        Map("en" -> 0.5), $"doc_id", salt = "t")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ids12)
  }
}
