package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Takedown
import graft.sampling.Packing

/** Takedown propagation (r9 verdict item 3): a tombstoned doc must
  * vanish from the canonical table and EVERY derived artifact —
  * including whole packed sequences it participated in — and the
  * audit must reconcile exactly with what the purge removed (the
  * CanonicalSinkSpec thoroughness standard: assert the property on
  * the actual surviving data, not just on counts).
  */
class TakedownSpec extends SparkSpec {

  import spark.implicits._

  // six docs on two domains; tombstones: doc 2 by URL, domain "bad"
  // (docs 4 and 5) wholesale
  private def docs6 = Seq(
    (0L, "ok", "alpha beta gamma delta"),
    (1L, "ok", "epsilon zeta"),
    (2L, "ok", "eta theta iota"),      // URL tombstone
    (3L, "ok", "kappa lambda"),
    (4L, "bad", "mu nu xi"),           // domain tombstone
    (5L, "bad", "omicron pi")          // domain tombstone
  ).toDF("doc_id", "source", "text")

  private def tomb = Takedown.resolveDocs(
    docs6.select(col("doc_id"), col("source")),
    docs6.filter(col("doc_id") === 2L).select(col("doc_id")),
    Seq("bad").toDF("source"))

  test("resolveDocs unions URL ids with domain members, deduped") {
    assert(tomb.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 4L, 5L))
  }

  test("a tombstoned doc vanishes from every derived view; packed " +
      "sequences remove as whole groups") {
    // chunks: 2-token chunks, stride 2 → doc0 has 2 chunks, others 1
    val chunks = docs6.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("i", "w")))
      .withColumn("chunk_idx", floor(col("i") / 2).cast("int"))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_chunk_tokens"),
        md5(concat_ws(" ", collect_list(col("w")))).as("chunk_hash"))
    // capacity 4, ONE bucket → docs pack together end-to-end: the
    // tombstoned docs share sequences with innocent neighbours
    val packed = Packing.packSequences(chunks, capacity = 4,
      buckets = 1)
    val fph = docs6.select(col("doc_id"), md5(col("text")).as("fp"))

    def ids(df: DataFrame): Set[Long] =
      df.select(col("doc_id")).collect().map(_.getLong(0)).toSet

    // row-level artifacts: exactly docs {2,4,5} vanish
    for ((name, art) <- Seq("canonical" -> docs6, "chunks" -> chunks,
        "fph" -> fph)) {
      val purged = Takedown.purge(Takedown.flag(art, tomb))
      assert(ids(purged) == Set(0L, 1L, 3L),
        s"$name must lose exactly the tombstoned docs")
    }

    // group-level: any sequence containing a tombstoned chunk is
    // removed WHOLE — innocent co-packed rows go with it
    val flagged = Takedown.flagGroup(Takedown.flag(packed, tomb),
      Seq("bucket", "seq_id"))
    val purgedSeqs = Takedown.purge(flagged)
    assert(ids(purgedSeqs).intersect(Set(2L, 4L, 5L)).isEmpty,
      "no tombstoned doc may survive in packed sequences")
    val removedSeqIds = flagged.filter(col("__tomb"))
      .select(col("seq_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val survivingSeqIds = purgedSeqs.select(col("seq_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(removedSeqIds.intersect(survivingSeqIds).isEmpty,
      "a sequence is either fully removed or fully kept")

    // the audit reconciles with the purges it describes
    val audit = Takedown.audit(Seq(
        "canonical" -> Takedown.flag(docs6, tomb),
        "packed" -> flagged))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(audit("canonical") == ((6L, 3L, 3L, 3L)))
    val packedRows = packed.count()
    val packedAfter = purgedSeqs.count()
    assert(audit("packed")._1 == packedRows)
    assert(audit("packed")._3 == packedAfter,
      "rows_after must equal what purge actually keeps")
    // collateral disclosure: docs_affected counts every doc whose
    // rows left, innocent co-packed members included
    val affected = flagged.filter(col("__tomb"))
      .select(col("doc_id")).distinct().count()
    assert(audit("packed")._4 == affected)
    assert(affected >= 3L, "group removal sweeps co-packed docs")
  }

  test("repackSurvivors: unaffected sequences bit-identical, no " +
      "tombstoned chunk survives, every survivor packed exactly once") {
    // 12 docs × 3 chunks of 3 tokens across 2 buckets, capacity 8 →
    // several sequences per bucket; tombstones hit docs 2 (bucket 0)
    // and 5 (bucket 1), leaving bucket-0 AND bucket-1 sequences both
    // clean and invalidated
    val chunks = spark.range(0, 12)
      .select(col("id").as("doc_id"),
        explode(sequence(lit(0), lit(2))).as("chunk_idx"))
      .withColumn("n_chunk_tokens", lit(3L))
    val packed = Packing.packSequences(chunks, capacity = 8,
      buckets = 2)
    val tomb = Seq(2L, 5L).toDF("doc_id")
    val out = Takedown.repackSurvivors(packed, tomb, capacity = 8)

    val origByName = packed.select(col("doc_id"), col("chunk_idx"),
        col("bucket"), col("seq_id"), col("seq_offset"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    val invalidSeqs = packed
      .filter(col("doc_id").isin(2L, 5L))
      .select(col("bucket"), col("seq_id")).distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val rows = out.select(col("doc_id"), col("chunk_idx"),
        col("bucket"), col("seq_id"), col("seq_offset"),
        col("repacked"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))

    // (b) no tombstoned chunk in any output sequence
    assert(!rows.exists(r => r._1 == 2L || r._1 == 5L))
    // (c) every surviving chunk packed exactly once
    val keys = rows.map(r => (r._1, r._2))
    assert(keys.distinct.length == keys.length)
    assert(keys.toSet == origByName.keySet
      .filterNot(k => k._1 == 2L || k._1 == 5L))
    // (a) chunks of sequences with no tombstoned member are
    // BIT-IDENTICAL to the original packing (repacked=false)
    rows.filterNot(_._6).foreach { r =>
      assert(origByName((r._1, r._2)) == ((r._3, r._4, r._5)),
        s"clean-sequence row moved: $r")
      assert(!invalidSeqs((r._3, r._4)))
    }
    // repacked rows come only from invalidated sequences, land above
    // the bucket's original max seq id, and never collide with kept
    val maxSeq = packed.groupBy(col("bucket"))
      .agg(max(col("seq_id"))).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val repacked = rows.filter(_._6)
    assert(repacked.nonEmpty, "tombstones must invalidate sequences")
    repacked.foreach { r =>
      assert(invalidSeqs((r._3, origByName((r._1, r._2))._2)),
        s"repacked row came from a clean sequence: $r")
      assert(r._4 > maxSeq(r._3), s"repacked seq id must be new: $r")
      assert(r._5 >= 0 && r._5 < 8)
    }
    // the repack itself is a valid packing: within each new
    // sequence, offsets start where the cumsum says and never
    // exceed capacity at chunk START
    repacked.groupBy(r => (r._3, r._4)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._1, r._2))
      assert(sorted.head._5 < 8)
    }
    assert(invalidSeqs.nonEmpty)
  }

  test("tombstone-aware gate (q165): all four admission reasons") {
    import graft.sampling.Sampling
    // the hash split is md5-keyed on doc_id, so pick ids by probing
    val fr = spark.range(0, 300)
      .select(col("id"), Sampling.hashFraction(col("id"), "incr")
        .as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def notSeed(id: Long) = id % 17 != 3
    val histIds = (0L until 300L).filter(fr(_) < 0.8)
    val newIds = (0L until 300L).filter(id => fr(id) >= 0.8 &&
      notSeed(id))
    val hTomb = histIds.find(_ % 17 == 3).get // tombstoned history
    val hLive = histIds.find(notSeed).get     // live history
    val Seq(n1, n2, n3, n4) = newIds.take(4)
    val dir = java.nio.file.Files.createTempDirectory("tg").toString
    Seq(
      (hTomb, "purged text only ever in tombstoned history"),
      (hLive, "live history text still blocking"),
      (n1, "purged text only ever in tombstoned history"),
      (n2, "live history text still blocking"),
      (n3, "brand new text shared within the batch"),
      (n4, "brand new text shared within the batch")
    ).map { case (id, tx) => (id, "sx", "en", tx) }
      .toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q165_tombstone_gate")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getString(3)))).toMap
    assert(out(n1) == ((true, "history_purged")),
      s"a doc whose only duplicates were purged re-admits: $out")
    assert(out(n2) == ((false, "duplicate")),
      s"live history still blocks: $out")
    val batch = Set(out(n3), out(n4))
    assert(batch == Set((true, "fresh"), (false, "batch_duplicate")),
      s"within-batch dedup keeps exactly one: $out")
    assert(!out.contains(hTomb) && !out.contains(hLive),
      "history docs are not gate output rows")
  }

  test("near-dup-extended takedown (q163): a light edit of a seed " +
      "is swept with provenance; unrelated docs survive") {
    val dir = java.nio.file.Files.createTempDirectory("tdnd").toString
    Seq(
      // doc 3 is a URL-level seed (3 % 17 == 3); doc 4 is the same
      // text plus one word (10/11 shared shingles -> jaccard 0.909)
      (3L, "sx", "en", "the quick brown fox jumps over the lazy dog" +
        " again and again"),
      (4L, "sx", "en", "the quick brown fox jumps over the lazy dog" +
        " again and again today"),
      (5L, "sx", "en", "completely different words nothing shared" +
        " here at all today friend")
    ).toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q163_takedown_neardup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1),
          if (r.isNullAt(2)) null else r.getLong(2),
          r.getBoolean(3)))).toMap
    assert(out(3L) == ((true, null, true)), s"seed row: $out")
    assert(out(4L) == ((false, 3L, true)),
      s"the light edit must be swept via seed 3: $out")
    assert(out(5L) == ((false, null, false)),
      s"unrelated docs must survive: $out")
  }
}
