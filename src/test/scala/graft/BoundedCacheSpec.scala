package graft

import org.apache.spark.sql.functions._
import graft.model.BoundedCache

/** The fit-once memo bound (r10 verdict "what's wrong" item 2): the
  * plan-keyed caches evict LRU under pressure, fire the storage
  * release hook, keep the clear() hatches — and an evicted entry
  * rebuilds identically on re-request (no correctness change).
  */
class BoundedCacheSpec extends SparkSpec {

  test("LRU semantics: access promotes, insertion past the cap " +
      "evicts the eldest and fires the hook") {
    var evicted = List.empty[String]
    val c = new BoundedCache[String](2, (v: String) => evicted ::= v)
    c.put("a", "va"); c.put("b", "vb")
    assert(c.get("a") == "va") // promote a → b is now LRU
    c.put("c", "vc")           // evicts b
    assert(c.size == 2)
    assert(c.get("b") == null && c.get("a") == "va" &&
      c.get("c") == "vc")
    assert(evicted == List("vb"))
    // clear() is the staleness hatch and must NOT fire the hook
    c.clear()
    assert(c.size == 0 && evicted == List("vb"))
    // forEach iterates a snapshot and tolerates removal mid-walk
    c.put("x", "1"); c.put("y", "2")
    c.forEach((k, _) => c.remove(k))
    assert(c.size == 0)
  }

  test("sigCache eviction under pressure: the evicted corpus entry " +
      "rebuilds bit-identically on re-request") {
    import graft.dedup.Dedup
    import spark.implicits._
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    Dedup.clearSigCache()
    val sigs0 = Dedup.signatureTable(d)
    val rows0 = sigs0.collect().map(_.toSeq).toSet // BEFORE eviction
    // flood the memo with MaxMemoEntries distinct keys (fake frames
    // under distinct params) — the real entry is the LRU and evicts;
    // its release hook runs (a guarded no-op for this local frame)
    val fake = Seq(("f", Seq("x"), "fp")).toDF("doc_id", "sig", "sig_fp")
    (1 to graft.model.NgramLm.MaxMemoEntries).foreach { i =>
      Dedup.installSigs(d, fake, k = 1000 + i)
    }
    val before = Dedup.sigBuildCount.get()
    val rebuilt = Dedup.signatureTable(d) // miss → rebuild
    assert(Dedup.sigBuildCount.get() == before + 1,
      "the evicted entry must rebuild, not serve a ghost")
    assert(rebuilt.collect().map(_.toSeq).toSet == rows0,
      "rebuild after eviction must be bit-identical")
    Dedup.clearSigCache()
  }
}
