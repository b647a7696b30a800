package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.model.Checkpoints

/** The fixpoint-loop planning blowup (r13): `localCheckpoint`
  * truncates lineage but COPIES the pre-checkpoint plan's size
  * statistics onto the new leaf, and the CC loop's shortcut self-join
  * raises that inherited value to the 4th power per round — on a
  * long-diameter graph the size "estimate" reaches millions of digits
  * and the driver grinds in BigInteger arithmetic (q184's sf0.1
  * closure planned >25 minutes). [[Checkpoints.materializeFresh]]
  * drops the inherited statistics at every loop barrier; these cases
  * pin the bound and the loop's continued correctness on exactly the
  * graph shape that triggered the blowup.
  */
class CheckpointStatsSpec extends SparkSpec {

  import spark.implicits._

  test("materializeFresh truncates inherited statistics while " +
      "keeping rows, schema, and the releasable checkpoint leaf") {
    // big ESTIMATE, zero DATA: disjoint inner joins multiply the
    // size estimate (the stats visitor takes the children's product)
    // without producing a row, so the checkpoint executes instantly
    // while carrying a >20-digit inherited stat
    var f = spark.range(100).toDF("u")
    for (_ <- 1 to 8)
      f = f.join(spark.range(1000, 1100).toDF("v"),
        col("u") === col("v")).select(col("u"))
    val preDigits = f.queryExecution.optimizedPlan
      .stats.sizeInBytes.toString.length
    assert(preDigits > 20, s"fixture estimate only $preDigits digits")
    val plain = Checkpoints.materialize(f)
    val plainDigits = plain.queryExecution.optimizedPlan
      .stats.sizeInBytes.toString.length
    val fresh = Checkpoints.materializeFresh(f)
    val freshDigits = fresh.queryExecution.optimizedPlan
      .stats.sizeInBytes.toString.length
    // the plain checkpoint INHERITS the compounded estimate (that is
    // the blowup's transmission mechanism); the fresh one resets to
    // the bounded session default
    assert(plainDigits == preDigits,
      s"inheritance vanished ($plainDigits vs $preDigits) — " +
        "re-examine whether materializeFresh is still needed")
    assert(freshDigits <= 20, s"fresh stat has $freshDigits digits")
    Checkpoints.release(plain)
    Checkpoints.release(fresh)
    // rows/schema survive the stats-free rebuild on a real frame
    val base = Seq((1L, 2L), (3L, 4L)).toDF("u", "v")
    val fr = Checkpoints.materializeFresh(base)
    assert(fr.collect().toSet == base.collect().toSet)
    assert(fr.schema == base.schema)
    Checkpoints.release(fr)
  }

  test("duplicateClusters on a LONG CHAIN keeps plan statistics " +
      "bounded across rounds (the q184 planning-blowup shape)") {
    // a 2000-node path graph: diameter 1999 → ~14 pointer-jumping
    // rounds — enough that 4x-per-round stat compounding would reach
    // ~10^6-digit BigInts and minutes of planning before the fix
    val n = 2000
    val chain = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
      .toDF("id_a", "id_b")
    val t0 = System.nanoTime()
    val labels = Dedup.duplicateClusters(chain)
    val stats = labels.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats.toString.length <= 24,
      s"label-frame stat has ${stats.toString.length} digits — " +
        "round stats are compounding again")
    // one component, min-labeled 0, every node present
    val rows = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == n && rows.forall(_._2 == 0L))
    // generous wall bound: the pre-fix pathology was tens of minutes
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 300.0, f"chain CC took $secs%.1f s")
  }
}
