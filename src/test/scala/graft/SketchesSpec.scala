package graft

import org.apache.spark.sql.functions._
import graft.sketch.Sketches

/** Sketch invariants: the guarantees each sketch is bought for.
  *  - HLL: estimate within the ~3σ error band of the exact count
  *    (σ ≈ 1.04/√m ≈ 6.5% at m=256), duplicates invisible.
  *  - Bloom: ZERO false negatives (structural, not probabilistic);
  *    false positives exist but stay below a loose textbook bound.
  *  - CMS: never undercounts (structural); exact on a key whose
  *    cells nobody collides with is not guaranteed, but the top
  *    heavy hitter's estimate must be close at this load factor.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys: Seq[String] =
    (0 until 5000).map(i => s"key_$i")

  test("hll estimate lands within 20% of exact at m=256") {
    val items = keys.toDF("item")
    val est = Sketches.hllSummary(
      Sketches.hllRegisters(items, $"item", 8), 8)
      .select($"hll_estimate").as[Double].head()
    assert(math.abs(est - 5000.0) / 5000.0 < 0.2,
      s"hll estimate $est too far from 5000")
  }

  test("hll is insensitive to duplicates and to partitioning") {
    val once = Sketches.hllSummary(
      Sketches.hllRegisters(keys.toDF("item"), $"item", 8), 8).head()
    val duped = Sketches.hllSummary(
      Sketches.hllRegisters(
        (keys ++ keys ++ keys).toDF("item").repartition(13),
        $"item", 8), 8).head()
    assert(once == duped)
  }

  test("hll linear-counting branch engages on tiny cardinalities") {
    val est = Sketches.hllSummary(
      Sketches.hllRegisters(
        (0 until 30).map(i => s"v$i").toDF("item"), $"item", 8), 8)
      .select($"hll_estimate").as[Double].head()
    assert(math.abs(est - 30.0) / 30.0 < 0.25,
      s"small-range estimate $est too far from 30")
  }

  test("bloom has zero false negatives and bounded false positives") {
    val members = keys.take(1000).toDF("k")
    val bits = Sketches.bloomBits(members, $"k", k = 3, mBits = 16384)
    // every member must pass
    val memberHits = Sketches
      .bloomMayContain(members, "k", bits, 3, 16384)
      .filter(!$"may_contain").count()
    assert(memberHits == 0, "bloom false negative — structurally broken")
    // non-members: fp rate ≈ (1 - e^{-kn/m})^k ≈ 0.45% here; allow 5x
    val strangers = (0 until 4000).map(i => s"stranger_$i").toDF("k")
    val fps = Sketches.bloomMayContain(strangers, "k", bits, 3, 16384)
      .filter($"may_contain").count()
    assert(fps < 4000 * 0.025, s"bloom fp rate ${fps / 4000.0} too high")
  }

  test("cms never undercounts and nails the heavy hitter") {
    // zipf-ish: key_i appears (50 - i) times for i in 0..49
    val items = (0 until 50).flatMap(i =>
      Seq.fill(50 - i)(s"key_$i")).toDF("item")
    val counters = Sketches.cmsCounters(items, $"item", d = 4, w = 2048)
    val est = Sketches
      .cmsEstimate((0 until 50).map(i => s"key_$i").toDF("k"),
        "k", counters, d = 4, w = 2048)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 50).foreach { i =>
      val exact = (50 - i).toLong
      assert(est(s"key_$i") >= exact,
        s"cms undercounted key_$i: ${est(s"key_$i")} < $exact")
    }
    // 1275 items over 4x2048 cells: collisions add at most a few
    assert(est("key_0") <= 50L + 10L,
      s"cms heavy hitter blown up: ${est("key_0")}")
  }

  test("hll sketches merge: max-merge of two register sets == union's") {
    // THE property that makes a sketch worth persisting: registers
    // built per shard/day/cluster combine by max into exactly the
    // registers of the combined corpus.
    val (a, b) = (keys.take(3000).toDF("item"), keys.drop(2000).toDF("item"))
    val merged = Sketches.hllRegisters(a, $"item", 8)
      .unionByName(Sketches.hllRegisters(b, $"item", 8))
      .groupBy($"register").agg(max($"max_rho").as("max_rho"))
    val direct = Sketches.hllRegisters(keys.toDF("item"), $"item", 8)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("grouped hll matches per-group ungrouped sketches") {
    val df = keys.zipWithIndex
      .map { case (k, i) => (if (i % 2 == 0) "even" else "odd", k) }
      .toDF("g", "item")
    val grouped = Sketches.hllSummary(
      Sketches.hllRegisters(df, $"item", 8, Seq("g")), 8, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("s_num")).toMap
    Seq("even", "odd").foreach { g =>
      val solo = Sketches.hllSummary(Sketches.hllRegisters(
        df.filter($"g" === g), $"item", 8), 8)
        .head().getAs[Long]("s_num")
      assert(grouped(g) == solo, s"group $g: ${grouped(g)} != $solo")
    }
  }

  test("hll register sum is exact integer arithmetic") {
    val row = Sketches.hllSummary(
      Sketches.hllRegisters(keys.toDF("item"), $"item", 8), 8).head()
    val m = row.getAs[Int]("m")
    val nonzero = row.getAs[Int]("nonzero_registers")
    val sNum = row.getAs[Long]("s_num")
    assert(m == 256 && nonzero <= 256 && nonzero > 0)
    // s_num bounds: all-max-rank .. all-empty
    assert(sNum >= 256L && sNum <= 256L * (1L << 49))
  }
}
