package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Data-layout operators: Morton (z-order) interleave, deterministic
  * shard layout, and length-bucketed batch packing (q101-q103).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave matches a bit-by-bit reference on corners and randoms") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val cases = Seq((0L, 0L), (255L, 255L), (255L, 0L), (0L, 255L),
      (1L, 2L), (170L, 85L), (37L, 200L), (128L, 127L))
    val got = cases.toDF("x", "y")
      .select($"x", $"y", ZOrder.interleave($"x", $"y").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, m) => assert(m == ref(x, y, 8), s"($x,$y)") }
    // corners pin the bit order: x on even positions, y on odd
    assert(ref(255L, 0L, 8) == 0x5555L)
    assert(ref(0L, 255L, 8) == 0xAAAAL)
    assert(ref(255L, 255L, 8) == 0xFFFFL)
  }

  test("interleave is monotone in each dim within a fixed other dim's cell") {
    // within one 16x16 cell (high bits fixed), growing x grows morton
    val rows = (0 until 16).map(x => (x.toLong + 16L, 3L))
    val ms = rows.toDF("x", "y")
      .select(ZOrder.interleave($"x", $"y").as("m"))
      .collect().map(_.getLong(0))
    assert(ms.toSeq == ms.sorted.toSeq)
  }

  test("interleave rejects out-of-range bit widths") {
    intercept[IllegalArgumentException] { ZOrder.interleave($"x", $"y", 0) }
    intercept[IllegalArgumentException] { ZOrder.interleave($"x", $"y", 32) }
  }

  test("mortonSql stays in lockstep with the column expression") {
    // evaluate the SQL string through Spark itself on the same inputs
    val df = Seq((170L, 85L), (255L, 0L), (0L, 255L), (37L, 200L))
      .toDF("x", "y")
    val both = df.select(
      ZOrder.interleave($"x", $"y").as("a"),
      expr(ZOrder.mortonSql("x", "y")).as("b")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("shard layout is a pure function of doc_id: stable under repartition") {
    val d = spark.range(0, 300).toDF("doc_id")
    def layout(df: org.apache.spark.sql.DataFrame) = {
      def h(salt: String) =
        conv(substring(md5(concat(lit(salt),
          $"doc_id".cast("string"))), 1, 8), 16, 10).cast("long")
      val w = Window.partitionBy($"shard_id")
        .orderBy($"okey".asc, $"doc_id".asc)
      df.select($"doc_id", pmod(h("shard1"), lit(16L)).as("shard_id"),
          h("order1").as("okey"))
        .withColumn("order_idx", row_number().over(w))
        .select($"doc_id", $"shard_id", $"order_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sortBy(_._1).toSeq
    }
    val a = layout(d.repartition(7))
    val b = layout(d.repartition(3, $"doc_id"))
    assert(a == b)
    // every shard in range; order_idx is 1..n_shard_docs with no gaps
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet.forall(s => s >= 0 && s < 16))
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1 to rows.size).toSeq)
    }
  }

  test("batch packing: padded = batches * own-max; short tail batch pads less") {
    // one bucket, one shard: 10 docs of len 9..0, batch size 8 →
    // batch0 = lens 9..2 (max 9, sum 44), batch1 = lens 1,0 (max 1, sum 1)
    val lens = (0 to 9).map(i => (i.toLong, (9 - i).toLong))
    val d = lens.toDF("doc_id", "n_tokens")
    val w = Window.partitionBy(lit(0))
      .orderBy($"n_tokens".desc, $"doc_id".asc)
    val got = d.withColumn("batch_idx",
        floor((row_number().over(w) - 1) / lit(8)))
      .groupBy($"batch_idx")
      .agg(count(lit(1)).as("bn"), max($"n_tokens").as("mx"),
        sum($"n_tokens").as("sm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == Seq((0L, 8L, 9L, 44L), (1L, 2L, 1L, 1L)))
    val padded = got.map { case (_, bn, mx, _) => bn * mx }.sum
    val real = got.map(_._4).sum
    assert(padded == 74L && real == 45L)
  }

  test("contamination spans: pos - row_number() splits runs at gaps") {
    // hits at positions 3,4,5 (run of 3), 9 (run of 1), 11,12 (run of 2)
    val hits = Seq(3L, 4L, 5L, 9L, 11L, 12L).map((1L, _))
      .toDF("doc_id", "pos")
    val wr = Window.partitionBy($"doc_id").orderBy($"pos".asc)
    val runs = hits.withColumn("grp", $"pos" - row_number().over(wr))
      .groupBy($"doc_id", $"grp").agg(count(lit(1)).as("run_len"))
      .groupBy($"doc_id")
      .agg(sum($"run_len").as("n_hit_positions"),
        count(lit(1)).as("n_runs"), max($"run_len").as("longest_span"))
      .collect()
    assert(runs.length == 1)
    val r = runs(0)
    assert(r.getLong(1) == 6L && r.getLong(2) == 3L && r.getLong(3) == 3L)
  }
}
