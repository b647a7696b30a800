package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** PassJoin edit-distance join vs the naive quadratic join — the
  * signature scheme must produce EXACTLY the brute-force pair set
  * (superset candidates + exact rescore), on real part names and on
  * adversarial short/binary-alphabet fuzz.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(probe: DataFrame, master: DataFrame, tau: Int,
      excludeSelf: Boolean): Set[(Long, Long, Int)] = {
    val a = probe.select(col("k").as("a_key"), col("s").as("a_str"))
    val b = master.select(col("k").as("b_key"), col("s").as("b_str"))
    val j = a.crossJoin(b)
      .withColumn("dist", levenshtein(col("a_str"), col("b_str")))
      .filter(col("dist") <= tau)
    val f = if (excludeSelf) j.filter(col("a_key") =!= col("b_key")) else j
    f.select("a_key", "b_key", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def pass(probe: DataFrame, master: DataFrame, tau: Int,
      excludeSelf: Boolean): Set[(Long, Long, Int)] =
    FuzzyJoin.editDistanceJoin(probe, master, "k", "s", tau, excludeSelf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("PassJoin == brute force on part names, tau 1..3") {
    val names = spark.read
      .parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_partkey").cast("long").as("k"),
        col("p_name").as("s"))
    val probe = names.filter(col("k") % 10 === 0)
    for (tau <- 1 to 3) {
      val want = brute(probe, names, tau, excludeSelf = true)
      val got = pass(probe, names, tau, excludeSelf = true)
      assert(got == want, s"tau=$tau: got ${got.size}, want ${want.size}")
      assert(want.nonEmpty, s"tau=$tau fixture produced no pairs")
    }
  }

  test("PassJoin == brute force on short/binary-alphabet fuzz") {
    // {a,b}-alphabet strings of length 0..7: maximal segment
    // collisions, plus the short-string (< tau+1) residual branch —
    // including the empty string (dist(ε, x) = |x|).
    val rnd = new scala.util.Random(7)
    val strs = (1L to 60L).map { i =>
      val len = rnd.nextInt(8)
      (i, (1 to len).map(_ => if (rnd.nextBoolean()) 'a' else 'b')
        .mkString)
    }
    val df = strs.toDF("k", "s")
    for (tau <- 1 to 2) {
      val want = brute(df, df, tau, excludeSelf = true)
      val got = pass(df, df, tau, excludeSelf = true)
      assert(got == want, s"tau=$tau: got ${got.size}, want ${want.size}")
    }
  }

  test("cross-dataset matching keeps equal keys when not excluded") {
    val a = Seq((1L, "spark"), (2L, "flink")).toDF("k", "s")
    val b = Seq((1L, "spork"), (2L, "blink"), (3L, "sparkle"))
      .toDF("k", "s")
    val got = pass(a, b, tau = 2, excludeSelf = false)
    assert(got == Set((1L, 1L, 1), (2L, 2L, 1), (1L, 3L, 2)))
  }
}
