package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** RangeJoin semantics: bucketed equi-join == naive inequality join,
  * half-open bounds, bucket-boundary straddles, negative values,
  * loud failure on over-wide intervals, ambiguous-column rejection.
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def points(rows: (String, Long, Long)*): DataFrame =
    rows.toDF("k", "pid", "p")

  private def intervals(rows: (String, Long, Long, Long)*): DataFrame =
    rows.toDF("k", "iid", "s", "e")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").as[(Long, Long)].collect().toSet

  test("matches the naive inequality join on random-ish data") {
    val ps = points((0 until 200).map(i =>
      (s"k${i % 3}", i.toLong, (i * 37L + 11) % 500)): _*)
    val ivs = intervals((0 until 60).map(i =>
      (s"k${i % 3}", i.toLong, (i * 53L) % 480, (i * 53L) % 480 + (i % 4) * 40L)): _*)
    val got = pairs(RangeJoin.pointInInterval(
      ps, ivs, Seq("k"), "p", "s", "e", bucketWidth = 50L))
    val want = pairs(ps.join(ivs, Seq("k"))
      .filter(col("p") >= col("s") && col("p") < col("e")))
    assert(got == want)
    assert(want.nonEmpty, "fixture produced no matches — test is vacuous")
  }

  test("half-open bounds: start inclusive, end exclusive") {
    val got = pairs(RangeJoin.pointInInterval(
      points(("k", 1L, 100L), ("k", 2L, 200L)),
      intervals(("k", 10L, 100L, 200L)),
      Seq("k"), "p", "s", "e", bucketWidth = 1000L))
    assert(got == Set((1L, 10L)))
  }

  test("interval straddling a bucket boundary still matches") {
    // interval [90, 130) covers buckets 0 and 1 at width 100; a point
    // at 120 lives in bucket 1 only — a non-exploding join would miss it
    val got = pairs(RangeJoin.pointInInterval(
      points(("k", 1L, 120L)),
      intervals(("k", 10L, 90L, 130L)),
      Seq("k"), "p", "s", "e", bucketWidth = 100L))
    assert(got == Set((1L, 10L)))
  }

  test("negative values bucket with floor semantics") {
    val got = pairs(RangeJoin.pointInInterval(
      points(("k", 1L, -150L), ("k", 2L, -250L), ("k", 3L, 0L)),
      intervals(("k", 10L, -200L, -100L)),
      Seq("k"), "p", "s", "e", bucketWidth = 100L))
    assert(got == Set((1L, 10L)))
  }

  test("empty intervals (end <= start) match nothing") {
    val got = RangeJoin.pointInInterval(
      points(("k", 1L, 100L)),
      intervals(("k", 10L, 100L, 100L), ("k", 11L, 200L, 150L)),
      Seq("k"), "p", "s", "e", bucketWidth = 100L)
    assert(got.count() == 0L)
  }

  test("an interval wider than the bucket budget fails loudly") {
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(
        points(("k", 1L, 100L)),
        intervals(("k", 10L, 0L, 1000L)),
        Seq("k"), "p", "s", "e", bucketWidth = 100L,
        maxBucketsPerInterval = 4).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("range join interval wider")),
      s"unexpected error: $ex")
  }

  test("overlapping non-key columns are rejected at plan time") {
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(
        points(("k", 1L, 100L)).withColumnRenamed("pid", "iid"),
        intervals(("k", 10L, 0L, 200L)),
        Seq("k"), "p", "s", "e", bucketWidth = 100L)
    }
    assert(ex.getMessage.contains("non-key column"))
  }

  test("broadcastIntervals matches the shuffle variant, broadcast plan") {
    val ps = points((0 until 100).map(i =>
      (s"k${i % 3}", i.toLong, (i * 37L + 11) % 500)): _*)
    val ivs = intervals((0 until 30).map(i =>
      (s"k${i % 3}", i.toLong, (i * 53L) % 480, (i * 53L) % 480 + 80L)): _*)
    val bc = RangeJoin.pointInInterval(
      ps, ivs, Seq("k"), "p", "s", "e", bucketWidth = 50L,
      broadcastIntervals = true)
    val shuffle = RangeJoin.pointInInterval(
      ps, ivs, Seq("k"), "p", "s", "e", bucketWidth = 50L)
    assert(pairs(bc) == pairs(shuffle))
    assert(pairs(bc).nonEmpty)
    assert(bc.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("property: bucketed join == naive join over generated frames") {
    // ScalaCheck sweep: random keys/values/widths (including negatives
    // and boundary-straddling intervals) — the bucketed formulation
    // must reproduce the naive inequality join exactly for every
    // width, not just the hand-picked fixtures above.
    import org.scalacheck.Gen
    val caseGen = for {
      width <- Gen.oneOf(7L, 50L, 64L, 100L, 333L)
      nP <- Gen.chooseNum(0, 40)
      nI <- Gen.chooseNum(0, 15)
      ps <- Gen.listOfN(nP, for {
        k <- Gen.oneOf("a", "b"); v <- Gen.chooseNum(-400L, 400L)
      } yield (k, v))
      ivs <- Gen.listOfN(nI, for {
        k <- Gen.oneOf("a", "b"); s <- Gen.chooseNum(-400L, 400L)
        len <- Gen.chooseNum(0L, 3 * width)
      } yield (k, s, s + len))
    } yield (width, ps, ivs)
    Iterator.continually(caseGen.sample).flatten.take(8).foreach {
      case (width, psRows, ivRows) =>
        val ps = points(psRows.zipWithIndex.map { case ((k, v), i) =>
          (k, i.toLong, v) }: _*)
        val ivs = intervals(ivRows.zipWithIndex.map { case ((k, s, e), i) =>
          (k, i.toLong, s, e) }: _*)
        val got = pairs(RangeJoin.pointInInterval(
          ps, ivs, Seq("k"), "p", "s", "e", bucketWidth = width))
        val want = pairs(ps.join(ivs, Seq("k"))
          .filter(col("p") >= col("s") && col("p") < col("e")))
        assert(got == want, s"width=$width ps=$psRows ivs=$ivRows")
    }
  }

  test("the plan is an equi-join, not a nested loop") {
    val plan = RangeJoin.pointInInterval(
      points(("k", 1L, 100L)), intervals(("k", 10L, 0L, 200L)),
      Seq("k"), "p", "s", "e", bucketWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      plan.take(2000))
  }
}
