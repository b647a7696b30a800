package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable point-in-interval range join: for each point row, the
  * interval rows (same key) with `start <= point < end`.
  *
  * Spark has no native range join — the naive formulation
  * (`p.join(i, keys && p >= s && p < e)`) plans a
  * BroadcastNestedLoopJoin (or a cartesian per key group), which is
  * O(|points|·|intervals|) per key and dies when both sides are big.
  * The scalable shape quantizes the range dimension into fixed-width
  * buckets:
  *
  *   1. each point maps to ONE bucket: `floor(p / width)`;
  *   2. each interval explodes to the buckets it covers
  *      (`floor(s/width) .. floor((e-1)/width)` — at most
  *      `maxBucketsPerInterval`, enforced loudly);
  *   3. equi-join on `(keys, bucket)` — a plain shuffled hash /
  *      sort-merge join Catalyst and AQE can optimize like any other;
  *   4. residual filter `s <= p < e` removes same-bucket misses.
  *
  * Cost is one shuffle of each side (duplicating intervals ≤
  * `maxBucketsPerInterval`×) instead of a nested loop — the standard
  * distributed interval-join design. Pick `bucketWidth` ≈ the typical
  * interval length: wider buckets duplicate fewer intervals but admit
  * more residual misses; narrower the reverse.
  *
  * Bucket arithmetic is exact integer math (`pmod` + `DIV`) — a
  * double division would lose precision above 2^53 and mis-bucket
  * epoch-nanosecond values at bucket boundaries, silently dropping
  * matches. Floor semantics hold for negative values too.
  *
  * An interval wider than `maxBucketsPerInterval * bucketWidth` FAILS
  * LOUDLY (`raise_error`) rather than exploding the duplication
  * factor: one unbounded interval at 100 TB would fan a single row
  * out to millions of bucket copies and look like a hung stage, not
  * an error. Empty intervals (`end <= start`) match nothing.
  *
  * Mirrors the reference's window-attribution loops (SURVEY §2 A6/A7
  * rolling windows; `src/processing.py` replays snapshots to find
  * "odds live at bet time") — re-expressed as one equi-join instead
  * of a per-row scan.
  */
object RangeJoin {

  /** `broadcastIntervals`: for a dim-like interval set (maintenance
    * windows, campaign periods, eval-run spans) force a broadcast of
    * the exploded intervals so the (huge) point side never shuffles —
    * the 100 TB-events ⋈ 10k-intervals shape. Off by default: AQE
    * already picks a broadcast when the exploded side measures small,
    * and a forced broadcast of a genuinely large interval set is an
    * OOM, not an optimization.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointCol: String, startCol: String,
      endCol: String, bucketWidth: Long,
      maxBucketsPerInterval: Int = 4,
      broadcastIntervals: Boolean = false): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    val overlap = (points.columns.toSet & intervals.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"points and intervals share non-key column(s) ${overlap.mkString(",")}" +
        " — rename one side so join output columns are unambiguous")

    // floor-division in pure long math: (x - pmod(x, w)) is exactly
    // divisible by w, so DIV is exact; pmod keeps floor semantics for
    // negative x (DIV alone truncates toward zero).
    def bucketOf(c: String): String =
      s"(`$c` - pmod(`$c`, ${bucketWidth}L)) DIV ${bucketWidth}L"

    val p = points.withColumn("__b", expr(bucketOf(pointCol)))

    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__b0", expr(bucketOf(startCol)))
      .withColumn("__b1", expr(
        s"(`$endCol` - 1 - pmod(`$endCol` - 1, ${bucketWidth}L))" +
          s" DIV ${bucketWidth}L"))
      .withColumn("__b", explode(when(
        col("__b1") - col("__b0") >= lit(maxBucketsPerInterval.toLong),
        raise_error(concat(
          lit(s"range join interval wider than $maxBucketsPerInterval" +
            s" buckets of $bucketWidth (start="),
          col(startCol).cast("string"), lit(", end="),
          col(endCol).cast("string"),
          lit(") — widen bucketWidth or raise maxBucketsPerInterval"))))
        .otherwise(sequence(col("__b0"), col("__b1")))))
      .drop("__b0", "__b1")

    p.join(if (broadcastIntervals) broadcast(iv) else iv, keys :+ "__b")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__b")
  }
}
