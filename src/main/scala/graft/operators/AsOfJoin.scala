package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for each left row, attach the nearest right row at or
  * before ([[backward]]) / at or after ([[forward]]) the left row's
  * time, per key — the line-movement primitive ("which odds were live
  * when this bet was placed?" / "where did the line move next?") the
  * reference approximates by replaying its append-only snapshot CSV
  * (`docs/README.md:40`, SURVEY §1.4).
  *
  * Spark has no ASOF JOIN; the scalable formulation is the tagged
  * union + running `last_value(ignoreNulls)` window:
  *
  *   1. tag right rows side=0, left rows side=1; union on
  *      (keys, time, side, payload-structs);
  *   2. one window pass per key, ordered by time toward the direction
  *      of visibility, carries the most recent right payload;
  *   3. keep side=1 rows.
  *
  * ONE shuffle + sort over left+right — no range join explosion, no
  * per-row probing, and skew behaves like any window (salt the key if
  * a single entity dominates). A broadcast-range variant would beat it
  * only when the right side fits in memory; this shape survives both
  * sides at 100 TB.
  *
  * Ties: a right row at exactly the left row's time IS visible in
  * both directions; equal right times resolve to the greatest
  * `rightOrder` — pass a unique column to pin determinism.
  *
  * `tolerance` (pandas `merge_asof` semantics, inclusive): a match
  * farther than `tolerance` from the left time nulls out — the join
  * stays left-outer. Requires a numeric time column (the subtraction
  * must be meaningful); the check is a post-window projection, no
  * extra shuffle.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               timeCol: String, rightOrder: String,
               tolerance: Option[Long] = None): DataFrame =
    unionWindow(left, right, keys, timeCol, rightOrder, tolerance,
      forwardDir = false)

  /** Forward as-of: the EARLIEST right row with time >= the left
    * row's time — same machinery as [[backward]] with the window
    * ordered descending (the carried "most recent" right row in
    * descending order is the nearest following one in real time).
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              timeCol: String, rightOrder: String,
              tolerance: Option[Long] = None): DataFrame =
    unionWindow(left, right, keys, timeCol, rightOrder, tolerance,
      forwardDir = true)

  private def unionWindow(left: DataFrame, right: DataFrame,
      keys: Seq[String], timeCol: String, rightOrder: String,
      tolerance: Option[Long], forwardDir: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{DateType, NumericType, StringType, StructType, TimestampType}
    val roType = right.schema(rightOrder).dataType
    roType match {
      case _: NumericType | _: TimestampType | _: StringType |
           _: DateType => // totally ordered; used in its NATIVE type
      case other => throw new IllegalArgumentException(
        s"rightOrder column '$rightOrder' must be an orderable scalar " +
          s"(got $other) so equal-time ties resolve deterministically")
    }
    tolerance.foreach { tol =>
      require(tol >= 0, s"tolerance must be >= 0, got $tol")
      require(left.schema(timeCol).dataType.isInstanceOf[NumericType],
        s"tolerance requires a numeric time column, got " +
          left.schema(timeCol).dataType)
    }
    val leftPayload = struct(left.columns.map(col): _*)
    val rightValueCols = right.columns
      .filterNot(c => keys.contains(c) || c == timeCol)
    val rightPayload = struct(right.columns.map(col): _*)
    val leftType = StructType(left.schema.fields)
    val rightType = StructType(right.schema.fields)

    val keyCols = keys.map(col)
    // __ro keeps its NATIVE type — casting to long would truncate
    // sub-second timestamps / fractional doubles and silently collapse
    // distinct order values into ties
    val taggedRight = right.select(
      keyCols :+ col(timeCol).as("__t") :+ lit(0).as("__side") :+
        col(rightOrder).as("__ro") :+
        rightPayload.as("__r") :+
        lit(null).cast(leftType).as("__l"): _*)
    val taggedLeft = left.select(
      keyCols :+ col(timeCol).as("__t") :+ lit(1).as("__side") :+
        lit(null).cast(roType).as("__ro") :+
        lit(null).cast(rightType).as("__r") :+
        leftPayload.as("__l"): _*)

    // Backward walks time ascending; forward walks it descending so
    // "last right row seen" is the nearest FOLLOWING one. Within an
    // equal timestamp the right row must be seen before the left row
    // (visible in both directions) — side 0 first either way — and
    // __ro stays ascending so the greatest rightOrder is carried last
    // and wins ties identically in both directions.
    val timeOrder = if (forwardDir) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(timeOrder, col("__side").asc, col("__ro").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carriedRaw = taggedRight.unionByName(taggedLeft)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val carried = tolerance match {
      case None => carriedRaw
      case Some(tol) =>
        val dist = if (forwardDir) col(s"__match.$timeCol") - col("__t")
                   else col("__t") - col(s"__match.$timeCol")
        carriedRaw.withColumn("__match",
          when(dist <= lit(tol), col("__match"))
            .otherwise(lit(null).cast(rightType)))
    }

    val leftOut = left.columns.map(c => col(s"__l.$c").as(c))
    val rightOut = rightValueCols.map(c =>
      col(s"__match.$c").as(s"right_$c")) :+
      col(s"__match.$timeCol").as(s"right_$timeCol")
    carried.select(leftOut ++ rightOut: _*)
  }

  /** Broadcast variant of [[backward]] for a SMALL right side (a dim
    * table of reference quotes, a config stream): the right side
    * collapses to one sorted array per key and broadcast-joins onto
    * the left — the LEFT side never shuffles or sorts, which beats the
    * union+window by the cost of shuffling the (large) left whenever
    * the right fits in the broadcast budget. Each left row then takes
    * the last eligible element (`__t` <= its time) of its key's
    * array — same visibility and tie rules as [[backward]] (equal
    * time: right row visible; equal right times: greatest
    * `rightOrder`), so the two variants are interchangeable.
    *
    * Not for large right sides: a key's whole history must fit in one
    * array element (it is the broadcast row).
    */
  def backwardBroadcast(left: DataFrame, right: DataFrame,
                        keys: Seq[String], timeCol: String,
                        rightOrder: String): DataFrame = {
    val rightValueCols = right.columns
      .filterNot(c => keys.contains(c) || c == timeCol)
    val rightPayload = struct(right.columns.map(col): _*)
    val cmp = (a: Column, b: Column) =>
      when(a.getField("__t") < b.getField("__t"), -1)
        .when(a.getField("__t") > b.getField("__t"), 1)
        .when(a.getField("__ro") < b.getField("__ro"), -1)
        .when(a.getField("__ro") > b.getField("__ro"), 1)
        .otherwise(0)
    val rightAgg = right.groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col(timeCol).as("__t"),
        col(rightOrder).as("__ro"), rightPayload.as("__r"))), cmp)
        .as("__arr"))
    // try_element_at: the eligible set can be EMPTY (left row precedes
    // every right row of its key); plain element_at would throw under
    // ANSI mode (the Spark 4 default outside this repo's harness)
    val matched = left.join(broadcast(rightAgg), keys, "left")
      .withColumn("__m",
        try_element_at(filter(col("__arr"),
          e => e.getField("__t") <= col(timeCol)), lit(-1)))
    val leftOut = left.columns.map(col)
    val rightOut = rightValueCols.map(c =>
      col(s"__m.__r.$c").as(s"right_$c")) :+
      col(s"__m.__r.$timeCol").as(s"right_$timeCol")
    matched.select(leftOut ++ rightOut: _*)
  }
}
