package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC upsert / SCD2 effective-dating (no reference analog — the
  * standard warehouse merge a production ingest runs when a source
  * re-delivers changed rows).
  *
  * Input is the unioned version history: snapshot rows plus every
  * change batch, each row carrying the business key, a `validFrom`
  * event time, and a `precedence` rank (higher wins when two versions
  * share the same `validFrom` — e.g. change-batch rows supersede the
  * snapshot). Output is the SCD2 form: one row per surviving version
  * with `valid_to` = next version's `validFrom` (null = open) and
  * `is_current`.
  *
  * Scale shape: ONE hash exchange. The explicit repartition on the
  * business key lets both window passes (same-instant winner pick,
  * then effective-range chaining) reuse the same exchange — hash(key)
  * satisfies the finer (key, validFrom) clustering, so Spark inserts
  * only sorts, not a second shuffle. State per key is the version
  * count, never the corpus.
  */
object Merge {

  def scd2(history: DataFrame, keyCols: Seq[String], validFromCol: String,
           precedenceCol: String): DataFrame = {
    val keyC: Seq[Column] = keyCols.map(col)
    // one exchange for both windows (see scaladoc)
    val byKey = history.repartition(keyC: _*)
    val wVer = Window
      .partitionBy((keyCols :+ validFromCol).map(col): _*)
      .orderBy(col(precedenceCol).desc)
    val wSeq = Window.partitionBy(keyC: _*)
      .orderBy(col(validFromCol).asc)
    byKey
      .withColumn("__rn", row_number().over(wVer))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("valid_to", lead(col(validFromCol), 1).over(wSeq))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
