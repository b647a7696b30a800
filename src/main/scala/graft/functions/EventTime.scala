package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Event-time normalization.
  *
  * The driver's `events.parquet` has carried two physical conventions
  * across rounds: TIMESTAMP(NANOS) — which Spark cannot represent and
  * reads as nanos-since-epoch longs under
  * `spark.sql.legacy.parquet.nanosAsLong` — and TIMESTAMP(MICROS),
  * which Spark reads as TIMESTAMP_NTZ. All event-time math in the
  * catalog is done in integer epoch-MICROS (exact, engine-portable:
  * the DuckDB oracle's `epoch_us(ts)` yields the same integers for
  * both physical encodings). This helper adapts whatever the scan
  * produced to that convention, so a driver-side schema change never
  * breaks the catalog again.
  */
object EventTime {

  /** Epoch-micros column for `df`'s `c`, whatever its physical type.
    * LongType means a nanos-as-long scan (truncate to micros);
    * timestamp types go through `unix_micros` (the session timezone is
    * pinned UTC everywhere, so the NTZ→LTZ cast is the identity and
    * matches DuckDB's naive-UTC `epoch_us`).
    */
  def epochUs(df: DataFrame, c: String = "ts"): Column =
    df.schema(c).dataType match {
      case LongType => expr(s"$c DIV 1000")
      case _        => unix_micros(col(c).cast(TimestampType))
    }
}
