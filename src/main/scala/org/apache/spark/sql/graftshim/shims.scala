package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge between `Column` and catalyst `Expression` for Spark 4.x,
  * where the converters are `private[sql]`. Lives under
  * `org.apache.spark.sql` purely for access; contains no logic.
  */
object SqlShims {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType`/`AnyDataType` are `private[sql]` in Spark 4;
    * re-exported here so ExpectsInputTypes implementations outside
    * the spark package can declare a wildcard input slot.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
  val AnyType: AbstractType = org.apache.spark.sql.types.AnyDataType

  /** Rebuild a checkpointed frame WITHOUT its inherited statistics
    * (r13 — the fixpoint-loop planning blowup): `Dataset
    * .localCheckpoint`/`.checkpoint` truncate LINEAGE but copy the
    * pre-checkpoint plan's `Statistics` onto the new `LogicalRDD`
    * leaf, so in an iterative loop each round's size estimate
    * compounds multiplicatively through the round's self-joins (the
    * CC loop's shortcut join alone raises it to the 4th power per
    * round). The VALUES explode double-exponentially — by round ~10
    * the driver burns minutes inside `BigInteger.multiply` while
    * "estimating" a few thousand rows (measured: the q184 label
    * closure at sf0.1 planned >25 min before this fix; the identical
    * data executes in seconds). Copying the leaf with
    * `originStats = None` resets the leaf to
    * `spark.sql.defaultSizeInBytes` while keeping the SAME
    * checkpointed RDD, output attributes, partitioning, and ordering
    * — execution is untouched, and [[graft.model.Checkpoints.release]]
    * still reaches the shared RDD to unpersist it. No-op for frames
    * that are not a bare checkpoint leaf.
    */
  def dropInheritedStats(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val session = df.sparkSession
          .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        org.apache.spark.sql.classic.Dataset.ofRows(session,
          lr.copy()(session, None, None))
      case _ => df
    }
}
