package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

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
}
