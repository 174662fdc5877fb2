package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the converters
  * (`classic.ExpressionUtils`) private[sql], so third-party Catalyst
  * expressions need this one-file shim inside the org.apache.spark.sql
  * namespace — the standard pattern for Spark extension libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The persisted RDD backing a `localCheckpoint`ed Dataset (None for any
    * other plan shape). Checkpointed Datasets resolve to a `LogicalRDD`
    * leaf whose RDD holds the only copy of the data; callers use this to
    * release superseded checkpoints in iterative loops.
    */
  def checkpointRdd(ds: org.apache.spark.sql.Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    ds.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
}
