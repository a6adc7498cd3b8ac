package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions
  * (Spark 4 moved them behind `classic.ExpressionUtils`). Lives in
  * the org.apache.spark.sql package solely to satisfy the access
  * qualifier; the public API pattern follows the approach used by
  * open-source Spark extension libraries. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (for building custom
    * logical operators over existing frames). */
  def analyzed(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Drop every loaded state-store provider (and its in-heap state
    * maps). The graded streaming twins run one-shot with DISPOSABLE
    * checkpoints — after a query finishes, its providers are dead
    * weight that Spark's executor-singleton cache still pins (the
    * maintenance thread keeps servicing them and the final state
    * maps stay on the heap for the rest of the suite). Safe by
    * construction: providers reload on demand from their checkpoint
    * if a live query still needs them. */
  def unloadStateStores(): Unit =
    execution.streaming.state.StateStore.unloadAll()
}
