package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 split `Column` (sql-api, ColumnNode-based) from
  * Catalyst `Expression`; the supported conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is package-private
  * to `org.apache.spark.sql` — hence this one-object shim in that package.
  * Everything else in graft stays in the public API.
  */
object GraftShims {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic sessions only). */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Plan a BaseRelation (e.g. a HadoopFsRelation over a custom
    * FileIndex) as a DataFrame. `baseRelationToDataFrame` lives on the
    * classic SparkSession only after Spark 4's api/classic split. */
  def dataFrame(spark: SparkSession, rel: sources.BaseRelation): DataFrame =
    spark.asInstanceOf[classic.SparkSession].baseRelationToDataFrame(rel)

  /** The analyzed logical plan behind a DataFrame — what a
    * table-valued-function builder must hand the analyzer (classic
    * sessions only). */
  def logicalPlan(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.DataFrame].queryExecution.analyzed
}
