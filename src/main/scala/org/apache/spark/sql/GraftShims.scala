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

  /** A DataFrame over an already-analyzed logical plan — what a
    * RunnableCommand that captured a sub-plan at analysis time (the
    * SQL MERGE door's source) uses to execute it later.
    * `Dataset.ofRows` is private[sql], hence the shim. */
  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The DataFrame's physical output as InternalRows — what a V1
    * `needConversion = false` relation returns from `buildScan` (the
    * same contract Spark's built-in V1 sources use: the engine treats
    * the RDD[Row] as RDD[InternalRow] when the flag is false). */
  def toInternalRdd(df: DataFrame): org.apache.spark.rdd.RDD[catalyst.InternalRow] =
    df.asInstanceOf[classic.DataFrame].queryExecution.toRdd

  /** An isStreaming=true DataFrame over InternalRows — the frame a V1
    * streaming `Source.getBatch` must return (the engine checks the
    * flag; `internalCreateDataFrame` is private[sql], hence the shim). */
  def streamingDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
      schema: types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** A DSv2 literal for column-default metadata —
    * `connector.expressions.LiteralValue` is private[sql], hence the
    * shim. */
  def v2Literal(v: Any, dt: types.DataType): connector.expressions.Literal[_] =
    connector.expressions.LiteralValue(v, dt)

  /** Free the blocks behind a `localCheckpoint(true)`-ed DataFrame.
    * `Dataset.unpersist` only uncaches CacheManager entries — a
    * checkpointed plan is a `LogicalRDD` the manager never registered,
    * so unpersist on it is a silent no-op and the checkpoint blocks
    * linger until GC + ContextCleaner. Unpersisting the underlying RDD
    * releases them deterministically; falls back to plain unpersist
    * for non-checkpointed frames. */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.asInstanceOf[classic.DataFrame].queryExecution.analyzed match {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => df.unpersist(false)
    }

  /** Re-plan a streaming micro-batch DataFrame (the one a V1
    * `Sink.addBatch` receives) as a NON-streaming DataFrame over the
    * batch's materialized rows — exactly what Spark's own
    * ForeachBatchSink does (LogicalRDD.fromDataset with
    * isStreaming=false), so the sink can run ordinary batch writes. */
  def asBatch(df: DataFrame): DataFrame = {
    val c = df.asInstanceOf[classic.DataFrame]
    val node = execution.LogicalRDD.fromDataset(
      c.queryExecution.toRdd, c, isStreaming = false)
    classic.Dataset.ofRows(c.sparkSession, node)
  }
}
