package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4 split the public `Column` API from Catalyst `Expression`s
  * (Spark Connect); third-party Catalyst extensions (our native
  * indicator aggregates, graft.functions) still need the classic hop,
  * which lives behind `private[sql]` in
  * `org.apache.spark.sql.classic.ExpressionUtils`. This shim is the
  * standard extension-library pattern for reaching it.
  */
object GraftSqlShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager local checkpoint WITH A STATISTICS RESET — the iterative-
    * operator fix for SPARK-level exponential stats compounding:
    * `Dataset.localCheckpoint` truncates the LINEAGE but (since the
    * LogicalRDD originStats change) PRESERVES the original plan's
    * estimated statistics. In a loop of join-dense rounds the
    * size-in-bytes estimate — a PRODUCT over join children — then
    * compounds exponentially across rounds: measured on the two-level
    * Louvain contraction, the estimate reached a 116k-BIT BigInt at
    * the contracted edge frame and 77M bits two rounds later, at
    * which point the DRIVER spends tens of seconds per plan in
    * BigInteger Toom-Cook multiplications (545 s for a 34k-edge
    * level-2 graph). Rebuilding the frame from the checkpointed
    * InternalRow RDD drops originStats (fresh LogicalRDD, default
    * leaf size) with ZERO data copies — the rows pass through
    * untouched.
    */
  def localCheckpointFreshStats(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
    val spark = cp.sparkSession.asInstanceOf[classic.SparkSession]
    cp.queryExecution.optimizedPlan match {
      case lr: execution.LogicalRDD =>
        // TRUTHFUL stats, not merely absent ones: a bare reset leaves
        // the leaf at defaultSizeInBytes (never broadcastable), which
        // measured ~25% slower per iterative query at sf0.1 — the
        // static planner stopped broadcasting the per-round label/
        // degree frames. The block manager already knows the EXACT
        // materialized size of the just-checkpointed RDD (UnsafeRow
        // blocks — no extra job, no estimation), so attach that.
        val measured = spark.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .map(i => BigInt(i.memSize + i.diskSize))
          .filter(_ > 0)
        val stats = catalyst.plans.logical.Statistics(
          sizeInBytes = measured.getOrElse(
            BigInt(spark.sessionState.conf.defaultSizeInBytes)))
        classic.Dataset.ofRows(spark, execution.LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(spark, Some(stats), None))
      case _ => // non-LogicalRDD plan (never in practice): plain reset
        spark.internalCreateDataFrame(
          cp.queryExecution.toRdd, df.schema, isStreaming = false)
    }
  }
}
