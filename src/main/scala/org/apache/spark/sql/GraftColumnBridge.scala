package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column <-> catalyst Expression converters,
  * which went `private[sql]` in Spark 4's Connect refactor. Standard
  * extension-library pattern: a minimal adapter placed inside the
  * org.apache.spark.sql package; all engine code goes through here.
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `types.AbstractDataType` is also `private[sql]` in Spark 4; this
    * alias lets engine expressions declare `inputTypes` (for
    * ImplicitCastInputTypes) from outside the package. */
  type AbstractType = types.AbstractDataType

  /** Rebuild `df` as a FRESH LEAF DataFrame over its own InternalRow
    * RDD — same rows, zero per-row conversion, but with the inherited
    * plan STATISTICS (and origin constraints) reset. Needed after
    * `Dataset.checkpoint`: checkpoint truncates lineage for EXECUTION
    * but deliberately carries the child plan's statistics into the
    * LogicalRDD, so in an iterative operator the size-in-bytes estimate
    * compounds multiplicatively round over round (a self-referencing
    * join doubles its bit-length each round) until Catalyst's BigInt
    * product in SizeInBytesOnlyStatsPlanVisitor dominates driver time —
    * at ~40 rounds the estimate reaches millions of bits and a single
    * stats visit takes minutes. AQE re-plans joins from true runtime
    * sizes, so dropping the compile-time estimate is safe.
    *
    * The checkpointed LogicalRDD's captured outputPartitioning and
    * outputOrdering are PRESERVED (the leaf is `copy`ed, not rebuilt):
    * Expand and Components pin their loop frames' hash partitioning
    * through truncate so each iteration shuffles only the small derived
    * sides — dropping the partitioning would re-exchange the full frame
    * every round on the AQE-off bench path. */
  def freshLeaf(df: Dataset[Row]): Dataset[Row] = releaf(df, keepStats = false)

  /** Like [[freshLeaf]] but KEEPING the leaf's size statistics — for
    * one-shot truncations of frames that never re-enter a truncation
    * loop (nothing compounds), where the static planner still wants the
    * true size for its broadcast decision. Origin CONSTRAINTS are
    * dropped in both variants: a checkpoint of a deep expression tree
    * (e.g. an 8-way when-chain pick) otherwise carries that whole tree
    * as an inherited constraint set, and every downstream join re-runs
    * constraint derivation over it — measured seconds of driver CPU per
    * iteration when such a frame is joined inside a loop. */
  def freshLeafKeepStats(df: Dataset[Row]): Dataset[Row] =
    releaf(df, keepStats = true)

  private def releaf(df: Dataset[Row], keepStats: Boolean): Dataset[Row] = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val s = cdf.sparkSession
    cdf.queryExecution.analyzed match {
      case lr: execution.LogicalRDD =>
        val stats = if (keepStats) Some(lr.stats) else None
        classic.Dataset.ofRows(s, lr.copy()(s, stats, None))
      case _ => // non-LogicalRDD input: fall back to a plain re-leaf
        s.internalCreateDataFrame(
          cdf.queryExecution.toRdd, df.schema, isStreaming = false)
    }
  }
}
