package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed PER-GROUP dense ranks (row_number over
  * `PARTITION BY grp ORDER BY keys`) WITHOUT one reducer per group:
  * the StableRowId two-phase construction generalized to grouped
  * ranks. The naive window clusters each group onto a single task —
  * with a handful of groups (5 languages, 3 splits) that is a 5-task
  * job over the whole table, and with skewed groups it is the hot-key
  * problem all over again. Here:
  *
  *   1. range-partition by (grp, keys) — every partition holds a
  *      contiguous (grp, keys) slice, each GROUP spans MANY partitions;
  *   2. count rows per (partition, grp) — a frame with one row per
  *      (partition, group), thousands of rows, not the data;
  *   3. prefix-sum those counts per group into per-(partition, grp)
  *      offsets (a window over the TINY counts frame only);
  *   4. broadcast-join the offsets back and add a within-partition
  *      row_number over (pid, grp) — local to each range partition.
  *
  * Exactly the global per-group rank, with per-partition parallelism
  * for every group no matter how skewed. The step-4 window's own
  * hash exchange on (pid, grp) redistributes at full width — (pid,
  * grp) cardinality = partitions x groups, never a single hot reducer.
  *
  * The range-partitioned frame is materialized ONCE before both reads:
  * RangePartitioner samples bounds with an RDD-id-derived seed, so
  * re-evaluation could repartition differently than the offsets
  * describe.
  *
  * `keys` must be unique within each group (ties straddling a range
  * boundary would rank non-deterministically). This is THE two-phase
  * rank core: [[StableRowId]] (the global rank) delegates here with a
  * constant group. */
object GroupRank {

  /** @param grp  group column name (rank restarts at 1 per group)
    * @param keys ordering columns, unique per group
    * @param out  output column: 1-based per-group rank, LONG */
  def assign(df: DataFrame, grp: String, keys: Seq[String],
      out: String): DataFrame = {
    val s = df.sparkSession
    val ordered = (grp +: keys).map(col)
    val parts = Checkpoint.truncate(s,
      df.repartitionByRange(ordered: _*)
        .withColumn("__pid", spark_partition_id()))
    val offs = parts.groupBy(col("__pid"), col(grp)).count()
      .withColumn("__off", coalesce(
        sum("count").over(Window.partitionBy(grp).orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col(grp), col("__off"))
    parts.join(broadcast(offs), Seq("__pid", grp))
      .withColumn(out,
        (col("__off") + row_number().over(
          Window.partitionBy(col("__pid"), col(grp))
            .orderBy(keys.map(col): _*))).cast("long"))
      .drop("__pid", "__off")
  }
}
