package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global running (prefix) sum of a weight column in key
  * order — the weighted generalization of [[StableRowId]]'s two-phase
  * zipWithIndex, and the primitive behind corpus SEQUENCE PACKING
  * (every document's absolute token offset in the concatenated
  * training stream, q96): range-partition by the unique order key,
  * partial-sum each partition, prefix-sum the tiny per-partition
  * totals into offsets, and add a within-partition running sum. A
  * naive `SUM() OVER (ORDER BY key)` plans a GLOBAL single-partition
  * window — one task scans 100 TB; here the only single-point step is
  * the window over ~hundreds of per-partition totals.
  *
  * Same materialize-once discipline as StableRowId: the range-
  * partitioned frame is truncated before both reads because
  * RangePartitioner's sampled bounds are not stable across
  * re-evaluations.
  */
object PrefixSum {

  /** Adds `out` = EXCLUSIVE prefix sum of `weight` in ascending `key`
    * order (the first row gets 0). `key` must be unique; `weight` is
    * summed as LONG. */
  def exclusive(df: DataFrame, key: String, weight: Column,
      out: String): DataFrame = {
    val s = df.sparkSession
    val parts = Checkpoint.truncate(s,
      df.withColumn("__w", weight.cast("long"))
        .repartitionByRange(col(key))
        .withColumn("__pid", spark_partition_id()))
    val offs = parts.groupBy("__pid").agg(sum("__w").as("__t"))
      .withColumn("__off", coalesce(
        sum("__t").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    parts.join(broadcast(offs), Seq("__pid"))
      .withColumn(out,
        col("__off") + coalesce(
          sum("__w").over(Window.partitionBy("__pid").orderBy(col(key))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__pid", "__off", "__w")
  }
}
