package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed stable contiguous row ids (SURVEY.md §2.3 P10, the
  * reference's `1:nrow(df)` id columns, R:192-196) WITHOUT the
  * single-partition global window: range-partition by the (unique)
  * order key, count rows per partition, prefix-sum the tiny per-
  * partition count table into offsets, and add a within-partition
  * row_number — exactly the global rank, computed with per-partition
  * parallelism. The classic two-phase zipWithIndex, kept in the
  * DataFrame API.
  *
  * The range-partitioned frame is materialized ONCE before both reads:
  * RangePartitioner samples its bounds with a seed derived from the
  * RDD id, so two separate evaluations could pick different bounds and
  * the offsets would describe a different layout than the joined rows.
  */
object StableRowId {

  /** @param key unique ordering column; ids are 1-based LONGS in key
    *            order (an int id would silently wrap past 2^31 rows —
    *            this utility exists precisely for frames that big) */
  def assign(df: DataFrame, key: String, out: String): DataFrame = {
    val s = df.sparkSession
    val parts = Checkpoint.truncate(s,
      df.repartitionByRange(col(key)).withColumn("__pid", spark_partition_id()))
    // one row per partition — the prefix-sum window is over ~hundreds of
    // rows, not the data
    val offs = parts.groupBy("__pid").count()
      .withColumn("__off", coalesce(
        sum("count").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    parts.join(broadcast(offs), Seq("__pid"))
      .withColumn(out,
        (col("__off") + row_number().over(
          Window.partitionBy("__pid").orderBy(col(key)))).cast("long"))
      .drop("__pid", "__off")
  }
}
