package graft.engine

import org.apache.spark.sql.DataFrame
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
  * The global rank is the one-group case of the per-group rank, so
  * this delegates to [[GroupRank]] over a constant group column —
  * ONE shared two-phase core, so the subtle invariants (materialize
  * the range-partitioned frame ONCE because RangePartitioner's bounds
  * seed derives from the RDD id; unique-key contract) live in exactly
  * one place.
  */
object StableRowId {

  private val GrpCol = "__srid_grp"

  /** @param key unique ordering column; ids are 1-based LONGS in key
    *            order (an int id would silently wrap past 2^31 rows —
    *            this utility exists precisely for frames that big) */
  def assign(df: DataFrame, key: String, out: String): DataFrame = {
    require(!df.columns.contains(GrpCol), s"column $GrpCol is reserved")
    GroupRank.assign(df.withColumn(GrpCol, lit(0)), GrpCol, Seq(key), out)
      .drop(GrpCol)
  }
}
