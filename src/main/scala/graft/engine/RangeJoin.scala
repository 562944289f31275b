package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INTERVAL (range) JOIN — the non-equi join Spark has no native
  * operator for: `point BETWEEN lo AND hi`. Expressed naively,
  * Catalyst can only plan a BroadcastNestedLoopJoin (or a cartesian
  * product): O(|points| x |intervals|) predicate evaluations plus a
  * full broadcast of one side — fine for a dim-sized side, fatal when
  * both sides are large.
  *
  * Banded rewrite (the standard interval-index trick — IP-range
  * lookups, genomic overlap joins): pick a bucket width B, give every
  * point its bucket floor(p/B), replicate every interval to each
  * bucket it overlaps ((hi-lo)/B + 1 rows), EQUI-join on the bucket
  * id, then re-check the exact predicate. Every true pair is emitted
  * exactly once with no dedup pass: a point lives in exactly one
  * bucket, and a matching interval always covers that bucket
  * (lo <= p <= hi implies floor(lo/B) <= floor(p/B) <= floor(hi/B)).
  *
  * Scale shape: the join becomes a plain equi hash/merge join on the
  * bucket key — both sides shuffle-partition by bucket, nothing big is
  * broadcast, nothing quadratic. Replication factor is bounded by
  * max_interval_len/B + 1, so pick B near the median interval length;
  * a hot value range (skewed bucket) salts like any equi join
  * (engine/Salted). The exact filter runs once per candidate pair,
  * and candidates per point are the intervals sharing its bucket —
  * local density, not global size.
  */
object RangeJoin {

  /** Join `points` to `intervals` on points(pCol) in
    * [intervals(loCol), intervals(hiCol)], both bounds inclusive.
    * Column names must be disjoint between the two frames (the result
    * carries all of them). Bounds and point may be any numeric type;
    * bucket arithmetic is done in double (exact for the integer-valued
    * and decimal(15,2)-valued domains the engine carries). */
  def bandedIntervalJoin(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucket width must be positive")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"point/interval column names must be disjoint, both carry: " +
        overlap.mkString(", "))
    val b = lit(bucketWidth)
    val pts = points.withColumn("__bucket",
      floor(col(pCol) / b).cast("long"))
    val ivs = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / b).cast("long"),
        floor(col(hiCol) / b).cast("long"))))
    pts.join(ivs, "__bucket")
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bucket")
  }
}
