package graft.engine

import org.apache.spark.sql.{Column, DataFrame}

/** Space-filling-curve data layout for the write path — the mechanism
  * behind "ZORDER BY" table maintenance: rows whose (x, y) are close
  * in space land in the same or adjacent files, so a reader's bbox
  * predicate prunes whole files on parquet min/max stats instead of
  * scanning the full table. At 100 TB the layout IS the index: a
  * query touching one region reads the few files whose z-range
  * intersects it, everything else is skipped at planning time.
  *
  * Two curve choices, one mechanism:
  *  - [[zInterleave]] (Morton) for generic integer (x, y) — bit
  *    interleave, integer-exact, SQL-reproducible (q87's oracle);
  *  - the S2 cell id (core/S2Lite — a Hilbert curve) for lat/lng
  *    data, which avoids Morton's diagonal seams; `clusterBy` accepts
  *    either key since both are plain long columns.
  *
  * The cluster step is declarative Spark: `repartitionByRange` on the
  * curve key gives globally disjoint per-file key ranges (the property
  * min/max pruning needs), `sortWithinPartitions` tightens each file's
  * stats. RangePartitioner samples boundaries, so FILE ASSIGNMENT is
  * not bit-deterministic across cluster sizes — the layout CONTRACT
  * (disjoint, sorted ranges) is, and that is what LayoutSpec asserts;
  * q87 therefore oracles the deterministic curve math and fixed-width
  * z-range bucket stats, not sampled file boundaries.
  */
object Layout {

  /** Spread the low 32 bits of v to the even bit positions. */
  @inline def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton z-value of (x, y), both in [0, 2^32): x on even bits,
    * y on odd. */
  @inline def zInterleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  /** Even (x) half of a z-value — inverse of [[spread]]. */
  @inline def compact(z: Long): Long = {
    var x = z & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >>> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >>> 8)) & 0x0000FFFF0000FFFFL
    (x | (x >>> 16)) & 0xFFFFFFFFL
  }

  /** (x, y) back out of a z-value. */
  def zDeinterleave(z: Long): (Long, Long) =
    (compact(z), compact(z >>> 1))

  /** Range-cluster `df` into `n` write partitions by an SFC key:
    * disjoint per-file key ranges + within-file sort = tight parquet
    * min/max stats. One shuffle (the range exchange); the sort is
    * partition-local. */
  def clusterBy(df: DataFrame, curveKey: Column, n: Int): DataFrame =
    df.repartitionByRange(n, curveKey).sortWithinPartitions(curveKey)

  /** The OTHER table-layout lever: hash-bucketed, bucket-sorted
    * persistence. Two tables bucketed by their join key with the same
    * bucket count join with NO exchange and (bucket-sorted) no sort —
    * the shuffle is paid once at write time and amortized over every
    * subsequent join, the co-location story a 100 TB fact table
    * standardizes on. Catalog metadata (bucket spec) lives in the
    * session catalog; the parquet files live at `path`, so data
    * placement is explicit and survives the session. Registered
    * (overwritten) idempotently. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }
}
