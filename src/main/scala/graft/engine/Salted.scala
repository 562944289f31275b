package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-salted aggregation (north_rule: "partitioning / shuffle
  * / skew handled explicitly"). Tropical-forest hotspots concentrate the
  * loss-bearing cells of the reference workload into a few coarse
  * spatial keys; a single-level groupBy lands each hot key on one
  * reducer. This utility runs the standard two-level rewrite:
  *
  *   1. partial aggregate on (keys..., salt) — a hot key's rows are
  *      spread across `salts` reducers, each emitting one partial row;
  *   2. final aggregate on keys merging the partials (count merges by
  *      sum; sum/min/max are idempotent under re-aggregation).
  *
  * Only decomposable aggregates are accepted (sum/count/min/max; avg =
  * sum + count at the call site). The salt source must be a
  * deterministic per-row column (e.g. the cell id) so task retries
  * salt identically.
  */
object Salted {

  /** One aggregate column: `fn` over `in`, emitted as `out`. */
  final case class Agg(out: String, fn: String, in: Column) {
    require(Set("sum", "count", "min", "max")(fn), s"non-decomposable: $fn")
    def partial: Column = (fn match {
      case "sum" => sum(in)
      case "count" => count(in)
      case "min" => min(in)
      case "max" => max(in)
    }).as(out)
    /** Merge of partials: counts add; the rest re-apply. */
    def merge: Column = (fn match {
      case "sum" | "count" => sum(col(out))
      case "min" => min(col(out))
      case "max" => max(col(out))
    }).as(out)
  }

  /** Inner equi-join on `keys` with explicit hot-key salting — the
    * scale-safe shape for bucket self-joins (LSH bands, IVF cells,
    * signature pairs) whose bucket population is skewed. NEVER
    * broadcasts a data side: both sides shuffle on the bucket key, and
    * keys whose right-side count exceeds `hotThreshold` take a salted
    * path (left row keeps its one deterministic salt; right rows are
    * replicated to all `salts` buckets), so a hot bucket's O(k²) pair
    * explosion is spread over `salts` reducers instead of one task.
    *
    * The only broadcast is the HOT-KEY LIST, which is tiny by
    * construction (at most |right| / hotThreshold keys). Each (l, r)
    * pair is produced exactly once: on the salted path the pair matches
    * only at the left row's own salt value. Sides must not share
    * non-key column names (rename before joining, as a self-join does
    * anyway). MERGE hints pin shuffled sort-merge joins so a size
    * under-estimate can never re-introduce a full-table broadcast.
    *
    * @param leftSalt deterministic per-row integral column of the LEFT
    *                 side (e.g. its id) so task retries salt identically
    */
  def skewJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftSalt: Column, salts: Int, hotThreshold: Long): DataFrame = {
    require(salts > 0 && hotThreshold > 0)
    val hot = right.groupBy(keys.map(col): _*).count()
      .filter(col("count") > hotThreshold)
      .select(keys.map(col): _*)
    val lCold = left.join(broadcast(hot), keys, "left_anti")
    val rCold = right.join(broadcast(hot), keys, "left_anti")
    val lHot = left.join(broadcast(hot), keys, "left_semi")
      .withColumn("__salt", pmod(leftSalt.cast("long"), lit(salts.toLong)))
    val rHot = right.join(broadcast(hot), keys, "left_semi")
      .withColumn("__salt",
        explode(sequence(lit(0L), lit(salts.toLong - 1))))
    val cold = lCold.hint("merge").join(rCold, keys)
    val hotJ = lHot.hint("merge").join(rHot, keys :+ "__salt")
      .drop("__salt")
    cold.unionByName(hotJ)
  }

  /** @param keys    (outputName, expression) grouping keys
    * @param saltSrc deterministic per-row integral column
    * @param salts   number of salt buckets a hot key is spread over */
  def aggregate(df: DataFrame, keys: Seq[(String, Column)], saltSrc: Column,
      salts: Int, aggs: Seq[Agg]): DataFrame = {
    require(aggs.nonEmpty && salts > 0)
    // Internal key names during the two aggregation levels so an output
    // name that shadows an input column is never ambiguous.
    val tmp = keys.zipWithIndex.map { case ((n, c), i) =>
      (s"__key_$i", n, c)
    }
    val keyed = df.select(
      (col("*") +: tmp.map { case (t, _, c) => c.as(t) }) :+
        pmod(saltSrc, lit(salts)).as("__salt"): _*)
    val agged = keyed
      .groupBy((tmp.map(_._1) :+ "__salt").map(col): _*)
      .agg(aggs.head.partial, aggs.tail.map(_.partial): _*)
      .groupBy(tmp.map(_._1).map(col): _*)
      .agg(aggs.head.merge, aggs.tail.map(_.merge): _*)
    tmp.foldLeft(agged) { case (d, (t, n, _)) => d.withColumnRenamed(t, n) }
  }
}
