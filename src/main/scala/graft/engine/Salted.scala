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
