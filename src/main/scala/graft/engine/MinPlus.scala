package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synchronous min-plus (Bellman-Ford) relaxation — the weighted
  * companion of the unweighted frontier expansion in [[Expand]] and the
  * fourth graph kernel beside [[Components]], [[PageRank]] and
  * [[Triangles]]. One round computes, for every node,
  * `d'(v) = min(d(v), min over in-edges (u,v,w) of d(u) + w)` —
  * exactly the cost-distance / multi-source-shortest-path step a raster
  * GIS runs to build travel-cost surfaces.
  *
  * Determinism: distances and weights are INTEGERS with an integer
  * `inf` sentinel instead of NULL-as-unreached — `min` over integers is
  * order-free under any partitioning and the sentinel survives
  * arithmetic (`inf + maxW` still compares above every real distance,
  * callers keep `inf` far below Long.MaxValue), so k rounds are
  * bit-reproducible in any engine with the same join/group semantics.
  *
  * Shape per round (the PageRank contract): distances join edges on the
  * source key, propagate `d + w` to the destination, partial-aggregated
  * groupBy(dst) MIN, then a left join folds the proposals back into the
  * running frame. Lineage is truncated every other round
  * ([[Checkpoint.truncate]]) so k rounds never re-plan a k-deep tree.
  */
object MinPlus {

  /** @param dist0  initial frame `(node: long, d: long)` — 0 at
    *               sources, `inf` elsewhere; one row per node
    * @param edges  directed weighted edges `(src: long, dst: long,
    *               w: long)`, weights non-negative
    * @param rounds fixed synchronous round count (a convergence caller
    *               adds the q56 accumulator probe)
    * @param inf    integer unreached sentinel, `>=` any real distance
    *               plus `rounds * max(w)`
    * @return `(node, d)` after `rounds` relaxations */
  def relax(s: SparkSession, dist0: DataFrame, edges: DataFrame,
            rounds: Int, inf: Long): DataFrame = {
    var dist = dist0
    for (r <- 1 to rounds) {
      val prop = dist.join(edges, col("node") === col("src"))
        .select(col("dst"), (col("d") + col("w")).as("nd"))
        .groupBy(col("dst").as("node")).agg(min("nd").as("nd"))
      val next = dist.join(prop, Seq("node"), "left")
        .select(col("node"),
          least(col("d"), coalesce(col("nd"), lit(inf))).as("d"))
      dist = if (r % 2 == 0 || r == rounds) Checkpoint.truncate(s, next)
             else next
    }
    dist
  }
}
