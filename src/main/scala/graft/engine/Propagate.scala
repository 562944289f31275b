package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two generic propagation kernels over a functional graph / DAG,
  * completing the iterative family beside [[Expand]] (unweighted
  * frontier), [[MinPlus]] (weighted shortest path), [[Components]]
  * (min-label closure) and [[PageRank]] (normalized mass):
  *
  *  - [[sumRounds]]: synchronous in-flow accumulation
  *    `a'(v) = 1 + sum over in-edges (u,v) of a(u)` — after k rounds
  *    `a(v)` counts the directed PATHS into v of length <= k (v's empty
  *    path included). On a FUNCTIONAL graph (<= 1 out-edge per node,
  *    e.g. D8 drainage) paths and upstream nodes coincide, so on a
  *    functional DAG of depth <= k this is the full upstream-cell
  *    count (raster flow accumulation); on a general DAG a node
  *    reaching v by several routes is counted once per route. Integer
  *    sums are order-free under any partitioning, so k rounds are
  *    bit-reproducible.
  *
  *  - [[pointerDouble]]: path doubling `p'(v) = p(p(v))` — after k
  *    rounds every node points 2^k steps along its pointer chain, so a
  *    chain of depth D resolves to its terminal (a fixpoint node,
  *    `p(t) = t`) in ceil(log2 D) rounds instead of D. This is the
  *    at-scale shape for follow-the-chain queries (watershed basins,
  *    union-find halving, linked-list ranking): O(log D) shuffles
  *    total, vs one shuffle per hop for naive iteration.
  *
  * Both kernels truncate lineage every other round
  * ([[Checkpoint.truncate]] — which also re-leafs the frame so
  * inherited size stats cannot compound across rounds).
  */
object Propagate {

  /** @param nodes one row per node: `(node: long)`
    * @param edges directed edges `(src: long, dst: long)`; in-flows
    *              sum over all in-edges — callers wanting upstream
    *              NODE counts need a functional graph (see scaladoc)
    * @return `(node, acc)` after `rounds` synchronous accumulations,
    *         `acc = 1` where nothing flows in */
  def sumRounds(s: SparkSession, nodes: DataFrame, edges: DataFrame,
                rounds: Int): DataFrame = {
    var acc = nodes.select(col("node"), lit(1L).as("acc"))
    // the union-fold below has no per-round join back onto the node
    // spine, so edges pointing OUTSIDE the node set would leak rows
    // (without the +1 base) into the output — restrict once, up front;
    // the one-shot truncation keeps the restricted list a LEAF so the
    // semi-join is planned once, not inside every round's lineage
    val es = Checkpoint.truncateOnce(s,
      edges.join(nodes, edges("dst") === nodes("node"), "left_semi"))
    for (r <- 1 to rounds) {
      // a'(v) = 1 + sum of in-flows, computed as ONE aggregation over
      // the union of the per-node base (1) and the propagated terms —
      // no per-round left join back onto the node spine, so each round
      // is a single partial-aggregated exchange (the edge join
      // broadcasts or co-partitions; it adds no exchange of acc itself)
      val contrib = acc.join(es, col("node") === col("src"))
        .select(col("dst").as("node"), col("acc"))
      val next = nodes.select(col("node"), lit(1L).as("acc"))
        .unionByName(contrib)
        .groupBy("node").agg(sum("acc").as("acc"))
      acc = if (r % 2 == 0 || r == rounds) Checkpoint.truncate(s, next)
            else next
    }
    acc
  }

  /** @param ptr0 one row per node: `(node: long, p: long)` with
    *             terminals self-pointing (`p = node`)
    * @return `(node, p)` after `rounds` doublings — p is the node
    *         2^rounds steps down the chain (the terminal, once the
    *         chain is exhausted) */
  def pointerDouble(s: SparkSession, ptr0: DataFrame,
                    rounds: Int): DataFrame = {
    var ptr = ptr0
    for (r <- 1 to rounds) {
      val hop = ptr.select(col("node").as("p"), col("p").as("pp"))
      val next = ptr.join(hop, Seq("p"))
        .select(col("node"), col("pp").as("p"))
      ptr = if (r % 2 == 0 || r == rounds) Checkpoint.truncate(s, next)
            else next
    }
    ptr
  }
}
