package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by DEGREE-ORDERED edge orientation —
  * the third member of the graph family (connected components
  * [[Components]], PageRank [[PageRank]]): triangle participation is
  * the local clustering signal a dedup/link-analysis pipeline reads to
  * separate organic neighborhoods from spam cliques.
  *
  * Why orientation matters at scale: the naive wedge join (edges ⋈
  * edges on a shared endpoint) enumerates Σ_v deg(v)² wedges — a single
  * celebrity node with 10^6 neighbors contributes 10^12 wedges on its
  * own. Orienting every edge from its (degree, id)-SMALLER endpoint to
  * the larger (the classic Ortmann/Brandes "degree ordering") caps
  * every out-degree at O(√E), so the wedge count is bounded by
  * Σ outdeg(v)² ≤ E^1.5 REGARDLESS of skew, each triangle is
  * enumerated at exactly one vertex (its order-minimum), and the
  * closing-edge probe is an equi join on the oriented pair. All three
  * steps are shuffles on vertex/pair keys — no driver-side adjacency.
  */
object Triangles {

  /** Per-node triangle participation counts.
    *
    * @param edges canonical undirected edge frame `(u, v)` with
    *              `u < v`, distinct, self-loop-free
    * @param nodes full vertex frame `(node)` — isolated and
    *              triangle-free vertices return `tri_cnt = 0`
    * @return `(node, tri_cnt)`, one row per input vertex */
  def perNode(edges: DataFrame, nodes: DataFrame): DataFrame = {
    // undirected degree: one inline explode over the canonical frame
    // (the Components fan-out idiom — reads the edge pipeline once)
    val deg = edges
      .select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))

    // total order (deg, id): orient each edge small -> large; keep the
    // destination's order key so wedges can be ordered without a
    // second degree join
    val uLeads = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = edges
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(uLeads, col("u")).otherwise(col("v")).as("src"),
        when(uLeads, col("v")).otherwise(col("u")).as("dst"),
        when(uLeads, col("dv")).otherwise(col("du")).as("ddst"))

    // wedges at the order-minimum vertex: out-neighbor pairs (b, c)
    // with b strictly before c in (deg, id) order — each unordered
    // pair once
    val o1 = oriented.select(col("src"), col("dst").as("b"),
      col("ddst").as("db"))
    val o2 = oriented.select(col("src"), col("dst").as("c"),
      col("ddst").as("dc"))
    val wedges = o1.join(o2, Seq("src"))
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))

    // close: b precedes c in the total order, so the closing edge, if
    // present, is oriented exactly b -> c — one equi join on the pair
    val tris = wedges.join(
      oriented.select(col("src").as("b"), col("dst").as("c")),
      Seq("b", "c"))
      .select(col("src").as("a"), col("b"), col("c"))

    // participation: every triangle credits all three vertices
    val counts = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))
    nodes.join(counts, Seq("node"), "left")
      .select(col("node"), coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"))
  }
}
