package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over integer points — the learned-
  * clustering engine op behind data-curation pipelines (topic bucketing,
  * codebook fitting; the IVF codebook in queries/TextOps fits the same
  * way but per-query). Scale shape: centroids always fit the driver
  * (K·d longs), so each round is ONE pass over the point frame — the
  * argmin rides a codegen when-chain of centroid LITERALS inside the
  * partial aggregation, and only K aggregate rows cross the wire. No
  * per-round shuffle of the points, no crossJoin, no broadcast frame.
  *
  * Exactness discipline (the q112/q129 whole-unit rule): centroids are
  * QUANTIZED to the integer grid each update — `floor(sum/count)`, both
  * engines in int64 — so distances stay integer, the argmin tie-breaks
  * to the lowest centroid id identically everywhere, and a DuckDB
  * oracle that unrolls the same rounds as chained CTEs agrees
  * bit-for-bit, converged or not (the fixed round count is the operator
  * contract, like Propagate's). The quantization is sound when cluster
  * separation is large against 1 grid unit — callers scale coordinates
  * so it is.
  */
object KMeans {

  /** One fitted round: assignment under `cents` + integer re-centering.
    * Empty clusters keep their previous centroid (both engines). */
  def fit(pts: DataFrame, cents: Seq[(Int, Long, Long)], rounds: Int)
  : Seq[(Int, Long, Long)] = {
    var cs = cents
    for (_ <- 1 to rounds) {
      val agg = pts.groupBy(assign(cs).as("k"))
        .agg(sum("px").as("sx"), sum("py").as("sy"), count("*").as("n"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      cs = cs.map { case (k, cx, cy) =>
        agg.get(k) match {
          case Some((sx, sy, n)) => (k, sx / n, sy / n)
          case None              => (k, cx, cy)
        }
      }
    }
    cs
  }

  /** Codegen argmin over centroid literals; ascending-id when-chain on
    * the exact integer minimum breaks ties to the lowest centroid id. */
  def assign(cents: Seq[(Int, Long, Long)]): Column = {
    def d2(cx: Long, cy: Long): Column =
      (col("px") - cx) * (col("px") - cx) +
        (col("py") - cy) * (col("py") - cy)
    val best = least(cents.map { case (_, cx, cy) => d2(cx, cy) }: _*)
    cents.tail.foldLeft(when(d2(cents.head._2, cents.head._3) === best,
      cents.head._1)) { case (c, (k, cx, cy)) =>
      c.when(d2(cx, cy) === best, k)
    }.cast("int")
  }
}
