package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D rectangle-intersection join via grid binning — the spatial
  * partitioning pattern (PBSM, Patel & DeWitt SIGMOD'96) that turns an
  * all-pairs geometric predicate into an EQUI join Spark can shuffle:
  *
  *   1. bin each rectangle to every `cell`-sized grid cell its box
  *      overlaps (a narrow Generate — no shuffle; replication factor
  *      is (w/cell+1)*(h/cell+1), bounded and stated by the caller);
  *   2. equi-join the two layers on the cell key — ONE hash exchange
  *      per side, the only shuffles in the whole operator;
  *   3. keep pairs whose boxes truly intersect (closed intervals);
  *   4. REFERENCE-POINT dedup: a pair overlapping k shared cells would
  *      surface k times, and the naive fix (`distinct`) is a THIRD
  *      full-width shuffle. Instead each candidate is kept only in the
  *      cell containing the intersection's min corner
  *      (greatest(axmin,bxmin), greatest(aymin,bymin)) — a corner that
  *      lies inside both boxes, so it is always among the shared cells:
  *      every true pair is emitted EXACTLY once, for free, in the
  *      join's own filter.
  *
  * This is the 2-D sibling of RangeJoin.bandedIntervalJoin (q80): same
  * replicate-to-buckets idea, plus the reference-point trick that 1-D
  * bands don't need (there the bucket of the point side is unique).
  * At 100 TB both sides stream through a shuffled hash/SMJ on a key
  * whose cardinality the caller controls via `cell`; skewed cells
  * (urban hotspots) can ride the same Salted helper as any hot equi
  * key. The naive plan — a BroadcastNestedLoopJoin over the raw
  * BETWEEN conjunction — cannot survive two large sides.
  *
  * Inputs carry (idCol, xmin, ymin, xmax, ymax); integer coordinates,
  * closed-interval semantics (touching boxes DO intersect, matching
  * raster pixel-extent footprints).
  */
object BboxJoin {

  /** All intersecting (left, right) pairs, each exactly once.
    * Output: leftId, rightId + both boxes' corners (prefixed a_/b_). */
  def join(left: DataFrame, leftId: String, right: DataFrame,
      rightId: String, cell: Long): DataFrame = {
    def binned(df: DataFrame, id: String, p: String): DataFrame =
      df.select(col(id), col("xmin").as(s"${p}xmin"),
          col("ymin").as(s"${p}ymin"), col("xmax").as(s"${p}xmax"),
          col("ymax").as(s"${p}ymax"))
        // `div`, not `/`: Column./ is DOUBLE division — exact only to
        // 2^53, and these are the join keys
        .withColumn("cx", explode(sequence(
          expr(s"${p}xmin div $cell"), expr(s"${p}xmax div $cell"))))
        .withColumn("cy", explode(sequence(
          expr(s"${p}ymin div $cell"), expr(s"${p}ymax div $cell"))))
    val a = binned(left, leftId, "a_")
    val b = binned(right, rightId, "b_")
    a.join(b, Seq("cx", "cy"))
      .filter(
        col("a_xmin") <= col("b_xmax") && col("b_xmin") <= col("a_xmax") &&
        col("a_ymin") <= col("b_ymax") && col("b_ymin") <= col("a_ymax") &&
        // reference point: intersection's min corner owns the pair
        expr(s"greatest(a_xmin, b_xmin) div $cell") === col("cx") &&
        expr(s"greatest(a_ymin, b_ymin) div $cell") === col("cy"))
      .drop("cx", "cy")
  }
}
