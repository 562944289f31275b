package graft.core

/** Planar polygon with packed vertex arrays and even-odd ray-cast
  * point-in-polygon, the engine's spatial-join primitive (SURVEY.md §2.8
  * G3; the reference ships the result precomputed as
  * `GoodeR_Boundaries_Region.csv`, `Supplemental_Data_1.R:112`, with the
  * source polygons only appearing in the commented KML block R:884-912).
  *
  * Packed arrays (not object graphs) so a broadcast of all region
  * polygons is a handful of primitive arrays, cheap to serialize and
  * cache-friendly inside an Expression eval loop.
  */
final case class Polygon(regionId: Int, xs: Array[Double], ys: Array[Double]) {
  require(xs.length == ys.length && xs.length >= 3, "need >= 3 vertices")

  val (minX, maxX) = (xs.min, xs.max)
  val (minY, maxY) = (ys.min, ys.max)

  /** Banded y-interval edge index (CSR layout): edges bucketed by the
    * horizontal bands their y-span overlaps, so a point test touches
    * only the O(edges / bands) edges that can straddle its y — the
    * structure a production polygon layer (continental boundaries run
    * to thousands of vertices) needs; the linear scan is O(edges) per
    * point. @transient lazy: rebuilt after deserialization on each
    * executor in microseconds, never shipped. Only edges with
    * min(y1,y2) <= py < max(y1,y2) can satisfy the straddle test, and
    * each edge is indexed into every band overlapping [min, max], so
    * the banded walk applies the IDENTICAL arithmetic to a superset of
    * the straddling edges — results are bit-equal to the linear scan
    * (property-tested, including band-boundary ys). */
  @transient private lazy val bands: (Int, Double, Array[Int], Array[Int]) = {
    val n = xs.length
    val nBands = math.max(1, math.min(256, n))
    val bandH = (maxY - minY) / nBands
    def bandOf(y: Double): Int =
      if (bandH <= 0) 0
      else math.min(nBands - 1, math.max(0, ((y - minY) / bandH).toInt))
    val counts = new Array[Int](nBands + 1)
    var j = n - 1
    var i = 0
    while (i < n) {
      val lo = bandOf(math.min(ys(j), ys(i)))
      val hi = bandOf(math.max(ys(j), ys(i)))
      var b = lo
      while (b <= hi) { counts(b + 1) += 1; b += 1 }
      j = i; i += 1
    }
    var b = 0
    while (b < nBands) { counts(b + 1) += counts(b); b += 1 }
    val offsets = counts.clone()
    val edges = new Array[Int](counts(nBands))
    val fill = counts.clone()
    j = n - 1; i = 0
    while (i < n) {
      val lo = bandOf(math.min(ys(j), ys(i)))
      val hi = bandOf(math.max(ys(j), ys(i)))
      var b2 = lo
      while (b2 <= hi) { edges(fill(b2)) = i; fill(b2) += 1; b2 += 1 }
      j = i; i += 1
    }
    (nBands, bandH, offsets, edges)
  }

  /** Even-odd crossing test: ray from (px,py) toward +x. Edges whose y
    * span straddles py (half-open: y1 > py != y2 > py, so vertices touch
    * exactly one of their two edges) count when the intersection x
    * exceeds px. Boundary behavior follows the strict inequalities —
    * test fixtures keep query points off edges/vertices. Walks only the
    * point's y-band of the edge index. */
  def contains(px: Double, py: Double): Boolean = {
    if (px < minX || px > maxX || py < minY || py > maxY) return false
    val (nBands, bandH, offsets, edges) = bands
    val b =
      if (bandH <= 0) 0
      else math.min(nBands - 1, math.max(0, ((py - minY) / bandH).toInt))
    var inside = false
    var k = offsets(b)
    val end = offsets(b + 1)
    val n = xs.length
    while (k < end) {
      val i = edges(k)
      val j = if (i == 0) n - 1 else i - 1
      val y1 = ys(j); val y2 = ys(i)
      if ((y1 > py) != (y2 > py)) {
        val x1 = xs(j); val x2 = xs(i)
        val xInt = x1 + (x2 - x1) * (py - y1) / (y2 - y1)
        if (px < xInt) inside = !inside
      }
      k += 1
    }
    inside
  }

  /** The unindexed O(edges) scan — the reference implementation the
    * banded index is property-tested against. */
  def containsLinear(px: Double, py: Double): Boolean = {
    if (px < minX || px > maxX || py < minY || py > maxY) return false
    var inside = false
    val n = xs.length
    var i = 0
    var j = n - 1
    while (i < n) {
      val y1 = ys(j); val y2 = ys(i)
      if ((y1 > py) != (y2 > py)) {
        val x1 = xs(j); val x2 = xs(i)
        val xInt = x1 + (x2 - x1) * (py - y1) / (y2 - y1)
        if (px < xInt) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }
}

object Geom {
  /** Region of a point among broadcast polygons; ties (overlaps) resolve
    * to the lowest region id; -1 when in no polygon (the reference then
    * drops the row: `filter(!is.na(Region))`, R:273-274). */
  def regionOf(polys: Array[Polygon], px: Double, py: Double): Int = {
    var best = -1
    var i = 0
    while (i < polys.length) {
      val p = polys(i)
      if ((best == -1 || p.regionId < best) && p.contains(px, py))
        best = p.regionId
      i += 1
    }
    best
  }
}
