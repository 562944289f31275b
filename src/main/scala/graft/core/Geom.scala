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

  /** Even-odd crossing test: ray from (px,py) toward +x. Edges whose y
    * span straddles py (half-open: y1 > py != y2 > py, so vertices touch
    * exactly one of their two edges) count when the intersection x
    * exceeds px. Boundary behavior follows the strict inequalities —
    * test fixtures keep query points off edges/vertices. */
  def contains(px: Double, py: Double): Boolean = {
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
