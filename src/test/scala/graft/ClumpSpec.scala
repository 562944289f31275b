package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.world.World

/** Independent (non-SQL) anchors for q140 (hierarchical patch clump)
  * and q141 (hillshade). The clump is recomputed by a plain-Scala FLAT
  * flood fill (no tiles, no union-find sharing with the engine), so the
  * two-level decomposition is pinned against a single-level reference
  * from a direction the DuckDB oracle (recursive CTE) does not share;
  * fixture-shape assertions prove the hierarchy is actually exercised
  * (cross-tile merges, multi-tile chains, interior-only fragments).
  * Hillshade is recomputed scalar-side with the same operation order
  * and compared BIT-EXACTLY — the float-determinism contract the query
  * comment claims.
  */
class ClumpSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-clump-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val spec = World.tiny
  private val C = spec.cols
  private val R = spec.rows
  private val N = spec.nCells.toInt
  private val T = spec.tile
  private val TX = spec.tilesX

  /** The q140 class field: the q131 iso surface (terrain + roughness)
    * thresholded at its midpoint, regenerated scalar-side. */
  private def cls(id: Long): Int = {
    val B = 8; val cxN = C / B + 1
    def corner(cx: Long, cy: Long): Long =
      World.h2((cy * cxN + cx) * 53 + 11) % 4000
    val x = (id - 1) % C; val y = (id - 1) / C
    val (cx, fx) = (x / B, x % B); val (cy, fy) = (y / B, y % B)
    val elev = (B - fx) * (B - fy) * corner(cx, cy) +
      fx * (B - fy) * corner(cx + 1, cy) +
      (B - fx) * fy * corner(cx, cy + 1) + fx * fy * corner(cx + 1, cy + 1)
    if (elev + World.h2(id * 29 + 5) % 40000 > 148000L) 1 else 0
  }

  /** Flat scalar flood fill: cell -> patch (min reachable cell id). */
  private def scalarPatches: Array[Long] = {
    val patch = Array.fill[Long](N + 1)(0L)
    var id = 1
    while (id <= N) {
      if (patch(id) == 0L) {
        // BFS from the smallest unvisited cell: every cell reached is
        // labeled with this root, which is the component minimum
        // because ids are visited in ascending order
        val q = scala.collection.mutable.Queue(id.toLong)
        patch(id) = id.toLong
        while (q.nonEmpty) {
          val c = q.dequeue()
          val x = (c - 1) % C; val y = (c - 1) / C
          Seq((x > 0, c - 1), (x < C - 1, c + 1),
            (y > 0, c - C), (y < R - 1, c + C)).foreach {
            case (ok, nb) =>
              if (ok && patch(nb.toInt) == 0L && cls(nb) == cls(c)) {
                patch(nb.toInt) = id.toLong
                q.enqueue(nb)
              }
          }
        }
      }
      id += 1
    }
    patch
  }

  private def tileOf(id: Long): Long = {
    val x = (id - 1) % C; val y = (id - 1) / C
    (y / T) * TX + x / T
  }

  test("q140 patch clump equals a flat scalar flood fill") {
    val patch = scalarPatches
    val expected = (1L to N.toLong).groupBy(id => patch(id.toInt)).toSeq
      .map { case (p, cells) => (p, cls(p), cells.size.toLong) }
      .sortBy(_._1)
    val got = SparkEntry.queries("q140_patch_clump")(spark, "unused")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("q140 fixture exercises the two-level hierarchy") {
    val patch = scalarPatches
    val tilesByPatch = (1L to N.toLong).groupBy(id => patch(id.toInt))
      .map { case (p, cells) => p -> cells.map(tileOf).toSet }
    // cross-tile merges happen (level 2 has real edges)
    assert(tilesByPatch.values.count(_.size >= 2) >= 10,
      "fixture degenerate: almost no patch crosses a tile border")
    // some chain spans 3+ tiles, so min-label propagation needs >1 round
    assert(tilesByPatch.values.exists(_.size >= 3),
      "fixture degenerate: no multi-tile chain")
    // interior-only fragments exist (the coalesce re-attach path)
    assert(tilesByPatch.values.count(_.size == 1) >= 10,
      "fixture degenerate: every patch crosses tiles")
  }

  test("ClumpLocal labels a sparse tile correctly") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    // 4x4 tile, pixels {0,1,4,6,7,10,15}: classes chosen so
    // {0,1} join (same class, adjacent), {6,7} join, {10} joins {6,7}
    // vertically, {4} is adjacent to 0 but class-blocked, {15} isolated
    val pixs = Array(0, 1, 4, 6, 7, 10, 15)
    val clss = Array(1, 1, 2, 3, 3, 3, 1)
    val out = graft.sql.ClumpLocal.eval(
      ArrayData.toArrayData(pixs), ArrayData.toArrayData(clss), 4)
    val loc = (0 until out.numElements()).map { i =>
      val v = out.getLong(i); ((v >> 20).toInt, (v & 0xFFFFF).toInt)
    }.toMap
    assert(loc == Map(0 -> 0, 1 -> 0, 4 -> 4, 6 -> 6, 7 -> 6, 10 -> 6,
      15 -> 15))
  }

  test("q142 morphological opening equals the scalar replica; " +
    "opening is contained in the mask and removes speckles") {
    def inInterior(id: Long): Boolean = {
      val x = (id - 1) % C; val y = (id - 1) / C
      x >= 1 && x <= C - 2 && y >= 1 && y <= R - 2
    }
    def er(id: Long): Int =
      if (inInterior(id) && cls(id) == 1 && cls(id + 1) == 1 &&
        cls(id - 1) == 1 && cls(id + C) == 1 && cls(id - C) == 1) 1 else 0
    def opened(id: Long): Int = {
      val x = (id - 1) % C; val y = (id - 1) / C
      val nbrs = Seq(id) ++ (if (x > 0) Seq(id - 1) else Nil) ++
        (if (x < C - 1) Seq(id + 1) else Nil) ++
        (if (y > 0) Seq(id - C) else Nil) ++
        (if (y < R - 1) Seq(id + C) else Nil)
      if (nbrs.exists(er(_) == 1)) 1 else 0
    }
    val expected = (1L to N.toLong)
      .map(id => (id, cls(id), er(id), opened(id)))
    val got = SparkEntry.queries("q142_morph_open")(spark, "unused")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3))).toSeq
    assert(got == expected)
    // opening(m) ⊆ m, and the fixture exercises both effects
    assert(got.forall { case (_, m, _, o) => o <= m })
    assert(got.exists { case (_, m, _, o) => m == 1 && o == 0 },
      "fixture degenerate: no speckle removed")
    assert(got.count { case (_, m, _, o) => m == 1 && o == 1 } > 1000,
      "fixture degenerate: opening destroyed the patch bodies")
  }

  test("q146 geohash equals a textbook bisection encoder on every cell") {
    // third algorithm (loop-based float bisection) vs the engine's
    // integer floor-div + ZInterleave and the oracle's 40-term
    // shift/mask — all three must agree. Ties at dyadic bisection
    // boundaries go to the upper half in both formulations (>= mid
    // <=> floor(frac * 2^20) has the bit set), and the centroid
    // doubles are exact where it matters (dyadic lat everywhere; lng
    // exact precisely at the dyadic boundary cells).
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    def bisect(lat: Double, lng: Double): String = {
      var latLo = -90.0; var latHi = 90.0
      var lngLo = -180.0; var lngHi = 180.0
      val sb = new StringBuilder
      var bit = 0; var ch = 0; var isLng = true
      while (sb.length < 8) {
        if (isLng) {
          val mid = (lngLo + lngHi) / 2
          if (lng >= mid) { ch = ch * 2 + 1; lngLo = mid }
          else { ch = ch * 2; lngHi = mid }
        } else {
          val mid = (latLo + latHi) / 2
          if (lat >= mid) { ch = ch * 2 + 1; latLo = mid }
          else { ch = ch * 2; latHi = mid }
        }
        isLng = !isLng
        bit += 1
        if (bit == 5) { sb += alphabet(ch); bit = 0; ch = 0 }
      }
      sb.toString
    }
    val expected = (1L to N.toLong).map { id =>
      val lat = ((id - 1) / C + 0.5) / R * 180.0 - 90.0
      val lng = ((id - 1) % C + 0.5) / C * 360.0 - 180.0
      (id, bisect(lat, lng))
    }
    val got = SparkEntry.queries("q146_geohash")(spark, "unused")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.map(t => (t._1, t._2)).toSeq == expected)
    assert(got.forall { case (_, g8, g4) => g8.startsWith(g4) })
    // the prefix genuinely partitions (more than one bucket, and
    // spatial locality: same-row neighbors usually share gh4)
    assert(got.map(_._3).distinct.length > 4)
  }

  test("q141 hillshade equals the scalar replica bit-for-bit") {
    val B = 8; val cxN = C / B + 1
    def corner(cx: Long, cy: Long): Long =
      World.h2((cy * cxN + cx) * 53 + 11) % 4000
    def elev(id: Long): Long = {
      val x = (id - 1) % C; val y = (id - 1) / C
      val (cx, fx) = (x / B, x % B); val (cy, fy) = (y / B, y % B)
      (B - fx) * (B - fy) * corner(cx, cy) +
        fx * (B - fy) * corner(cx + 1, cy) +
        (B - fx) * fy * corner(cx, cy + 1) + fx * fy * corner(cx + 1, cy + 1)
    }
    val cosZ = 0.7071067811865476
    val expected = (1L to N.toLong).flatMap { id =>
      val x = (id - 1) % C; val y = (id - 1) / C
      if (x >= 1 && x <= C - 2 && y >= 1 && y <= R - 2) {
        val p = (elev(id + 1) - elev(id - 1)).toDouble / 16384.0
        val q = (elev(id + C) - elev(id - C)).toDouble / 16384.0
        val hs = 255.0 * math.max(
          (0.5 * p - 0.5 * q + cosZ) / math.sqrt(1.0 + p * p + q * q), 0.0)
        Some(id -> hs)
      } else None
    }
    val got = SparkEntry.queries("q141_hillshade")(spark, "unused")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got.size == (C - 2) * (R - 2))
    // exact == on doubles: the query's determinism contract
    assert(got == expected)
    // the clamp and the full dynamic range are both exercised
    val vs = got.map(_._2)
    assert(vs.min == 0.0, "fixture degenerate: shadow clamp never fires")
    assert(vs.max > 200.0, "fixture degenerate: no bright slope")
  }
}
