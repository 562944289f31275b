package graft.tools

import graft.core.{Geom, Polygon}
import graft.world.World

/** Microbenchmark of the PIP hot loop (the headline metric's per-pixel
  * compute core): ns/point for Geom.regionOf over the bench-shaped
  * 1280-edge densified region layer, single-ring fast path vs the
  * multi-ring prev-array path (same geometry plus one distant 3-vertex
  * ring to force ringStarts.length > 1 — 3 extra edges in 1280, timing
  * noise only). Run pinned: `taskset -c 0 ... graft.tools.PipBench`.
  */
object PipBench {
  def main(args: Array[String]): Unit = {
    val polys = World.densify(World.polygons(World.tiny), 256)
    val slow = polys.map { p =>
      // the forcing ring sits INSIDE the outer bbox (a micro-triangle
      // at the bbox corner) so the early bbox reject — which most
      // probe points take — is identical between the two variants
      val fx = p.minX + 0.125
      val fy = p.minY + 0.125
      Polygon(p.regionId,
        p.xs ++ Array(fx, fx + 0.01, fx),
        p.ys ++ Array(fy, fy, fy + 0.01),
        Array(0, p.xs.length))
    }
    val spec = World.tiny
    def pass(ps: Array[Polygon]): (Double, Long) = {
      var acc = 0L
      val t0 = System.nanoTime()
      var id = 1L
      while (id <= spec.nCells) {
        acc += Geom.regionOf(ps, World.px(spec, id), World.py(spec, id))
        id += 1
      }
      ((System.nanoTime() - t0).toDouble / spec.nCells, acc)
    }
    // warmup both paths into the JIT, then best-of-10 each
    (1 to 5).foreach { _ => pass(polys); pass(slow) }
    val fast = (1 to 10).map(_ => pass(polys)._1).min
    val multi = (1 to 10).map(_ => pass(slow)._1).min
    println(f"PIP single-ring fast path: $fast%.1f ns/point")
    println(f"PIP multi-ring prev path:  $multi%.1f ns/point")
    println(f"ratio multi/fast: ${multi / fast}%.3f")
  }
}
