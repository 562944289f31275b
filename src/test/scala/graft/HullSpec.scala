package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.sql.ConvexHull

/** Unit pins for the ConvexHull expression (q172): canonical order,
  * exact integer area, degenerate shapes, and the two-level reduction
  * algebra hull(union of partial hulls) == hull(all points) that the
  * distributed plan relies on. */
class HullSpec extends AnyFunSuite {

  private def pack(x: Long, y: Long): Long = x * 65536L + y

  private def hull(ps: Seq[Long]): (Long, Seq[Long]) = {
    val row = ConvexHull.eval(ArrayData.toArrayData(ps.distinct.toArray))
    (row.getLong(0), row.getArray(1).toLongArray().toSeq)
  }

  test("square with interior points: 4 corners, CCW from lex-min, exact area") {
    val corners = Seq(pack(0, 0), pack(10, 0), pack(10, 10), pack(0, 10))
    val interior = Seq(pack(5, 5), pack(3, 7), pack(9, 1))
    val (a2, vs) = hull(scala.util.Random.shuffle(corners ++ interior))
    assert(vs === Seq(pack(0, 0), pack(10, 0), pack(10, 10), pack(0, 10)),
      "canonical order is lex-min start, positive shoelace (CCW)")
    assert(a2 === 200L, "twice the 10x10 square area")
  }

  test("degenerate: empty, single point, two points, all collinear") {
    assert(hull(Nil) === ((0L, Nil)))
    assert(hull(Seq(pack(7, 3))) === ((0L, Seq(pack(7, 3)))))
    val (a2, vs2) = hull(Seq(pack(2, 2), pack(8, 4)))
    assert(a2 === 0L && vs2.toSet === Set(pack(2, 2), pack(8, 4)))
    // strict turns: interior collinear points are dropped, segment kept
    val (a3, vs3) = hull(Seq(pack(0, 0), pack(5, 5), pack(10, 10), pack(3, 3)))
    assert(a3 === 0L && vs3.toSet === Set(pack(0, 0), pack(10, 10)))
  }

  test("collinear edge points are excluded from the hull boundary") {
    val (a2, vs) = hull(Seq(pack(0, 0), pack(5, 0), pack(10, 0),
      pack(10, 10), pack(0, 10), pack(0, 5)))
    assert(vs === Seq(pack(0, 0), pack(10, 0), pack(10, 10), pack(0, 10)))
    assert(a2 === 200L)
  }

  test("q173 license: the diameter over hull vertices equals the " +
    "diameter over all points (strict-convexity reduction)") {
    import graft.world.World
    for (g <- 0 until 5) {
      val pts = (0 until 150).map { i =>
        val id = g * 150L + i
        pack(World.h2(id * 19 + 5) % 4096, World.h2(id * 23 + 9) % 4096)
      }.distinct
      def d2(a: Long, b: Long): Long = {
        val dx = (a >>> 16) - (b >>> 16); val dy = (a & 0xFFFFL) - (b & 0xFFFFL)
        dx * dx + dy * dy
      }
      val all = (for (a <- pts; b <- pts if a < b) yield d2(a, b)).max
      val hv = hull(pts)._2
      val hvMax = (for (a <- hv; b <- hv if a < b) yield d2(a, b)).max
      assert(hvMax === all, s"group $g: hull-pair diameter != brute diameter")
    }
  }

  test("q174 license: every group's true min distance is far below the " +
    "256-unit cell size, so the 3x3-neighborhood pruning is exact") {
    import graft.world.World
    for (g <- 0 until 5) {
      val pts = (0 until 300).map { i =>
        val id = g * 300L + i
        pack(World.h2(id * 19 + 21) % 4096, World.h2(id * 23 + 27) % 4096)
      }.distinct
      def d2(a: Long, b: Long): Long = {
        val dx = (a >>> 16) - (b >>> 16); val dy = (a & 0xFFFFL) - (b & 0xFFFFL)
        dx * dx + dy * dy
      }
      val min = (for (a <- pts; b <- pts if a < b) yield d2(a, b)).min
      assert(min < 256L * 256L,
        s"group $g: min d2 $min >= cell², the candidate join could miss it")
    }
  }

  test("q178 license: every point's true min segment distance is below " +
    "one 256-unit cell, so the 3x3-neighborhood probe cannot miss the " +
    "nearest segment") {
    import graft.world.World
    val segs = (0 until 80).map { i =>
      val ax = World.h2(i * 89L + 1) % 1024
      val ay = World.h2(i * 97L + 2) % 1024
      val bx = math.max(0L, math.min(1023L, ax + World.h2(i * 101L + 3) % 601 - 300))
      val by = math.max(0L, math.min(1023L, ay + World.h2(i * 103L + 4) % 601 - 300))
      (ax, ay, bx, by)
    }
    // exact rational d² = num/den; compare to 256² by cross-multiply
    def minOk(px: Long, py: Long): Boolean = segs.exists { case (ax, ay, bx, by) =>
      val (vx, vy, wx, wy) = (px - ax, py - ay, bx - ax, by - ay)
      val ww = wx * wx + wy * wy
      val dot = vx * wx + vy * wy
      val vv = vx * vx + vy * vy
      val pb2 = (px - bx) * (px - bx) + (py - by) * (py - by)
      val (num, den) =
        if (ww == 0 || dot <= 0) (vv, 1L)
        else if (dot >= ww) (pb2, 1L)
        else (vv * ww - dot * dot, ww)
      num < 65536L * den
    }
    for (p <- 0 until 200) {
      val px = World.h2(p * 107L + 5) % 1024
      val py = World.h2(p * 109L + 6) % 1024
      assert(minOk(px, py),
        s"point $p at ($px,$py): nearest segment >= 256 away — pruning unsafe")
    }
  }

  test("hull(union of partial hulls) == hull(all points) — the 2-level algebra") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(400)(pack(rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val whole = hull(pts)
    val parts = pts.grouped(100).map(g => hull(g)._2).toSeq
    assert(hull(parts.flatten) === whole)
  }
}
