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

  test("hull(union of partial hulls) == hull(all points) — the 2-level algebra") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(400)(pack(rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val whole = hull(pts)
    val parts = pts.grouped(100).map(g => hull(g)._2).toSeq
    assert(hull(parts.flatten) === whole)
  }
}
