package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.sql.Edt

/** Unit pins for the Edt expression (q175): the parabola-envelope dt
  * against a scalar brute force over random feature layouts, plus the
  * empty-tile sentinel and the all-feature degenerate. */
class EdtSpec extends AnyFunSuite {

  private def run(tile: Int, featPix: Set[Int]): Seq[Long] = {
    val n = tile * tile
    val pixs = ArrayData.toArrayData((0 until n).toArray)
    val vs = ArrayData.toArrayData(
      (0 until n).map(p => if (featPix(p)) 255.0 else 0.0).toArray)
    Edt.eval(pixs, vs, tile, 128).toLongArray().toSeq
  }

  private def brute(tile: Int, featPix: Set[Int]): Seq[Long] =
    (0 until tile * tile).map { p =>
      val (r, c) = (p / tile, p % tile)
      if (featPix.isEmpty) -1L
      else featPix.iterator.map { q =>
        val (fr, fc) = (q / tile, q % tile)
        ((r - fr).toLong * (r - fr) + (c - fc).toLong * (c - fc))
      }.min
    }

  test("random layouts match the brute force at several tile sizes") {
    val rnd = new scala.util.Random(7)
    for (tile <- Seq(4, 8, 16); trial <- 0 until 20) {
      val k = 1 + rnd.nextInt(6)
      val feats = Seq.fill(k)(rnd.nextInt(tile * tile)).toSet
      assert(run(tile, feats) === brute(tile, feats),
        s"tile=$tile trial=$trial feats=$feats")
    }
  }

  test("empty tile emits the -1 sentinel everywhere") {
    assert(run(8, Set.empty[Int]).forall(_ == -1L))
  }

  test("all-feature tile is identically zero") {
    assert(run(8, (0 until 64).toSet).forall(_ == 0L))
  }

  test("Lbp: corner core with absent neighbors gets only in-grid bits; " +
    "flat patch is all-ones; order is clockwise from top-left") {
    import graft.sql.Lbp
    val tile = 2 // patch 4x4
    def lbp(vals: Map[Int, Double]): Seq[Long] = {
      val pixs = ArrayData.toArrayData(vals.keys.toArray.sorted)
      val vs = ArrayData.toArrayData(vals.keys.toArray.sorted.map(vals))
      Lbp.eval(pixs, vs, tile).toLongArray().toSeq
    }
    val p = tile + 2
    val full = (for (r <- 0 until p; c <- 0 until p)
      yield (r * p + c) -> 5.0).toMap
    assert(lbp(full) === Seq(255L, 255L, 255L, 255L), "flat => all 8 bits")
    // only the 4 core positions present (a grid-corner tile): core (0,0)
    // sees neighbors right (bit 3), down-right (bit 4), down (bit 5)
    val core = (for (r <- 1 to 2; c <- 1 to 2) yield (r * p + c) -> 5.0).toMap
    assert(lbp(core).head === ((1L << 3) | (1L << 4) | (1L << 5)))
  }

  test("single corner feature: exact squared distances across the tile") {
    val got = run(4, Set(0))
    val want = for (r <- 0 until 4; c <- 0 until 4)
      yield (r.toLong * r + c.toLong * c)
    assert(got === want)
  }
}
