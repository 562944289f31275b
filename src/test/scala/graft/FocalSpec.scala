package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.world.World

/** q93 focal halo exchange: brute-force parity on a PADDED non-dyadic
  * grid (partial edge tiles — the case the registry's DuckDB oracle
  * doesn't cover because the dyadic tiny world has none), and the plan
  * contract: exactly one data shuffle (the dest-tile aggregation) plus
  * the presentation sort — the stencil never becomes a per-pixel join.
  */
class FocalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-focal-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** 50x72 @ tile 16: right AND bottom partial edge tiles. */
  private val padded = graft.world.WorldSpec(rows = 50, cols = 72,
    tile = 16, nRegions = 3)

  private def brute(sp: graft.world.WorldSpec)
      : Map[Long, (Long, Int, Int)] =
    (1L to sp.nCells).map { id =>
      val r0 = (id - 1) / sp.cols
      val c0 = (id - 1) % sp.cols
      var fsum = 0L
      var ncnt = 0
      var nbMax = -1L
      for (dy <- -1 to 1; dx <- -1 to 1) {
        val r = r0 + dy
        val c = c0 + dx
        if (r >= 0 && r < sp.rows && c >= 0 && c < sp.cols) {
          val v = World.band(r * sp.cols + c + 1, 1).toLong
          fsum += v
          ncnt += 1
          if ((dy != 0 || dx != 0) && v > nbMax) nbMax = v
        }
      }
      val self = World.band(id, 1).toLong
      id -> (fsum, ncnt, if (self > nbMax) 1 else 0)
    }.toMap

  test("padded grid: halo stencil equals the brute-force window over " +
    "every cell (partial edge tiles, world-edge windows)") {
    assert(padded.padded)
    val got = graft.queries.Spatial.focalHalo(spark, padded).collect()
    assert(got.length == padded.nCells)
    val want = brute(padded)
    got.foreach { row =>
      val id = row.getLong(0)
      val (fsum, ncnt, peak) = want(id)
      assert(row.getLong(1) == fsum, s"fsum at cell $id")
      assert(row.getInt(2) == ncnt, s"ncnt at cell $id")
      assert(row.getInt(3) == peak, s"peak at cell $id")
    }
    // world-edge cells really exercise the smaller windows
    assert(want.values.exists(_._2 == 4) && want.values.exists(_._2 == 6))
  }

  test("padded grid: Sobel gradient equals the brute kernels on every " +
    "FULL-window cell and emits nothing elsewhere (interior-only rule)") {
    val got = graft.queries.Spatial.sobelHalo(spark, padded).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    def v(r: Long, c: Long) = World.band(r * padded.cols + c + 1, 1).toLong
    var interior = 0
    (1L to padded.nCells).foreach { id =>
      val r0 = (id - 1) / padded.cols
      val c0 = (id - 1) % padded.cols
      if (r0 >= 1 && r0 < padded.rows - 1 && c0 >= 1 && c0 < padded.cols - 1) {
        interior += 1
        val gx = (v(r0 - 1, c0 + 1) + 2 * v(r0, c0 + 1) + v(r0 + 1, c0 + 1)) -
          (v(r0 - 1, c0 - 1) + 2 * v(r0, c0 - 1) + v(r0 + 1, c0 - 1))
        val gy = (v(r0 + 1, c0 - 1) + 2 * v(r0 + 1, c0) + v(r0 + 1, c0 + 1)) -
          (v(r0 - 1, c0 - 1) + 2 * v(r0 - 1, c0) + v(r0 - 1, c0 + 1))
        assert(got(id) == ((gx, gy, math.abs(gx) + math.abs(gy))),
          s"sobel at cell $id")
      } else assert(!got.contains(id), s"edge cell $id must be absent")
    }
    assert(got.size == interior)
  }

  test("padded grid: majority filter equals the brute mode with " +
    "smaller-level tie-break over the in-grid window of every cell") {
    val div = graft.queries.Spatial.ModeDiv
    val got = graft.queries.Spatial.modeHalo(spark, padded).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got.size == padded.nCells)
    var tied = 0
    (1L to padded.nCells).foreach { id =>
      val r0 = (id - 1) / padded.cols
      val c0 = (id - 1) % padded.cols
      val lvls = for {
        dy <- -1 to 1; dx <- -1 to 1
        r = r0 + dy; c = c0 + dx
        if r >= 0 && r < padded.rows && c >= 0 && c < padded.cols
      } yield World.band(r * padded.cols + c + 1, 1).toLong / div
      val counts = lvls.groupBy(identity).view.mapValues(_.size)
      val maxCnt = counts.values.max
      val atMax = counts.filter(_._2 == maxCnt).keys
      if (atMax.size > 1) tied += 1
      assert(got(id) == ((atMax.min, maxCnt)), s"mode at cell $id")
    }
    // the tie-break rule must actually be exercised
    assert(tied > 0, "fixture has no modal ties — tie-break untested")
  }

  test("padded grid: per-tile Laplacian sharpness equals the brute " +
    "stencil reduction; padding-only pixels and world edges excluded") {
    val got = graft.queries.Spatial.lapHalo(spark, padded).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def v(r: Long, c: Long) = World.band(r * padded.cols + c + 1, 1).toLong
    val tilesX = (padded.cols + padded.tile - 1) / padded.tile
    val want = (1L to padded.nCells).flatMap { id =>
      val r0 = (id - 1) / padded.cols
      val c0 = (id - 1) % padded.cols
      if (r0 >= 1 && r0 < padded.rows - 1 && c0 >= 1 && c0 < padded.cols - 1) {
        val lap = 4 * v(r0, c0) - v(r0 - 1, c0) - v(r0 + 1, c0) -
          v(r0, c0 - 1) - v(r0, c0 + 1)
        Some((r0 / padded.tile * tilesX + c0 / padded.tile) -> lap)
      } else None
    }.groupBy(_._1).map { case (t, ls) =>
      val laps = ls.map(_._2)
      val n = laps.size.toLong
      val s1 = laps.sum
      val s2 = laps.map(l => l * l).sum
      t.toLong -> ((laps.size, s1, s2, n * s2 - s1 * s1))
    }
    assert(got == want)
    // partial edge tiles must really have fewer interior pixels
    assert(got.values.map(_._1).toSet.size > 1,
      "fixture has uniform tile interiors — edge handling untested")
  }

  test("plan: one dest-tile aggregation shuffle + the presentation " +
    "sort — no per-pixel join, no extra exchange") {
    val df = graft.queries.Spatial.focalHalo(spark, World.tiny)
    // string-count exchanges: AQE wraps the plan in AdaptiveSparkPlanExec,
    // which TreeNode.collect does not descend into
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange (hash|range)partitioning".r
      .findAllIn(plan).length
    assert(exchanges == 2,
      s"expected agg + sort exchanges only, got $exchanges:\n$plan")
    assert(plan.toLowerCase.contains("focal3x3"), s"no Focal3x3 in:\n$plan")
    assert(!plan.contains("Join"), "the stencil must not plan a join")
  }

  test("q145 GLCM texture equals the brute co-occurrence features and " +
    "the fixture has non-trivial texture variation across tiles") {
    val sp = World.tiny
    // iso surface (terrain + roughness) >> 15, scalar-side
    def lvl(id: Long): Long = {
      val B = 8; val cxN = sp.cols / B + 1
      def corner(cx: Long, cy: Long): Long =
        World.h2((cy * cxN + cx) * 53 + 11) % 4000
      val x = (id - 1) % sp.cols; val y = (id - 1) / sp.cols
      val (cx, fx) = (x / B, x % B); val (cy, fy) = (y / B, y % B)
      val elev = (B - fx) * (B - fy) * corner(cx, cy) +
        fx * (B - fy) * corner(cx + 1, cy) +
        (B - fx) * fy * corner(cx, cy + 1) + fx * fy * corner(cx + 1, cy + 1)
      (elev + World.h2(id * 29 + 5) % 40000) >> 15
    }
    val pairs = (1L to sp.nCells).filter { id =>
      ((id - 1) % sp.cols) % sp.tile < sp.tile - 1
    }.map { id =>
      val r0 = (id - 1) / sp.cols; val c0 = (id - 1) % sp.cols
      val tile = (r0 / sp.tile) * sp.tilesX + c0 / sp.tile
      (tile, lvl(id), lvl(id + 1))
    }
    val expected = pairs.groupBy(_._1).toSeq.map { case (t, ps) =>
      val hist = ps.groupBy(p => (p._2, p._3)).view.mapValues(_.size.toLong)
      val contrast = hist.map { case ((a, b), n) => n * (a - b) * (a - b) }.sum
      val energy = hist.map { case (_, n) => n * n }.sum
      (t, contrast, energy)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q145_glcm_texture")(spark, "unused")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // a hash field is near-white-noise: energy must sit near the random
    // baseline (pairs²/64) and contrast must differ across tiles —
    // degenerate all-equal features would mean the levels collapsed
    assert(got.map(_._2).distinct.size > 1, "contrast constant across tiles")
    assert(got.map(_._3).distinct.size > 1, "energy constant across tiles")
  }

  test("q147 integral image equals the brute per-pixel box sum and the " +
    "4-lookup box identity recovers arbitrary box sums") {
    val sp = World.tiny
    def v(id: Long): Long = World.h(id * 7) % 256
    def cellAt(tile: Int, r: Int, c: Int): Long = {
      val row = (tile / sp.tilesX) * sp.tile + r
      val col = (tile % sp.tilesX) * sp.tile + c
      row.toLong * sp.cols + col + 1
    }
    val got = SparkEntry.queries("q147_integral_image")(spark, "unused")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == sp.nCells)
    // brute: every pixel's SAT is the double-loop sum from the origin
    val tiles = 0 until sp.nTiles
    tiles.foreach { t =>
      for (r <- 0 until sp.tile; c <- 0 until sp.tile) {
        val brute = (for (i <- 0 to r; j <- 0 to c)
          yield v(cellAt(t, i, j))).sum
        assert(got(cellAt(t, r, c)) == brute,
          s"SAT mismatch at tile $t ($r,$c)")
      }
    }
    // the point of a SAT: box sum = D - B - C + A with 4 lookups
    def sat(t: Int, r: Int, c: Int): Long =
      if (r < 0 || c < 0) 0L else got(cellAt(t, r, c))
    val boxes = Seq((0, 3, 3, 9, 9), (5, 0, 0, 15, 15), (11, 7, 2, 12, 14))
    boxes.foreach { case (t, r1, c1, r2, c2) =>
      val viaSat = sat(t, r2, c2) - sat(t, r1 - 1, c2) -
        sat(t, r2, c1 - 1) + sat(t, r1 - 1, c1 - 1)
      val brute = (for (i <- r1 to r2; j <- c1 to c2)
        yield v(cellAt(t, i, j))).sum
      assert(viaSat == brute, s"box identity failed on $t")
    }
  }
}
