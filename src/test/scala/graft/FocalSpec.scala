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
}
