package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Headline

/** Quick solo-throughput probe of the headline job (NOT the bench — no
  * pinning, no sustained windows, no fleet): warm passes then best-of-N
  * tiles/s at SPARK_GRAFT_CPUS cores. For iterating on the classify
  * pipeline between full Bench runs.
  * `sbt "runMain graft.tools.TimeHeadline [passes]"` */
object TimeHeadline {
  def main(args: Array[String]): Unit = {
    val passes = if (args.nonEmpty) args(0).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.parquet.columnarReaderBatchSize", "32")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "2g")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Headline.ensureTiles(spark)
    val trees = Headline.loadOrFitTrees(spark)
    def run(covered: Boolean): Long =
      Headline.planFrom(spark.read.parquet(Headline.tilesPath), trees,
        covered).count()
    Seq(true, false).foreach(run) // warmup both variants
    Seq("covered" -> true, "exact" -> false).foreach { case (label, cov) =>
      val times = (1 to passes).map { p =>
        val t0 = System.nanoTime()
        run(cov)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[timeheadline] $label pass $p: $sec%.2f s = ${Headline.spec.nTiles / sec}%.0f tiles/s")
        sec
      }
      println(f"[timeheadline] $label best: ${Headline.spec.nTiles / times.min}%.0f tiles/s")
    }
    spark.stop()
  }
}
