package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one registered query under the sweep's session shape:
  * `sbt "runMain graft.tools.TimeQuery <name> <sfDir> [passes]"`.
  * Exists so a single slow sweep line can be iterated on without a full
  * Bench run (the sweep itself is ~1 min + 15 min of ladders). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[timequery] $name pass $p: $sec%.2f s ($n rows)")
    }
    spark.stop()
  }
}
