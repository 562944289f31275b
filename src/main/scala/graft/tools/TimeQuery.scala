package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one registered query under the sweep's session shape:
  * `sbt "runMain graft.tools.TimeQuery <name> <sfDir> [passes]"`.
  * Exists so a single slow sweep line can be iterated on without a full
  * Bench run (the sweep itself is ~1 min + 15 min of ladders). Matches
  * the sweep's shape: SPARK_GRAFT_CPUS (default 32) drives both master
  * and shuffle width, and an untimed warmup pass absorbs session/codegen
  * init like Bench's warmup does. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = graft.SparkEntry.queries
    if (args.isEmpty || !names.contains(args(0))) {
      System.err.println(
        s"usage: TimeQuery <name> [sfDir] [passes]\nregistered queries:\n  " +
          names.keys.toSeq.sorted.mkString("\n  "))
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = names(name)
    fn(spark, sfDir).count() // untimed warmup (session + codegen init)
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[timequery] $name pass $p: $sec%.2f s ($n rows)")
    }
    spark.stop()
  }
}
