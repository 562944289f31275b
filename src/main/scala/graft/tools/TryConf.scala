package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway A/B: time queries with extra conf overrides applied to the
  * sweep-shaped session. `runMain graft.tools.TryConf k=v[,k=v...] q...` */
object TryConf {
  def main(args: Array[String]): Unit = {
    val confs = args(0).split(',').filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split('='); (k, v) }
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    s.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey").count().count()
    val all = graft.SparkEntry.queries
    names.foreach { n =>
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        all(n)(s, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[tryconf] $n: $best%.3f s")
    }
    s.stop()
  }
}
