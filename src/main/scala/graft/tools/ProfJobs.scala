package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Throwaway: run one registered query twice and print per-job wall
  * times (second pass only) to see where an iterative query's wall
  * clock goes. */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(s, sfDir).count() // warm
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var jobs = List.empty[(Int, Long)]
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs = (j.jobId, j.time - starts.getOrDefault(j.jobId, j.time)) :: jobs
    }
    s.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    val n = fn(s, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    val js = jobs.sortBy(_._1)
    println(f"[profjobs] $name wall=$wall%.2f s rows=$n jobs=${js.size} " +
      f"jobMs=${js.map(_._2).sum}")
    js.foreach { case (id, ms) => println(s"[profjobs]   job $id: $ms ms") }
    s.stop()
  }
}
