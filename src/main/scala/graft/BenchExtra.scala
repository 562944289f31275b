package graft

import org.apache.spark.sql.SparkSession

/** Builder-side measurement harness (NOT a driver surface — Bench.scala
  * is the frozen contract): times registered queries under the sweep's
  * exact session shape with the noop sink (guide §1.4: computes every
  * column of every row, no sink cost, no optimizer pruning like count()
  * allows), labeled via setJobDescription.
  *
  * `sbt "runMain graft.BenchExtra [sfDir] [passes] [name]..."`
  * (no names = every registered query). Prints per-query best-of-N
  * seconds as one JSON line, same best-of semantics as the sweep. */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench.orchestrate: absorb session/codegen init
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey").count().count()
    val all = SparkEntry.queries
    val names = if (args.length > 2) args.drop(2).toSeq else all.keys.toSeq.sorted
    val results = names.map { n =>
      val best = (1 to passes).map { p =>
        spark.sparkContext.setJobDescription(s"$n pass $p")
        val t0 = System.nanoTime()
        all(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      spark.sparkContext.setJobDescription(null)
      println(f"[benchextra] $n: $best%.3f s")
      n -> best
    }
    val qs = results.map { case (k, v) => s"\"$k\":$v" }
      .mkString("{", ",", "}")
    println(s"""{"benchextra":true,"sf":"$sfDir","passes":$passes,""" +
      s""""total_sec":${results.map(_._2).sum},"queries":$qs}""")
    spark.stop()
  }
}
