package graft.tools

import org.apache.spark.sql.SparkSession

/** Print one registered query's formatted physical plan (AQE off), for
  * fast shuffle-count audits without a full PlanDump run:
  * `sbt "runMain graft.tools.PlanOne <name>"`. */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
