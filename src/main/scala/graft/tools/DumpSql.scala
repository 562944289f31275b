package graft.tools

import org.apache.spark.sql.SparkSession

/** Print one registered oracle SQL to stdout (debug aid for iterating
  * on an oracle in DuckDB without a full Verify run):
  * `sbt "runMain graft.tools.DumpSql <name>"`.
  *
  * Fit-dependent oracles (q52's centroid literals come from the IVF
  * codebook cached when the query runs) dump their pre-fit sentinel if
  * nothing ran in this JVM — detected here, in which case the named
  * query is executed once against SPARK_GRAFT_SF_DIR (default
  * sf0.001) so the real SQL can be printed. */
object DumpSql {
  def main(args: Array[String]): Unit = {
    def sqlFor(n: String): Option[String] = graft.SparkEntry.oracleSql.get(n)
    args.headOption match {
      case Some(n) =>
        sqlFor(n) match {
          case Some(graft.queries.TextOps.PreFitSentinel) =>
            val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
              "/root/testdata/sf0.001")
            val s = SparkSession.builder().master("local[4]")
              .config("spark.sql.shuffle.partitions", "4")
              .config("spark.ui.enabled", "false").getOrCreate()
            s.sparkContext.setLogLevel("WARN")
            try graft.SparkEntry.queries(n)(s, dir).collect()
            finally s.stop()
            println(sqlFor(n).get)
          case Some(sql) => println(sql)
          case None =>
            System.err.println("usage: DumpSql <name>; names:\n  " +
              graft.SparkEntry.oracleSql.keys.toSeq.sorted.mkString("\n  "))
            sys.exit(2)
        }
      case None =>
        System.err.println("usage: DumpSql <name>; names:\n  " +
          graft.SparkEntry.oracleSql.keys.toSeq.sorted.mkString("\n  "))
        sys.exit(2)
    }
  }
}
