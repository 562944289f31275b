package graft.tools

/** Print one registered oracle SQL to stdout (debug aid for iterating
  * on an oracle in DuckDB without a full Verify run):
  * `sbt "runMain graft.tools.DumpSql <name>"`. */
object DumpSql {
  def main(args: Array[String]): Unit = {
    val m = graft.SparkEntry.oracleSql
    args.headOption.flatMap(m.get) match {
      case Some(sql) => println(sql)
      case None =>
        System.err.println("usage: DumpSql <name>; names:\n  " +
          m.keys.toSeq.sorted.mkString("\n  "))
        sys.exit(2)
    }
  }
}
