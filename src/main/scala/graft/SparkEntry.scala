package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Q, Relational, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator coverage matrix: one entry per implemented
  * operator from SURVEY.md §2; `oracleSql` holds the DuckDB-equivalent
  * SQL for the driver's correctness compare (column names are aliased
  * identically on both sides).
  */
object SparkEntry {

  /** All registered queries, relational + spatial + text/dedup. */
  def registry: Seq[Q] =
    Relational.all ++ graft.queries.Spatial.all ++
      graft.queries.TextOps.all ++ graft.queries.Audio.all ++
      graft.queries.Video.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_dim_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
