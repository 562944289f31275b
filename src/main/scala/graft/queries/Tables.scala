package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query paired with its DuckDB oracle SQL (None for
  * non-SQL-expressible ops, which get the driver's rows-only check).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  /** Load one of the driver-provided parquet tables from an sf dir. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
