package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** CSV sink (SURVEY.md §2.2 K1) — the reference's only output format
  * (`write_csv`, R:354,393,503,525-550). Headers on, deterministic row
  * order via an explicit sort column (Spark has no implicit order,
  * SURVEY §2.7 U2). `single = true` reproduces the reference's
  * one-file-per-report shape (fine for reports; large frames should
  * keep many part files). */
object Csv {

  def write(df: DataFrame, path: String, sortCols: Seq[String],
      single: Boolean = true): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else if (single) df.sort(sortCols.map(col): _*)
      else df.sortWithinPartitions(sortCols.map(col): _*)
    (if (single) sorted.coalesce(1) else sorted)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }

  /** The per-class loss-mask CSV fan-out (R:524-550): one
    * `LossMask_class<k>.csv` per class value in `classCol`, each holding
    * (cell_id, <valueCol>) rows of that class. */
  def writeClassMasks(df: DataFrame, dir: String, classCol: String,
      valueCol: String, classes: Seq[Int]): Unit =
    classes.foreach { k =>
      write(df.filter(col(classCol) === k).select("cell_id", valueCol),
        s"$dir/LossMask_class$k.csv", sortCols = Seq("cell_id"))
    }
}
