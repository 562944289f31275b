package graft.engine

import java.nio.file.{Files, Paths}
import org.apache.spark.GraftSparkBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-level checkpoint/resume with per-partition lineage + metrics
  * (north_rule: "resumable from checkpoint with per-partition lineage
  * and metrics"; the reference's ad-hoc CSV cache is
  * `Supplemental_Data_1.R:124-139`).
  *
  * Each pipeline stage is snapshotted to parquet under a name, keyed by
  * a FINGERPRINT of its inputs + configuration. On rerun, a stage whose
  * stored fingerprint matches is reloaded instead of recomputed —
  * killing the job after stage N and rerunning resumes at N+1. A
  * SparkListener captures per-task (= per output partition) record /
  * byte / wall-time metrics during the snapshot write; they are
  * persisted in the stage's meta record as its partition lineage, so an
  * operator can later audit exactly which partition wrote what.
  *
  * The meta records are themselves stored as single-row JSON datasets
  * (read/written by Spark), avoiding any bespoke JSON parsing.
  */
object Checkpoint {

  /** Per-output-partition write metrics — the partition lineage. */
  final case class PartitionMetric(partition: Int, records: Long,
      bytes: Long, wallMs: Long)

  final case class StageMeta(name: String, fingerprint: String,
      inputs: Seq[String], rows: Long, partitions: Seq[PartitionMetric])

  /** One resumable run rooted at `dir`. */
  final class Store(spark: SparkSession, dir: String) {
    import spark.implicits._

    /** (name -> loaded|computed) for this run, in execution order. */
    val log = scala.collection.mutable.ArrayBuffer[(String, String)]()

    private def dataPath(name: String) = s"$dir/stages/$name"
    private def metaPath(name: String) = s"$dir/meta/$name"

    private def readMeta(name: String): Option[StageMeta] =
      if (!Files.exists(Paths.get(metaPath(name)))) None
      else scala.util.Try(
        spark.read.schema(implicitly[org.apache.spark.sql.Encoder[StageMeta]]
            .schema)
          .json(metaPath(name)).as[StageMeta].head()).toOption

    private def writeMeta(meta: StageMeta): Unit =
      Seq(meta).toDS().coalesce(1).write.mode("overwrite")
        .json(metaPath(meta.name))

    /** Load stage `name` if its fingerprint matches the stored
      * snapshot; otherwise compute, snapshot, and record lineage. */
    def stage(name: String, fingerprint: String, inputs: Seq[String] = Nil)(
        compute: => DataFrame): DataFrame = {
      val existing = readMeta(name)
      val ok = existing.exists(_.fingerprint == fingerprint) &&
        Files.exists(Paths.get(s"${dataPath(name)}/_SUCCESS"))
      if (ok) {
        log += name -> "loaded"
        spark.read.parquet(dataPath(name))
      } else {
        val listener = new WriteMetricsListener
        spark.sparkContext.addSparkListener(listener)
        try compute.write.mode("overwrite").parquet(dataPath(name))
        finally {
          GraftSparkBridge.waitListenerEmpty(spark.sparkContext)
          spark.sparkContext.removeSparkListener(listener)
        }
        val parts = listener.partitions
        writeMeta(StageMeta(name, fingerprint, inputs,
          parts.map(_.records).sum, parts))
        log += name -> "computed"
        spark.read.parquet(dataPath(name))
      }
    }

    def meta(name: String): Option[StageMeta] = readMeta(name)
  }

  /** Captures the file-write tasks (those that actually wrote bytes)
    * between registration and removal. */
  private final class WriteMetricsListener extends SparkListener {
    private val buf =
      new java.util.concurrent.ConcurrentLinkedQueue[PartitionMetric]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null && m.outputMetrics != null &&
          m.outputMetrics.bytesWritten > 0) {
        buf.add(PartitionMetric(te.taskInfo.index,
          m.outputMetrics.recordsWritten, m.outputMetrics.bytesWritten,
          te.taskInfo.duration))
      }
    }
    def partitions: Seq[PartitionMetric] = {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq.sortBy(_.partition)
    }
  }

  /** Content fingerprint helper: stable hash of the pieces that define
    * a stage (upstream fingerprints, config values, code tag). */
  def fingerprint(parts: Any*): String =
    java.lang.Long.toHexString(
      parts.map(_.toString).mkString("|").hashCode.toLong & 0xFFFFFFFFL)
}
