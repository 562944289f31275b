package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.engine.Multimodal
import graft.world.World

/** Audio-modality queries: the third leg of the multimodal pipeline
  * (image = decode/resize q74/q76, video = frame-sample q79, audio =
  * these). Payloads are opaque `s16le` binary columns with typed
  * metadata (sample_rate, n_samples, fmt), processed by codegen'd
  * expressions over byte slices — the same carrier design the
  * reference's rasters use (bytes + grid metadata,
  * `Supplemental_Data_1.R:142-166`), applied to 1-D signals.
  *
  * Every output is integer-exact (sums of products of int16 samples),
  * so the DuckDB oracle reproduces the fixture formula bit-for-bit —
  * no float/libm divergence surface at all.
  */
object Audio {

  def all: Seq[Q] = Seq(
    Q("q81_audio_windows", q81, Some(q81Sql)),
    Q("q82_audio_resample", q82, Some(q82Sql)),
    Q("q83_audio_neardup", q83, Some(q83Sql)))

  private val nClips = World.tiny.nTiles
  private val N = Multimodal.AudioSamples
  private val W = Multimodal.AudioWindow
  private val K = Multimodal.AudioStride

  /** Sample formula in DuckDB SQL — identical to `World.aud`. */
  private def audSql(t: String, i: String) =
    s"(((($t) * 8191 + ($i) * 23) * 2654435761) % 4294967296 % 4096 - 2048)"

  /** Clip-sample spine: one row per (clip t, sample i, value v). */
  private def samplesCte =
    s"""WITH s AS (
       |  SELECT t.range AS t, i.range AS i,
       |    ${audSql("t.range", "i.range")} AS v
       |  FROM range($nClips) t, range($N) i)""".stripMargin

  /** q81: windowed audio stats — per (clip, 256-sample window):
    * energy (sum of squares), peak |sample|, zero crossings. One
    * codegen'd byte-slice read per window, inline explode fan-out,
    * no shuffle before the final presentation sort. */
  private def q81(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioWindows(Multimodal.syntheticAudio(s), N, W)
      .orderBy("audio_id", "window_idx")

  private def q81Sql =
    s"""$samplesCte,
       |lagged AS (SELECT t, i, v,
       |    LAG(v) OVER (PARTITION BY t ORDER BY i) AS pv
       |  FROM s)
       |SELECT printf('aud_%05d', t) AS audio_id,
       |  CAST(i // $W AS INT) AS window_idx,
       |  CAST(SUM(v * v) AS BIGINT) AS sum_sq,
       |  CAST(MAX(ABS(v)) AS INT) AS peak,
       |  CAST(SUM(CASE WHEN i % $W > 0 AND pv * v < 0 THEN 1 ELSE 0 END)
       |    AS INT) AS zero_cross
       |FROM lagged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q82: stride-4 resample round-trip — decimate to a REAL re-encoded
    * s16le payload, then checksum it with the order-pinning ClipStats
    * (wsum = sum((j+1) * sample_j) over the NEW payload), so the oracle
    * pins the resampled byte layout exactly, not just its summary. */
  private def q82(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioResample(Multimodal.syntheticAudio(s), K)
      .orderBy("audio_id")

  private def q82Sql =
    s"""$samplesCte
       |SELECT printf('aud_%05d', t) AS audio_id,
       |  CAST(COUNT(*) AS INT) AS n_out,
       |  CAST(SUM(v) AS BIGINT) AS sum_v,
       |  CAST(MAX(ABS(v)) AS INT) AS peak,
       |  CAST(SUM((i // $K + 1) * v) AS BIGINT) AS wsum
       |FROM s WHERE i % $K = 0 GROUP BY 1 ORDER BY 1""".stripMargin

  /** Fingerprint windows: 64 windows of N/64 samples -> 64 bits. */
  private val FpWin = 64
  /** Near-dup hamming radius (4 bands of 16 bits give exact recall). */
  private val FpHamK = 3

  /** q83: AUDIO NEAR-DUP — the dedup stage for the audio modality
    * (text MinHash = q45-q56, image phash = q77/q78, audio = this).
    * Each clip gets a 64-bit circular energy-delta fingerprint
    * (AudioFingerprint, one codegen'd pass over the payload); the
    * fixture adds one perturbed VARIANT per base clip (transcode
    * stand-in); candidate pairs come from the shared exact-recall
    * pigeonhole banding (TextOps.hammingPairs: hamming<=3 implies an
    * equal 16-bit band, replication factor 4, shuffle keyed on
    * (band, chunk) — no O(n^2) anywhere); popcount verifies. Oracle:
    * fingerprints rebuilt in SQL from the sample formulas, brute-force
    * pair scan. */
  private def q83(s: SparkSession, dir: String): DataFrame = {
    val clips = Multimodal.syntheticAudio(s)
      .unionByName(Multimodal.syntheticAudioVariants(s))
    val fp = graft.sql.GraftFunctions
      .audio_fingerprint(col("bytes"), N / FpWin, FpWin)
    TextOps.hammingPairs(
        clips.select(col("audio_id"), fp.as("fingerprint")),
        "audio_id", "fingerprint", FpHamK)
      .withColumnRenamed("a", "a_id").withColumnRenamed("b", "b_id")
      .orderBy("a_id", "b_id")
  }

  private def q83Sql = {
    val w = N / FpWin
    // 1 << k as a BIGINT literal (k = 63 prints Long.MinValue, which
    // DuckDB parses via HUGEINT then casts back — the q77 trick)
    val bitval = "CASE a.k " + (0 until FpWin).map(k =>
      s"WHEN $k THEN CAST(${1L << k} AS BIGINT)").mkString(" ") + " END"
    val perturb = s"(CASE WHEN i % 13 = 0 THEN" +
      s" (((t * 29 + i * 31) * 2654435761) % 4294967296 % 1025 - 512)" +
      s" ELSE 0 END)"
    s"""$samplesCte,
       |a2 AS (SELECT printf('aud_%05d', t) AS id, i, v FROM s
       |  UNION ALL
       |  SELECT printf('audv_%05d', t), i, v + $perturb FROM s),
       |e AS (SELECT id, i // $w AS k, SUM(v * v) AS e
       |  FROM a2 GROUP BY 1, 2),
       |fp AS (SELECT a.id,
       |    CAST(SUM(CASE WHEN a.e > b.e THEN $bitval ELSE 0 END)
       |      AS BIGINT) AS fingerprint
       |  FROM e a JOIN e b ON a.id = b.id AND b.k = (a.k + 1) % $FpWin
       |  GROUP BY 1)
       |SELECT a.id AS a_id, b.id AS b_id,
       |  CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS INT)
       |    AS hamming
       |FROM fp a JOIN fp b ON a.id < b.id
       |WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= $FpHamK
       |ORDER BY 1, 2""".stripMargin
  }
}
