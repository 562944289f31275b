package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Multimodal
import graft.world.World

/** Video-modality near-dup — the fourth and last leg of the dedup
  * pipeline (text MinHash q45-q56, image phash q77/q78, audio
  * fingerprint q83, video = this): two videos are near-duplicates when
  * MOST of their sampled frames look alike, not when a single global
  * signature collides — a per-frame vote is what makes video dedup
  * robust to intros/outros and single-frame glitches.
  *
  * Pipeline shape (all reused engine pieces):
  *   1. frame-sample every 4th frame (the q79 stride — plan-constant
  *      indices, one codegen'd `FramePhash` byte-slice decode each);
  *   2. 64-bit block-mean phash per sampled frame (`Codec.phash`, the
  *      same signature definition as the input table's phash column);
  *   3. frame-ALIGNED candidate pairs via the shared pigeonhole
  *      banding (`TextOps.hammingPairs` with `alignCols = frame_idx`:
  *      the shuffle key is (frame_idx, band, chunk), so only same-
  *      position frames are ever compared — replication factor still
  *      exactly 4, recall exact for hamming <= 3 per frame);
  *   4. >=2-of-3 frame vote per video pair (groupBy on the pair —
  *      one shuffle keyed by the pair id).
  *
  * Scale: no O(n^2) anywhere; both shuffles are keyed (band bucket,
  * then pair id). At 10^12 videos the banding inherits q77's stated
  * widening (permuted-bit tables / salted hot chunks) unchanged,
  * because it IS the same operator.
  *
  * Fixture: each base video gets one perturbed VARIANT
  * (`World.vidPerturb` — a transcode stand-in, ~1/9 of pixels shifted
  * by a dyadic delta), tuned so the 24 variant pairs split 6/11/4/3
  * across 3/2/1/0 frames matched: 17 pairs pass the vote, 7 fail, and
  * no cross-tile pair matches on any frame (World.vid uses the
  * nonlinear `h2` precisely to guarantee that independence). The
  * oracle rebuilds every frame's phash from the dyadic cell formulas
  * in SQL (all block means exact in double) and brute-force-verifies
  * the vote, so the compare also proves the banded plan's pigeonhole
  * completeness end to end. */
object Video {

  def all: Seq[Q] = Seq(Q("q85_video_neardup", q85, Some(q85Sql)))

  private val spec = World.tiny
  private val T = spec.tile
  private val C = spec.cols
  /** Frame-sample stride (same cadence as q79). */
  private val Stride = 4
  private def sampledFrames: Seq[Int] =
    0 until Multimodal.VideoFrames by Stride
  /** Per-frame hamming radius (4x16-bit pigeonhole: exact recall). */
  private val HamK = 3
  /** Frames (of the 3 sampled) that must match for a pair verdict. */
  private val MinVote = 2

  private def q85(s: SparkSession, dir: String): DataFrame = {
    import graft.sql.GraftFunctions.frame_phash
    val vids = Multimodal.syntheticVideo(s)
      .unionByName(Multimodal.syntheticVideoVariants(s))
    val perFrame = vids.select(col("video_id"),
        explode(array(sampledFrames.map(f =>
          struct(lit(f).as("frame_idx"),
            frame_phash(col("bytes"), col("fmt"), spec.pixPerTile, f, T, T)
              .as("fphash"))): _*)).as("fr"))
      .select(col("video_id"), col("fr.frame_idx").as("frame_idx"),
        col("fr.fphash").as("fphash"))
    TextOps.hammingPairs(perFrame, "video_id", "fphash", HamK,
        alignCols = Seq("frame_idx"))
      .groupBy(col("a").as("a_id"), col("b").as("b_id"))
      .agg(count(lit(1)).cast("int").as("frames_matched"),
        min("hamming").as("min_hamming"))
      .filter(col("frames_matched") >= MinVote)
      .orderBy("a_id", "b_id")
  }

  private def q85Sql: String = {
    val frames = sampledFrames.map(f => s"($f)").mkString(", ")
    val bitval = TextOps.phashBitvalSql
    // within-tile phash block of a cell: 8x8 blocks of (T/8)^2 pixels
    val blk = T / 8
    val rowInTile = s"(CAST(FLOOR((cell_id - 1) / $C) AS BIGINT) % $T)"
    val colInTile = s"(((cell_id - 1) % $C) % $T)"
    s"""WITH cells AS (SELECT r.range + 1 AS cell_id FROM range(${spec.nCells}) r),
       |f(fi) AS (VALUES $frames),
       |px AS (SELECT ${Spatial.tileSql("cell_id")} AS tile_id, fi,
       |    ($rowInTile // $blk) * 8 + $colInTile // $blk AS k,
       |    ${Spatial.vidSql("cell_id", "fi")} AS v,
       |    ${Spatial.vidSql("cell_id", "fi")}
       |      + ${Spatial.vidPerturbSql("cell_id", "fi")} AS vv
       |  FROM cells, f),
       |a2 AS (SELECT printf('vid_%05d', tile_id) AS id, fi, k, v FROM px
       |  UNION ALL
       |  SELECT printf('vidv_%05d', tile_id), fi, k, vv FROM px),
       |blk AS (SELECT id, fi, k, SUM(v) / COUNT(*) AS m
       |  FROM a2 GROUP BY 1, 2, 3),
       |gm AS (SELECT id, fi, SUM(v) / COUNT(*) AS g FROM a2 GROUP BY 1, 2),
       |fp AS (SELECT b.id, b.fi,
       |    CAST(SUM(CASE WHEN m > g THEN $bitval ELSE 0 END) AS BIGINT) AS ph
       |  FROM blk b JOIN gm USING (id, fi) GROUP BY 1, 2),
       |pf AS (SELECT a.id AS a_id, b.id AS b_id,
       |    bit_count(xor(a.ph, b.ph)) AS hm
       |  FROM fp a JOIN fp b ON a.fi = b.fi AND a.id < b.id
       |  WHERE bit_count(xor(a.ph, b.ph)) <= $HamK)
       |SELECT a_id, b_id, CAST(COUNT(*) AS INT) AS frames_matched,
       |  CAST(MIN(hm) AS INT) AS min_hamming
       |FROM pf GROUP BY 1, 2 HAVING COUNT(*) >= $MinVote
       |ORDER BY 1, 2""".stripMargin
  }
}
