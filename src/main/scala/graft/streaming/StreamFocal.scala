package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.Codec
import graft.sql.Focal3x3
import graft.world.WorldSpec

/** Incremental FOCAL (stencil) map algebra — the streaming shape of
  * batch q93: image tiles arrive continuously and in any order, and a
  * tile's 3x3 window stats can only be computed once all of its
  * neighbors' border pixels exist. The batch plan's single halo
  * shuffle becomes STATEFUL HALO ASSEMBLY: each arriving tile fans its
  * border pixels out to the <=4 neighbor patches that need them (plus
  * an empty MARKER per in-grid neighbor, so completeness is countable
  * even when a contributed border is all padding), and keyed state per
  * DESTINATION tile accumulates contributions until the last expected
  * contributor lands — at which point the patch is assembled, the SAME
  * [[Focal3x3]] kernel as batch q93 runs over it, the stencil rows are
  * emitted, and the state is removed. Exactly-once per tile by
  * construction: emission and state removal happen in the same
  * invocation, and a re-arriving source tile is ignored (first
  * contribution wins).
  *
  * Scale shape: state is keyed by dest tile so it partitions like any
  * shuffle; per open tile the state is <= one (T+2)^2 patch's (pos, v)
  * pairs plus a contributor set of <= 9 ids, and a tile's state lives
  * only from its first contribution to its last — on an in-order feed
  * that is one tile row's worth of halo, not the world. A tile whose
  * neighborhood never completes within `horizonMs` past the watermark
  * is EVICTED WITHOUT EMITTING (an in-grid neighbor missing past the
  * horizon is upstream data loss; emitting a partial stencil would
  * silently change q93's window semantics — the drop is the honest
  * failure mode, and the batch path exists for backfill).
  */
object StreamFocal {

  /** One arriving tile of the input_hint table (event-time `ts`). */
  final case class TileEv(tile_id: Int, bytes: Array[Byte], fmt: String,
      ts: java.sql.Timestamp)

  /** One tile's contribution to one destination patch: the (pos, v)
    * pairs of its pixels that fall inside dest's 1-pixel halo ring or
    * core (empty for an all-padding border — the marker case). */
  final case class Contrib(dest_tile: Int, src_tile: Int,
      pos: Array[Int], v: Array[Double], ts: java.sql.Timestamp)

  /** Output row — identical packing split to batch q93. */
  final case class FocalRow(cell_id: Long, fsum: Long, ncnt: Int,
      peak: Int)

  /** The streaming q93: tiles (tile_id, bytes, fmt, ts) -> completed
    * tiles' stencil rows, Append mode. */
  def focalByTile(tiles: DataFrame, sp: WorldSpec,
      watermark: String = "1 hour",
      horizonMs: Long = 3600L * 1000): Dataset[FocalRow] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    require(horizonMs > 0, "completion horizon must be positive")
    tiles.select(col("tile_id").cast("int"), col("bytes"), col("fmt"),
        col("ts"))
      .as[TileEv]
      .flatMap(t => contribs(sp, t))
      .withWatermark("ts", watermark)
      .groupByKey(_.dest_tile)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(assemble(sp, horizonMs))
  }

  /** Fan one tile out to every in-grid (dty, dtx) neighbor offset —
    * the same border rule as the batch haloPatches fanout (a pixel
    * feeds a neighbor's patch only from the matching border), with NaN
    * padding pixels dropped at decode. Every in-grid offset gets a row
    * even when no pixel qualifies: the marker that makes the
    * contributor count deterministic. */
  private[streaming] def contribs(sp: WorldSpec, t: TileEv): Seq[Contrib] = {
    val T = sp.tile
    val P = T + 2
    val ty = t.tile_id / sp.tilesX
    val tx = t.tile_id % sp.tilesX
    if (ty < 0 || ty >= sp.tilesY || tx < 0 || tx >= sp.tilesX)
      return Seq.empty // out-of-grid id: nothing to contribute
    val band = Codec.decodeBand(t.fmt, t.bytes, sp.pixPerTile, 1)
    val out = Seq.newBuilder[Contrib]
    var dty = -1
    while (dty <= 1) {
      var dtx = -1
      while (dtx <= 1) {
        val ty2 = ty + dty
        val tx2 = tx + dtx
        if (ty2 >= 0 && ty2 < sp.tilesY && tx2 >= 0 && tx2 < sp.tilesX) {
          val pos = Array.newBuilder[Int]
          val vs = Array.newBuilder[Double]
          val rLo = if (dty == 1) T - 1 else 0
          val rHi = if (dty == -1) 0 else T - 1
          val cLo = if (dtx == 1) T - 1 else 0
          val cHi = if (dtx == -1) 0 else T - 1
          var rr = rLo
          while (rr <= rHi) {
            var cc = cLo
            while (cc <= cHi) {
              val v = band(rr * T + cc)
              if (!java.lang.Float.isNaN(v)) {
                pos += (rr - dty * T + 1) * P + (cc - dtx * T + 1)
                vs += v.toDouble
              }
              cc += 1
            }
            rr += 1
          }
          out += Contrib(ty2 * sp.tilesX + tx2, t.tile_id,
            pos.result(), vs.result(), t.ts)
        }
        dtx += 1
      }
      dty += 1
    }
    out.result()
  }

  /** In-grid tiles in dest's 3x3 tile neighborhood (incl. itself) —
    * the completion target. */
  private def expectedContributors(sp: WorldSpec, dest: Int): Int = {
    val ty = dest / sp.tilesX
    val tx = dest % sp.tilesX
    var n = 0
    for (dy <- -1 to 1; dx <- -1 to 1)
      if (ty + dy >= 0 && ty + dy < sp.tilesY &&
          tx + dx >= 0 && tx + dx < sp.tilesX) n += 1
    n
  }

  private def assemble(sp: WorldSpec, horizonMs: Long)(dest: Int,
      rows: Iterator[Contrib],
      state: GroupState[Seq[(Int, Array[Int], Array[Double])]])
      : Iterator[FocalRow] = {
    if (state.hasTimedOut) { // incomplete past the horizon: evict
      state.remove()
      return Iterator.empty
    }
    var seen = state.getOption.getOrElse(Seq.empty)
    val batch = rows.toSeq
    val have = scala.collection.mutable.Set(seen.map(_._1): _*)
    batch.foreach { c => // first contribution per source wins
      if (have.add(c.src_tile)) seen = seen :+ ((c.src_tile, c.pos, c.v))
    }
    if (have.size >= expectedContributors(sp, dest)) {
      state.remove()
      emit(sp, dest, seen)
    } else {
      state.update(seen)
      state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs(),
        batch.map(_.ts.getTime).max) + horizonMs)
      Iterator.empty
    }
  }

  /** Assemble the padded patch and run the batch kernel verbatim. */
  private def emit(sp: WorldSpec, dest: Int,
      seen: Seq[(Int, Array[Int], Array[Double])]): Iterator[FocalRow] = {
    val T = sp.tile
    val pos = seen.iterator.flatMap(_._2.iterator).toArray
    val vs = seen.iterator.flatMap(_._3.iterator).toArray
    val packed = Focal3x3.eval(ArrayData.toArrayData(pos),
      ArrayData.toArrayData(vs), T)
    val ty0 = (dest / sp.tilesX).toLong * T
    val tx0 = (dest % sp.tilesX).toLong * T
    (0 until T * T).iterator.flatMap { p =>
      val f = packed.getLong(p)
      if (f < 0) Iterator.empty // edge-tile padding positions
      else Iterator.single(FocalRow(
        (ty0 + p / T) * sp.cols + tx0 + p % T + 1,
        f >> 5, ((f >> 1) & 15L).toInt, (f & 1L).toInt))
    }
  }
}
