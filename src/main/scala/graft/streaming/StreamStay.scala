package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One trajectory ping (streaming twin of the batch q181 walk rows):
  * entity, event-time tick (1 tick = 1 s of event time), position. */
final case class PingEv(e: Long, ts: java.sql.Timestamp, x: Long, y: Long)

/** An emitted stay-point: visit span [t0, t1] in ticks, ping count and
  * exact centroid numerators — the batch q181 row minus the segment
  * ordinal (streaming emission order replaces it). */
final case class StayRow(e: Long, t0: Long, t1: Long, n: Long,
    sx: Long, sy: Long)

/** Per-entity fold state: the open segment's aggregates, the last
  * processed ping (break detection needs the previous position), and
  * the not-yet-ripe buffer. lastT = -1 means no ping processed yet. */
final case class StaySt(lastT: Long, lastX: Long, lastY: Long,
    n: Long, sx: Long, sy: Long, t0: Long, buf: List[(Long, Long, Long)])

/** STREAMING STAY-POINT DETECTION — the incremental twin of batch
  * q181: a segment keeps absorbing pings while each step's squared
  * displacement stays within r2, breaks on a larger jump, and a
  * maximal segment with >= minN pings emits as a stay. Out-of-order
  * pings buffer until the event-time watermark ripens them (the
  * funnel/SCD2 discipline), so the fold always sees ascending ticks;
  * the OPEN segment closes when the watermark passes one tick beyond
  * its last ping — at that point an in-time continuation can no longer
  * arrive, the exact streaming analogue of the batch fixture's
  * contiguous ticks. State is one open segment + the ripening buffer
  * per entity; nothing grows with stream length. */
object StreamStay {

  private val TickMs = 1000L

  def stayPoints(pings: DataFrame, r2: Long = 18L, minN: Long = 5L,
      watermark: String = "10 minutes"): Dataset[StayRow] = {
    val spark = pings.sparkSession
    import spark.implicits._
    pings
      .withWatermark("ts", watermark)
      .select(col("e"), col("ts"), col("x"), col("y"))
      .as[PingEv]
      .groupByKey(_.e)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(foldStays(r2, minN))
  }

  private def foldStays(r2: Long, minN: Long)(e: Long,
      rows: Iterator[PingEv],
      state: GroupState[StaySt]): Iterator[StayRow] = {
    val prev = state.getOption.getOrElse(
      StaySt(-1L, 0L, 0L, 0L, 0L, 0L, 0L, Nil))
    val arrived = rows.map(p => (p.ts.getTime, p.x, p.y)).toList
    val wm = state.getCurrentWatermarkMs()
    val (ripe, hold) = (prev.buf ++ arrived).partition(_._1 <= wm)
    val out = List.newBuilder[StayRow]
    var st = prev.copy(buf = Nil)
    def close(): Unit = {
      if (st.lastT >= 0 && st.n >= minN)
        out += StayRow(e, st.t0 / TickMs, st.lastT / TickMs,
          st.n, st.sx, st.sy)
      st = st.copy(n = 0L, sx = 0L, sy = 0L)
    }
    ripe.sortBy(_._1).foreach { case (tMs, x, y) =>
      val dx = x - st.lastX
      val dy = y - st.lastY
      // close on an EVENT-TIME GAP as well as on displacement: a ping
      // more than one tick after the segment's last ping continues a
      // segment the close-timeout contract already declared closed —
      // without this, buffered out-of-order arrivals (whose wakeup
      // overwrites the close timeout) could merge into it, making
      // output depend on micro-batch interleaving. With it, the
      // hold-nonEmpty and timeout paths produce identical stays
      // regardless of arrival order.
      if (st.lastT >= 0 &&
          (tMs > st.lastT + TickMs || dx * dx + dy * dy > r2)) close()
      val opening = st.n == 0
      st = StaySt(tMs, x, y, st.n + 1, st.sx + x, st.sy + y,
        if (opening) tMs else st.t0, Nil)
    }
    if (hold.nonEmpty) {
      // buffered pings ripen progressively: wake at the oldest one
      state.update(st.copy(buf = hold))
      state.setTimeoutTimestamp(hold.map(_._1).min + 1)
    } else if (st.lastT >= 0 && wm > st.lastT + TickMs) {
      // no continuation can arrive in time any more: flush and clear
      close()
      state.remove()
    } else if (st.lastT >= 0) {
      state.update(st)
      state.setTimeoutTimestamp(st.lastT + TickMs + 1)
    } else state.remove()
    out.result().iterator
  }
}
