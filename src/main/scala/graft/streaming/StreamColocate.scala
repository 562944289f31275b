package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING CO-LOCATION JOIN — the incremental twin of batch q182's
  * rendezvous detection as a Spark STREAM-STREAM inner join: fleet A
  * pings explode to their 3×3 spatial cell neighborhood, fleet B posts
  * its home cell, and the engines join on the cell pair under a
  * bounded event-time range (|Δt| <= `slack`), with the exact integer
  * d² predicate riding the join condition. Watermarks on BOTH inputs
  * bound the engine's join state to rate × (watermark + slack) per
  * side — the standard interval-join economics (the attributionJoin
  * shape, plus the spatial key). Each qualifying ping pair still
  * matches exactly once: B's home cell is unique, so exactly one of
  * A's nine exploded rows equi-joins it. */
object StreamColocate {

  /** Both inputs carry (e: Long, ts: Timestamp, x: Long, y: Long).
    * Emits one row per co-located ping pair: (a_e, b_e, a_ts, d2). */
  def contacts(fleetA: DataFrame, fleetB: DataFrame, r2: Long = 100L,
      cellShift: Int = 4, slack: String = "2 seconds",
      watermark: String = "10 minutes"): DataFrame = {
    // the 3x3 cell-neighborhood join is exhaustive only while the
    // contact radius fits inside one cell — fail loudly on misuse
    // instead of silently dropping qualifying contacts (the q174/q183
    // licensing argument)
    require(r2 <= (1L << cellShift) * (1L << cellShift),
      s"contact radius² $r2 exceeds cell size² ${1L << (2 * cellShift)} " +
        s"(cellShift=$cellShift): the 3x3 neighborhood join would miss " +
        "qualifying contacts; raise cellShift")
    val offs = Seq(-1L, 0L, 1L)
    val a = fleetA.withWatermark("ts", watermark)
      .withColumn("oc", explode(array(offs.flatMap(dx => offs.map(dy =>
        struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)))
      .select(col("e").as("a_e"), col("ts").as("a_ts"),
        col("x").as("ax"), col("y").as("ay"),
        (shiftright(col("x"), cellShift) + col("oc.dx")).as("cx"),
        (shiftright(col("y"), cellShift) + col("oc.dy")).as("cy"))
      .alias("a")
    val b = fleetB.withWatermark("ts", watermark)
      .select(col("e").as("b_e"), col("ts").as("b_ts"),
        col("x").as("bx"), col("y").as("by"),
        shiftright(col("x"), cellShift).as("cx"),
        shiftright(col("y"), cellShift).as("cy"))
      .alias("b")
    a.join(b,
        expr(s"""a.cx = b.cx AND a.cy = b.cy
          AND b.b_ts >= a.a_ts - INTERVAL '$slack'
          AND b.b_ts <= a.a_ts + INTERVAL '$slack'
          AND (a.ax - b.bx) * (a.ax - b.bx)
            + (a.ay - b.by) * (a.ay - b.by) <= $r2"""))
      .select(col("a.a_e").as("a_e"), col("b.b_e").as("b_e"),
        col("a.a_ts").as("a_ts"),
        ((col("a.ax") - col("b.bx")) * (col("a.ax") - col("b.bx")) +
          (col("a.ay") - col("b.by")) * (col("a.ay") - col("b.by")))
          .as("d2"))
  }
}
