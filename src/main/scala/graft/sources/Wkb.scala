package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import graft.core.Polygon

/** Pure-JVM WKB (well-known BINARY) codec for polygon layers — the
  * binary twin of the WKT path (S6): WKB is what PostGIS/GeoPackage
  * pipelines hand over when geometry leaves a database, so a real user
  * holds these bytes as often as .shp or WKT text. Implements the
  * needed subset of the PUBLIC OGC Simple Features spec (OGC 06-103r4
  * §8.2.8, "Well-known Binary Representation for Geometry"):
  *
  *  - each geometry: 1 byte order byte (0 = XDR/big-endian, 1 =
  *    NDR/little-endian — BOTH accepted, and the order byte governs
  *    everything that follows), uint32 geometry type, payload;
  *  - type 3 POLYGON: numRings, then per ring numPoints + (x, y)
  *    doubles; rings are CLOSED on the wire (first point repeated
  *    last) and the parse drops each closing vertex to the engine's
  *    open-ring convention — exactly the WKT/Shp discipline;
  *  - type 6 MULTIPOLYGON: numPolygons nested child POLYGONs (each
  *    with its OWN byte-order byte per spec); all parts' rings flatten
  *    into one CSR multi-ring Polygon — the even-odd ray-cast over the
  *    union of rings realizes fill semantics with no orientation
  *    bookkeeping (same argument as Shp multi-part records);
  *  - other geometry types are rejected loudly, never misread.
  *
  * The FILE layout mirrors the WKT line model (WKB itself carries no
  * feature id): repeated records of [int32 LE regionId][WKB geometry].
  * Like GeoTiff/Shp this parses untrusted executor-side bytes, so all
  * counts are bounds-checked with loud failures. */
object Wkb {

  private val PolygonType = 3
  private val MultiPolygonType = 6

  /** Encode a polygon layer to the record stream (little-endian WKB
    * POLYGON per feature, all rings in one geometry). Inverse of
    * [[decode]] for any engine layer; the decode side additionally
    * accepts big-endian and MULTIPOLYGON inputs it did not write. */
  def encode(polys: Array[Polygon]): Array[Byte] = {
    require(polys.nonEmpty, "Wkb.encode: empty polygon layer (a sink " +
      "would silently write a headerless empty file — refuse loudly)")
    val size = polys.map { p =>
      4 + 1 + 4 + 4 + (0 until p.nRings).map { r =>
        val (s, e) = p.ringRange(r)
        4 + 16 * (e - s + 1)
      }.sum
    }.sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    polys.foreach { p =>
      bb.putInt(p.regionId)
      bb.put(1.toByte) // NDR
      bb.putInt(PolygonType)
      bb.putInt(p.nRings)
      (0 until p.nRings).foreach { r =>
        val (s, e) = p.ringRange(r)
        bb.putInt(e - s + 1)
        (s until e).foreach { i => bb.putDouble(p.xs(i)); bb.putDouble(p.ys(i)) }
        bb.putDouble(p.xs(s)); bb.putDouble(p.ys(s)) // close the ring
      }
    }
    bb.array()
  }

  /** Decode a record stream back to the packed polygon layer. */
  def decode(bytes: Array[Byte]): Array[Polygon] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = Array.newBuilder[Polygon]
    while (bb.remaining() > 0) {
      require(bb.remaining() >= 5, s"Wkb: truncated record header at " +
        s"offset ${bb.position()}")
      bb.order(ByteOrder.LITTLE_ENDIAN)
      val rid = bb.getInt
      val (xs, ys, starts) = readGeometry(bb)
      out += Polygon(rid, xs, ys, starts)
    }
    out.result().sortBy(_.regionId)
  }

  /** One WKB geometry (order byte + type + payload) → flattened CSR
    * rings. Recurses one level for MULTIPOLYGON children. */
  private def readGeometry(bb: ByteBuffer): (Array[Double], Array[Double], Array[Int]) = {
    val order = bb.get()
    require(order == 0 || order == 1, s"Wkb: bad byte-order byte $order")
    bb.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val tpe = bb.getInt
    tpe match {
      case PolygonType =>
        readPolygonBody(bb)
      case MultiPolygonType =>
        val nParts = bb.getInt
        require(nParts > 0 && nParts <= 100000, s"Wkb: bad part count $nParts")
        val xs = Array.newBuilder[Double]
        val ys = Array.newBuilder[Double]
        val starts = Array.newBuilder[Int]
        var base = 0
        (0 until nParts).foreach { _ =>
          val saved = bb.order()
          val (px, py, ps) = readGeometryAsPolygon(bb)
          bb.order(saved) // child order byte must not leak to siblings
          ps.foreach(s => starts += base + s)
          xs ++= px; ys ++= py
          base += px.length
        }
        (xs.result(), ys.result(), starts.result())
      case other =>
        throw new IllegalArgumentException(
          s"Wkb: unsupported geometry type $other (only POLYGON=3 / " +
            "MULTIPOLYGON=6)")
    }
  }

  /** A MULTIPOLYGON child: must itself be a POLYGON geometry. */
  private def readGeometryAsPolygon(bb: ByteBuffer): (Array[Double], Array[Double], Array[Int]) = {
    val order = bb.get()
    require(order == 0 || order == 1, s"Wkb: bad child byte-order byte $order")
    bb.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val tpe = bb.getInt
    require(tpe == PolygonType,
      s"Wkb: MULTIPOLYGON child must be POLYGON, got $tpe")
    readPolygonBody(bb)
  }

  private def readPolygonBody(bb: ByteBuffer): (Array[Double], Array[Double], Array[Int]) = {
    val nRings = bb.getInt
    require(nRings > 0 && nRings <= 100000, s"Wkb: bad ring count $nRings")
    val xs = Array.newBuilder[Double]
    val ys = Array.newBuilder[Double]
    val starts = new Array[Int](nRings)
    var base = 0
    (0 until nRings).foreach { r =>
      val n = bb.getInt
      require(n >= 4, s"Wkb: ring $r has $n points (closed rings need >= 4)")
      require(bb.remaining() >= 16L * n,
        s"Wkb: ring $r claims $n points beyond the buffer")
      starts(r) = base
      var i = 0
      var fx = 0.0; var fy = 0.0
      while (i < n) {
        val x = bb.getDouble; val y = bb.getDouble
        if (i == 0) { fx = x; fy = y }
        if (i < n - 1) { xs += x; ys += y } // drop the closing vertex
        else require(x == fx && y == fy,
          s"Wkb: ring $r not closed (last point != first)")
        i += 1
      }
      base += n - 1
    }
    (xs.result(), ys.result(), starts)
  }
}
