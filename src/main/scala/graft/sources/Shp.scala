package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import graft.core.Polygon

/** Pure-JVM ESRI shapefile (.shp main file) codec for single-ring
  * polygon layers — the reference's vector surface is `readOGR` over a
  * shapefile (`Supplemental_Data_1.R:884,893`); a real user holds .shp
  * bytes, not WKT. Implements the needed subset of the PUBLIC spec
  * ("ESRI Shapefile Technical Description", July 1998):
  *
  *  - 100-byte header: file code 9994 (big-endian), file length in
  *    16-bit words (BE), version 1000 (little-endian), shape type,
  *    bounding box (LE doubles);
  *  - records: (record number BE, content length BE in words) then
  *    LE content: shape type 5 = Polygon — box, NumParts, NumPoints,
  *    part offsets, (x, y) doubles;
  *  - polygon rings are CLOSED (first vertex repeated last); parse
  *    drops the closing vertex to match the engine's open-ring
  *    convention (same as the WKT path);
  *  - multi-part records (holes / multipolygons) and non-polygon shape
  *    types are rejected loudly — never silently misread;
  *  - region id = the record number (the layer's FID, what readOGR
  *    exposes when no attribute table is joined).
  *
  * Like the GeoTIFF reader this runs on untrusted executor-side bytes
  * (binaryFile scans), so every offset/count is bounds-checked with a
  * loud failure instead of an IndexOutOfBoundsException.
  */
object Shp {

  private val FileCode = 9994
  private val Version = 1000
  private val PolygonType = 5
  private val NullType = 0

  /** Write a single-ring polygon layer (the fixture/sink side). */
  def encode(polys: Array[Polygon]): Array[Byte] = {
    val contents = polys.map { p =>
      val nPts = p.xs.length + 1 // closing vertex
      val content = ByteBuffer
        .allocate(4 + 32 + 4 + 4 + 4 + 16 * nPts)
        .order(ByteOrder.LITTLE_ENDIAN)
      content.putInt(PolygonType)
      content.putDouble(p.minX).putDouble(p.minY)
        .putDouble(p.maxX).putDouble(p.maxY)
      content.putInt(1) // NumParts
      content.putInt(nPts)
      content.putInt(0) // part 0 starts at point 0
      (p.xs.indices :+ 0).foreach { i =>
        content.putDouble(p.xs(i)).putDouble(p.ys(i))
      }
      content.array()
    }
    val fileLen = 100 + contents.map(8 + _.length).sum
    val out = ByteBuffer.allocate(fileLen)
    out.order(ByteOrder.BIG_ENDIAN)
    out.putInt(FileCode)
    (1 to 5).foreach(_ => out.putInt(0))
    out.putInt(fileLen / 2) // in 16-bit words
    out.order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(Version).putInt(PolygonType)
    out.putDouble(polys.map(_.minX).min).putDouble(polys.map(_.minY).min)
      .putDouble(polys.map(_.maxX).max).putDouble(polys.map(_.maxY).max)
    (1 to 4).foreach(_ => out.putDouble(0.0)) // Z/M ranges unused
    polys.indices.foreach { i =>
      out.order(ByteOrder.BIG_ENDIAN)
      out.putInt(i + 1) // record number, 1-based
      out.putInt(contents(i).length / 2)
      out.order(ByteOrder.LITTLE_ENDIAN)
      out.put(contents(i))
    }
    out.array()
  }

  /** Parse a .shp main file into packed Polygons (regionId = record
    * number). Null-shape records are skipped (the spec allows them). */
  def parse(bytes: Array[Byte]): Array[Polygon] = {
    require(bytes.length >= 100, "truncated shapefile: no header")
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(be.getInt(0) == FileCode,
      s"not a shapefile: file code ${be.getInt(0)}")
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(le.getInt(28) == Version,
      s"unsupported shapefile version ${le.getInt(28)}")
    val fileType = le.getInt(32)
    require(fileType == PolygonType,
      s"only Polygon (type 5) layers supported, got $fileType")
    val declaredLen = be.getInt(24).toLong * 2
    require(declaredLen <= bytes.length,
      s"corrupt header: declared length $declaredLen of ${bytes.length}")

    val out = Array.newBuilder[Polygon]
    var pos = 100
    while (pos + 8 <= declaredLen) {
      val recNum = be.getInt(pos)
      val contentBytes = be.getInt(pos + 4).toLong * 2
      val start = pos + 8
      require(contentBytes >= 4 && start + contentBytes <= bytes.length,
        s"corrupt record $recNum: content length $contentBytes at $pos")
      val shapeType = le.getInt(start)
      if (shapeType != NullType) {
        require(shapeType == PolygonType,
          s"record $recNum: only Polygon (5) or Null (0) shapes " +
            s"supported, got $shapeType")
        require(contentBytes >= 4 + 32 + 8,
          s"corrupt record $recNum: polygon content too short")
        val nParts = le.getInt(start + 36)
        val nPts = le.getInt(start + 40)
        require(nParts == 1,
          s"record $recNum: multi-part polygons (holes/multipolygons) " +
            "are not supported — refusing to misread")
        require(nPts >= 4 &&
          contentBytes == 4 + 32 + 4 + 4 + 4L * nParts + 16L * nPts,
          s"record $recNum: inconsistent counts parts=$nParts pts=$nPts " +
            s"content=$contentBytes")
        require(le.getInt(start + 44) == 0,
          s"record $recNum: part 0 must start at point 0")
        val ptsOff = start + 44 + 4
        val xs = new Array[Double](nPts)
        val ys = new Array[Double](nPts)
        var i = 0
        while (i < nPts) {
          xs(i) = le.getDouble(ptsOff + i * 16)
          ys(i) = le.getDouble(ptsOff + i * 16 + 8)
          i += 1
        }
        require(xs(0) == xs(nPts - 1) && ys(0) == ys(nPts - 1),
          s"record $recNum: polygon ring must be closed")
        out += Polygon(recNum, xs.dropRight(1), ys.dropRight(1))
      }
      pos = (start + contentBytes).toInt
    }
    out.result()
  }
}
