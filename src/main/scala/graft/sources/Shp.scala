package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import graft.core.Polygon

/** Pure-JVM ESRI shapefile (.shp main file) codec for polygon layers —
  * the reference's vector surface is `readOGR` over a shapefile
  * (`Supplemental_Data_1.R:884,893`); a real user holds .shp bytes, not
  * WKT. Implements the needed subset of the PUBLIC spec ("ESRI
  * Shapefile Technical Description", July 1998):
  *
  *  - 100-byte header: file code 9994 (big-endian), file length in
  *    16-bit words (BE), version 1000 (little-endian), shape type,
  *    bounding box (LE doubles);
  *  - records: (record number BE, content length BE in words) then
  *    LE content: shape type 5 = Polygon — box, NumParts, NumPoints,
  *    part offsets, (x, y) doubles;
  *  - MULTI-PART records (holes / island multipolygons — what real
  *    continental-boundary layers contain) pack every part into one
  *    CSR multi-ring Polygon; the even-odd ray-cast over all rings'
  *    edges gives the spec's fill semantics without any orientation
  *    bookkeeping, so ring winding order is accepted as-is;
  *  - each ring is CLOSED on disk (first vertex repeated last); parse
  *    drops each ring's closing vertex to match the engine's open-ring
  *    convention (same as the WKT path);
  *  - non-polygon shape types are rejected loudly — never misread;
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

  /** Write a polygon layer (the fixture/sink side); multi-ring
    * polygons become multi-part records, one closed part per ring. The
    * .shp main file has no id field — parse() reports the RECORD
    * NUMBER — so polygons must arrive in id order 1..n; arbitrary ids
    * belong in a sidecar .dbf (encodeDbf + shpPolygonsWithAttr), and
    * silently renumbering a layer here would corrupt every downstream
    * PIP join. */
  def encode(polys: Array[Polygon]): Array[Byte] = {
    require(polys.nonEmpty,
      "refusing to encode an empty polygon layer: the header bounding " +
        "box is undefined — write at least one polygon")
    polys.zipWithIndex.foreach { case (p, i) =>
      require(p.regionId == i + 1,
        s"polygon $i has regionId ${p.regionId}, but .shp records carry " +
          "only their 1-based record number — reorder to ids 1..n or " +
          "write the ids to a sidecar .dbf (encodeDbf)")
    }
    val contents = polys.map { p =>
      val nRings = p.nRings
      val nPts = p.xs.length + nRings // one closing vertex per ring
      val content = ByteBuffer
        .allocate(4 + 32 + 4 + 4 + 4 * nRings + 16 * nPts)
        .order(ByteOrder.LITTLE_ENDIAN)
      content.putInt(PolygonType)
      content.putDouble(p.minX).putDouble(p.minY)
        .putDouble(p.maxX).putDouble(p.maxY)
      content.putInt(nRings) // NumParts
      content.putInt(nPts)
      (0 until nRings).foreach { r => // part start = open start + r closers
        content.putInt(p.ringStarts(r) + r)
      }
      (0 until nRings).foreach { r =>
        val (s, e) = p.ringRange(r)
        ((s until e) :+ s).foreach { i => // closed ring
          content.putDouble(p.xs(i)).putDouble(p.ys(i))
        }
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

  // ------------------------------------------------------------- .dbf

  /** Write a minimal dBASE III attribute table with one numeric column
    * (the fixture/sink side of the attribute join). */
  def encodeDbf(column: String, values: Array[Long]): Array[Byte] = {
    require(column.length <= 10, "dBASE field names are <= 10 chars")
    val fieldLen = 18
    values.foreach(v => require(v.toString.length <= fieldLen,
      s"value $v does not fit the N($fieldLen) field"))
    val recordSize = 1 + fieldLen // deletion flag + one field
    val headerSize = 32 + 32 + 1 // header + one descriptor + 0x0D
    val out = ByteBuffer
      .allocate(headerSize + values.length * recordSize + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(0x03.toByte) // dBASE III, no memo
    out.put(Array[Byte](99, 1, 1)) // last-update stamp (yy, mm, dd)
    out.putInt(values.length)
    out.putShort(headerSize.toShort)
    out.putShort(recordSize.toShort)
    out.position(32)
    val name = column.getBytes("US-ASCII")
    out.put(java.util.Arrays.copyOf(name, 11))
    out.put('N'.toByte) // numeric
    out.position(32 + 16)
    out.put(fieldLen.toByte)
    out.put(0.toByte) // decimal count
    out.position(headerSize - 1)
    out.put(0x0D.toByte)
    values.foreach { v =>
      out.put(0x20.toByte) // active record
      val s = v.toString
      out.put((" " * (fieldLen - s.length) + s).getBytes("US-ASCII"))
    }
    out.put(0x1A.toByte) // EOF
    out.array()
  }

  /** Read one NUMERIC column of a dBASE III .dbf attribute table, in
    * record order (which the shapefile spec ties to .shp record order).
    * Deleted records yield None so indexes stay aligned. */
  def dbfColumn(bytes: Array[Byte], column: String): Array[Option[Long]] = {
    require(bytes.length >= 32, "truncated dbf: no header")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = b.getInt(4)
    val headerSize = b.getShort(8) & 0xFFFF
    val recordSize = b.getShort(10) & 0xFFFF
    require(nRec >= 0 && headerSize >= 65 && recordSize >= 1 &&
      headerSize.toLong + nRec.toLong * recordSize <= bytes.length,
      s"corrupt dbf header: n=$nRec header=$headerSize record=$recordSize")
    // walk the 32-byte field descriptors to find the column's offset
    var fOff = 32
    var colOff = -1
    var colLen = -1
    var within = 1 // record offset 0 is the deletion flag
    while (fOff + 32 <= headerSize - 1 && bytes(fOff) != 0x0D) {
      val rawName = bytes.slice(fOff, fOff + 11)
      val end0 = rawName.indexOf(0.toByte)
      val nm = new String(rawName, 0, if (end0 < 0) 11 else end0,
        "US-ASCII").trim
      val typ = bytes(fOff + 11).toChar
      val len = bytes(fOff + 16) & 0xFF
      if (nm.equalsIgnoreCase(column)) {
        require(typ == 'N' || typ == 'F',
          s"dbf column $column has type $typ, expected numeric")
        // hostile descriptors can overdeclare lengths past the record
        require(within + len <= recordSize,
          s"corrupt dbf: field $nm at offset $within length $len " +
            s"exceeds record size $recordSize")
        colOff = within
        colLen = len
      }
      within += len
      fOff += 32
    }
    require(colOff >= 0, s"dbf column not found: $column")
    Array.tabulate(nRec) { i =>
      val r = headerSize + i * recordSize
      if (bytes(r) != 0x20) None // deleted record
      else {
        val s = new String(bytes, r + colOff, colLen, "US-ASCII").trim
        if (s.isEmpty) None else Some(s.toDouble.toLong)
      }
    }
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
        require(nParts >= 1 && nPts >= 4 * nParts.toLong &&
          contentBytes == 4 + 32 + 4 + 4 + 4L * nParts + 16L * nPts,
          s"record $recNum: inconsistent counts parts=$nParts pts=$nPts " +
            s"content=$contentBytes")
        // part start indices: ascending, first 0, all < nPts (spec §
        // Polygon record) — hostile offsets fail loudly, never misread
        val parts = Array.tabulate(nParts)(p => le.getInt(start + 44 + 4 * p))
        require(parts(0) == 0,
          s"record $recNum: part 0 must start at point 0")
        var p = 1
        while (p < nParts) {
          require(parts(p) > parts(p - 1) && parts(p) < nPts,
            s"record $recNum: part starts not ascending/in-range: " +
              parts.mkString(","))
          p += 1
        }
        val ptsOff = start + 44 + 4 * nParts
        // each part is a CLOSED ring; drop its closing vertex and pack
        // all rings into one open-ring CSR Polygon (holes/multipolygons
        // fall out of the even-odd ray-cast over all rings' edges)
        val xsB = Array.newBuilder[Double]
        val ysB = Array.newBuilder[Double]
        val ringStarts = new Array[Int](nParts)
        var packed = 0
        p = 0
        while (p < nParts) {
          val s0 = parts(p)
          val e0 = if (p + 1 < nParts) parts(p + 1) else nPts
          require(e0 - s0 >= 4,
            s"record $recNum: ring $p has ${e0 - s0} points, need >= 4")
          require(
            le.getDouble(ptsOff + s0 * 16) == le.getDouble(ptsOff + (e0 - 1) * 16) &&
            le.getDouble(ptsOff + s0 * 16 + 8) == le.getDouble(ptsOff + (e0 - 1) * 16 + 8),
            s"record $recNum: ring $p must be closed")
          ringStarts(p) = packed
          var i = s0
          while (i < e0 - 1) { // drop the closing vertex
            xsB += le.getDouble(ptsOff + i * 16)
            ysB += le.getDouble(ptsOff + i * 16 + 8)
            i += 1
          }
          packed += e0 - 1 - s0
          p += 1
        }
        out += Polygon(recNum, xsB.result(), ysB.result(), ringStarts)
      }
      pos = (start + contentBytes).toInt
    }
    out.result()
  }
}
