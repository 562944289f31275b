package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM GeoTIFF codec for single-band float32 rasters — the
  * reference's entire input surface is `raster("*.tif")`
  * (`Supplemental_Data_1.R:211,216-218`; 170 GeoTIFFs under
  * `R_ModelInputs_{Primary,Secondary}Data/`), so the engine must decode
  * real GeoTIFF bytes, not only its own f32/png16 tile formats. No GDAL
  * exists in the zero-egress sandbox; this implements the needed subset
  * of TIFF 6.0 (public spec) directly:
  *
  *  - single band (SamplesPerPixel 1), 32-bit IEEE float samples
  *    (BitsPerSample 32, SampleFormat 3) — the reference rasters' layout;
  *  - both byte orders (II little / MM big endian);
  *  - strip AND tile organizations (RowsPerStrip / TileWidth+TileLength,
  *    edge tiles clipped);
  *  - Compression 1 (none) and 5 (TIFF-variant LZW: MSB-first codes,
  *    9->12 bit widths with EARLY code-width change, Clear=256, EOI=257);
  *  - Predictor 1 (none) and 3 (floating-point horizontal byte
  *    differencing per TIFF Technical Note 3 — what GDAL writes for
  *    PREDICTOR=3 LZW float rasters): per row, bytes are
  *    significance-plane-interleaved then horizontally differenced;
  *    decode undoes the delta and de-interleaves. Predictor 2
  *    (integer differencing) cannot apply to float32 samples and is
  *    rejected loudly, not silently misdecoded;
  *  - the Geo tags that `rastOut` stamps (R:66-70): ModelPixelScale
  *    (33550) and ModelTiepoint (33922), read and written.
  *
  * The encoder exists for fixtures and for the vector->raster GeoTIFF
  * sink (the `writeRaster` analog, R:53-72): deterministic output,
  * optional LZW, strip or tiled layout.
  */
object GeoTiff {

  final case class Raster(w: Int, h: Int, pixels: Array[Float],
      pixelScale: Option[(Double, Double)], tiepoint: Option[(Double, Double)])

  // ---------------------------------------------------------------- decode

  def decode(bytes: Array[Byte]): Raster = {
    require(bytes.length >= 8, "truncated TIFF")
    val order =
      if (bytes(0) == 'I'.toByte && bytes(1) == 'I'.toByte)
        ByteOrder.LITTLE_ENDIAN
      else if (bytes(0) == 'M'.toByte && bytes(1) == 'M'.toByte)
        ByteOrder.BIG_ENDIAN
      else throw new IllegalArgumentException("not a TIFF: bad byte-order mark")
    val buf = ByteBuffer.wrap(bytes).order(order)
    require(buf.getShort(2) == 42, "not a TIFF: bad magic")
    val tags = readIfd(buf, buf.getInt(4))
    def one(tag: Int, default: => Double): Double =
      tags.get(tag).filter(_.nonEmpty).map(_(0)).getOrElse(default)

    val w = one(256, -1).toInt
    val h = one(257, -1).toInt
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    val bps = one(258, 1).toInt
    val comp = one(259, 1).toInt
    val spp = one(277, 1).toInt
    val sampleFmt = one(339, 1).toInt
    val predictor = one(317, 1).toInt
    require(bps == 32 && spp == 1 && sampleFmt == 3,
      s"only single-band float32 supported (bps=$bps spp=$spp fmt=$sampleFmt)")
    require(comp == 1 || comp == 5,
      s"compression $comp unsupported (1=none, 5=LZW)")
    require(predictor == 1 || predictor == 3,
      s"predictor $predictor unsupported for float32 " +
        "(1=none, 3=floating-point; refusing to misdecode)")

    // data-chunk bounds check shared by strips and tiles: offsets and
    // counts come from the (untrusted) IFD and are carried as doubles —
    // reject chunks that overflow Int or run past EOF before the
    // toInt + copyOfRange would silently truncate or throw raw
    def chunkRange(off: Double, cnt: Double): (Int, Int) = {
      require(off >= 0 && cnt >= 0 && off + cnt <= bytes.length &&
        off + cnt <= Int.MaxValue.toDouble,
        s"corrupt chunk table: offset $off count $cnt of ${bytes.length}")
      (off.toInt, cnt.toInt)
    }

    // assemble sample bytes in FILE byte order, then view as floats
    val px = new Array[Byte](w * h * 4)
    def unpredict(data: Array[Byte], rows: Int, n: Int): Array[Byte] =
      if (predictor == 3) fpAcc(data, rows, n, order) else data
    if (tags.contains(322)) { // tiled organization
      val tw = tags(322)(0).toInt
      val tl = tags(323)(0).toInt
      val offs = tags(324)
      val cnts = tags(325)
      val across = (w + tw - 1) / tw
      val down = (h + tl - 1) / tl
      require(offs.length == across * down && cnts.length == offs.length,
        "tile table size mismatch")
      var ti = 0
      while (ti < offs.length) {
        val (o, c) = chunkRange(offs(ti), cnts(ti))
        val raw = java.util.Arrays.copyOfRange(bytes, o, o + c)
        val data = unpredict(
          if (comp == 5) lzwDecode(raw, tw * tl * 4) else raw, tl, tw)
        val y0 = (ti / across) * tl
        val x0 = (ti % across) * tw
        val copyW = math.min(tw, w - x0)
        var r = 0
        while (r < tl && y0 + r < h) {
          System.arraycopy(data, r * tw * 4, px, ((y0 + r) * w + x0) * 4,
            copyW * 4)
          r += 1
        }
        ti += 1
      }
    } else { // strip organization
      val offs = tags.getOrElse(273, sys.error("no StripOffsets"))
      val cnts = tags.getOrElse(279, sys.error("no StripByteCounts"))
      // TIFF 6.0 allows RowsPerStrip = 2^32-1 ("all rows in one strip");
      // clamp through Long so the value neither overflows Int nor
      // exceeds the image height.
      val rps = math.min(h.toLong, one(278, h.toDouble).toLong).toInt
      require(rps > 0, s"bad RowsPerStrip $rps")
      require(offs.length == (h + rps - 1) / rps && cnts.length == offs.length,
        "strip table size mismatch")
      var si = 0
      while (si < offs.length) {
        val rowsHere = math.min(rps, h - si * rps)
        val (o, c) = chunkRange(offs(si), cnts(si))
        val raw = java.util.Arrays.copyOfRange(bytes, o, o + c)
        val data = unpredict(
          if (comp == 5) lzwDecode(raw, rowsHere * w * 4) else raw,
          rowsHere, w)
        System.arraycopy(data, 0, px, si * rps * w * 4, rowsHere * w * 4)
        si += 1
      }
    }
    val out = new Array[Float](w * h)
    ByteBuffer.wrap(px).order(order).asFloatBuffer().get(out)
    val scale = tags.get(33550).collect { case a if a.length >= 2 =>
      (a(0), a(1))
    }
    val tie = tags.get(33922).collect { case a if a.length >= 5 =>
      (a(3), a(4)) // model x/y of raster point (0,0)
    }
    Raster(w, h, out, scale, tie)
  }

  /** First IFD as tag -> numeric values (types BYTE/SHORT/LONG/DOUBLE;
    * other types are recorded empty and ignored). */
  private def readIfd(buf: ByteBuffer, off: Int): Map[Int, Array[Double]] = {
    val n = buf.getShort(off) & 0xFFFF
    (0 until n).map { i =>
      val e = off + 2 + i * 12
      val tag = buf.getShort(e) & 0xFFFF
      val typ = buf.getShort(e + 2) & 0xFFFF
      val cnt = buf.getInt(e + 4)
      val elemSize = typ match {
        case 1 => 1
        case 3 => 2
        case 4 => 4
        case 12 => 8
        case _ => 0
      }
      // Long math: a hostile/corrupt count can overflow elemSize * cnt
      // in Int, sneaking past the inline-value test and into a multi-GB
      // allocation; this codec runs on untrusted bytes inside executors
      // (binaryFile scans), so reject loudly instead.
      val total = elemSize.toLong * cnt
      require(cnt >= 0 && total <= buf.capacity(),
        s"corrupt IFD entry: tag $tag type $typ count $cnt")
      // out-of-line values: the offset itself is attacker-controlled
      // too — reject negative / past-EOF offsets instead of dying with
      // a raw IndexOutOfBoundsException deep in the value reads
      val valOff =
        if (total <= 4) e + 8
        else {
          val vo = buf.getInt(e + 8)
          require(vo >= 0 && vo.toLong + total <= buf.capacity(),
            s"corrupt IFD entry: tag $tag value offset $vo count $cnt")
          vo
        }
      val vals =
        if (elemSize == 0) Array.empty[Double]
        else Array.tabulate(cnt) { j =>
          typ match {
            case 1 => (buf.get(valOff + j) & 0xFF).toDouble
            case 3 => (buf.getShort(valOff + j * 2) & 0xFFFF).toDouble
            case 4 => (buf.getInt(valOff + j * 4).toLong & 0xFFFFFFFFL).toDouble
            case 12 => buf.getDouble(valOff + j * 8)
          }
        }
      tag -> vals
    }.toMap
  }

  // -------------------------------------------- Predictor 3 (TechNote 3)

  /** Undo floating-point horizontal differencing on one decoded chunk of
    * `rows` x `n` float32 samples: per row, prefix-sum the byte deltas,
    * then de-interleave the four significance planes (plane 0 = MSB)
    * into values in `order` byte order — the layout the caller's float
    * view expects. Matches libtiff's fpAcc. */
  private def fpAcc(data: Array[Byte], rows: Int, n: Int,
      order: ByteOrder): Array[Byte] = {
    val rowBytes = n * 4
    require(data.length >= rows * rowBytes,
      s"short chunk for predictor 3: ${data.length} < ${rows * rowBytes}")
    val out = new Array[Byte](rows * rowBytes)
    val le = order == ByteOrder.LITTLE_ENDIAN
    var r = 0
    while (r < rows) {
      val off = r * rowBytes
      val row = java.util.Arrays.copyOfRange(data, off, off + rowBytes)
      var j = 1
      while (j < rowBytes) { row(j) = (row(j) + row(j - 1)).toByte; j += 1 }
      var i = 0
      while (i < n) {
        var b = 0
        while (b < 4) {
          out(off + i * 4 + (if (le) 3 - b else b)) = row(b * n + i)
          b += 1
        }
        i += 1
      }
      r += 1
    }
    out
  }

  /** Apply floating-point horizontal differencing (the encode side):
    * interleave each row's bytes into significance planes, then delta.
    * Input bytes are little-endian float32 (the encoder's layout). */
  private def fpDiff(data: Array[Byte], rows: Int, n: Int): Array[Byte] = {
    val rowBytes = n * 4
    val out = new Array[Byte](rows * rowBytes)
    var r = 0
    while (r < rows) {
      val off = r * rowBytes
      var i = 0
      while (i < n) {
        var b = 0
        while (b < 4) {
          out(off + b * n + i) = data(off + i * 4 + 3 - b)
          b += 1
        }
        i += 1
      }
      var j = rowBytes - 1
      while (j >= 1) {
        out(off + j) = (out(off + j) - out(off + j - 1)).toByte
        j -= 1
      }
      r += 1
    }
    out
  }

  // ------------------------------------------------------------- TIFF LZW

  private val Clear = 256
  private val Eoi = 257
  private val First = 258
  private val MaxCode = 4094 // reset before the 12-bit space is exhausted

  /** TIFF-variant LZW: codes are packed MSB-first; the code width grows
    * 9->10->11->12 one code EARLY (when the next free code reaches
    * 2^width - 1), per TIFF 6.0 §13. */
  def lzwDecode(in: Array[Byte], outSize: Int): Array[Byte] = {
    val out = new Array[Byte](outSize)
    var outPos = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    var nextCode = First
    var codeBits = 9
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    def readCode(): Int = {
      while (bitCnt < codeBits && pos < in.length) {
        bitBuf = (bitBuf << 8) | (in(pos) & 0xFF); pos += 1; bitCnt += 8
      }
      if (bitCnt < codeBits) Eoi
      else {
        val v = ((bitBuf >> (bitCnt - codeBits)) & ((1 << codeBits) - 1)).toInt
        bitCnt -= codeBits
        v
      }
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= First) c = prefix(c)
      c.toByte
    }
    def writeString(code: Int): Byte = {
      var sp = 0
      var c = code
      while (c >= First) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c.toByte
      out(outPos) = first; outPos += 1
      while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
      first
    }
    var oldCode = -1
    var done = false
    while (!done && outPos < outSize) {
      val code = readCode()
      if (code == Eoi) done = true
      else if (code == Clear) {
        nextCode = First; codeBits = 9; oldCode = -1
      } else if (oldCode < 0) {
        require(code < 256, s"first code after clear must be a literal: $code")
        out(outPos) = code.toByte; outPos += 1
        oldCode = code
      } else {
        val first =
          if (code < nextCode) writeString(code)
          else { // KwKwK
            val f = firstByte(oldCode)
            writeString(oldCode)
            out(outPos) = f; outPos += 1
            f
          }
        if (nextCode < 4096) {
          prefix(nextCode) = oldCode; suffix(nextCode) = first
          nextCode += 1
          if (nextCode == (1 << codeBits) - 1 && codeBits < 12) codeBits += 1
        }
        oldCode = code
      }
    }
    require(outPos == outSize, s"LZW underrun: $outPos of $outSize bytes")
    out
  }

  def lzwEncode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
    var bitBuf = 0L
    var bitCnt = 0
    var codeBits = 9
    def writeCode(c: Int): Unit = {
      bitBuf = (bitBuf << codeBits) | c
      bitCnt += codeBits
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xFF).toInt)
        bitCnt -= 8
      }
    }
    // dictionary: (prefixCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Integer, Integer](4096)
    var nextCode = First
    writeCode(Clear)
    var cur = -1
    var i = 0
    while (i < in.length) {
      val b = in(i) & 0xFF
      if (cur < 0) cur = b
      else {
        val key = Integer.valueOf((cur << 8) | b)
        val e = dict.get(key)
        if (e != null) cur = e.intValue()
        else {
          writeCode(cur)
          dict.put(key, Integer.valueOf(nextCode))
          nextCode += 1
          // The decoder's table lags the encoder's by ONE entry (it adds
          // an entry per received code, minus the first after a clear),
          // so the "early change" thresholds differ by one: encoder
          // widens at free > 2^bits - 1, decoder at free > 2^bits - 2
          // (exactly libtiff's MAXCODE vs MAXCODE-1) — both then switch
          // width between the same two wire codes.
          if (nextCode == (1 << codeBits) && codeBits < 12) codeBits += 1
          if (nextCode >= MaxCode) {
            writeCode(Clear)
            dict = new java.util.HashMap[Integer, Integer](4096)
            nextCode = First
            codeBits = 9
          }
          cur = b
        }
      }
      i += 1
    }
    if (cur >= 0) writeCode(cur)
    writeCode(Eoi)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
    out.toByteArray
  }

  // ---------------------------------------------------------------- encode

  /** Write a single-band float32 GeoTIFF (little-endian). `tileSize` 0
    * writes strips of `rowsPerStrip`; > 0 writes tiles (must be a
    * multiple of 16 per the TIFF spec). Stamps ModelPixelScale and
    * ModelTiepoint with the grid georeference like `rastOut` (R:66-70). */
  def encode(pixels: Array[Float], w: Int, h: Int, lzw: Boolean = false,
      tileSize: Int = 0, rowsPerStrip: Int = 64, cellSize: Double = 1.0,
      xMin: Double = 0.0, yMax: Double = 0.0, predictor: Int = 1): Array[Byte] = {
    require(pixels.length == w * h, "pixel count mismatch")
    require(tileSize == 0 || tileSize % 16 == 0, "tile size must be 16k")
    require(predictor == 1 || predictor == 3,
      s"predictor $predictor unsupported (1=none, 3=floating-point)")
    val raw = new Array[Byte](w * h * 4)
    ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
      .put(pixels)

    val comp = if (lzw) 5 else 1
    // data chunks in layout order
    val chunks: Array[Array[Byte]] =
      if (tileSize == 0) {
        val rps = math.max(1, math.min(rowsPerStrip, h))
        val nStrips = (h + rps - 1) / rps
        Array.tabulate(nStrips) { si =>
          val rows = math.min(rps, h - si * rps)
          val part0 = java.util.Arrays.copyOfRange(raw, si * rps * w * 4,
            (si * rps + rows) * w * 4)
          val part = if (predictor == 3) fpDiff(part0, rows, w) else part0
          if (lzw) lzwEncode(part) else part
        }
      } else {
        val ts = tileSize
        val across = (w + ts - 1) / ts
        val down = (h + ts - 1) / ts
        Array.tabulate(across * down) { ti =>
          val x0 = (ti % across) * ts
          val y0 = (ti / across) * ts
          val part0 = new Array[Byte](ts * ts * 4) // zero-padded edges
          val copyW = math.min(ts, w - x0)
          var r = 0
          while (r < ts && y0 + r < h) {
            System.arraycopy(raw, ((y0 + r) * w + x0) * 4, part0, r * ts * 4,
              copyW * 4)
            r += 1
          }
          val part = if (predictor == 3) fpDiff(part0, ts, ts) else part0
          if (lzw) lzwEncode(part) else part
        }
      }

    // IFD entries, ascending tag order (TIFF requirement)
    final case class Entry(tag: Int, typ: Int, values: Array[Double])
    val n = chunks.length
    val geoScale = Array[Double](cellSize, cellSize, 0.0)
    val geoTie = Array[Double](0, 0, 0, xMin, yMax, 0)
    val offsetsEntryValues = new Array[Double](n) // patched below
    val countsEntryValues = chunks.map(_.length.toDouble)
    val entries: Seq[Entry] =
      (Seq(
        Entry(256, 4, Array(w.toDouble)),
        Entry(257, 4, Array(h.toDouble)),
        Entry(258, 3, Array(32.0)),
        Entry(259, 3, Array(comp.toDouble)),
        Entry(262, 3, Array(1.0))) ++
        (if (tileSize == 0) Seq(
          Entry(273, 4, offsetsEntryValues),
          Entry(277, 3, Array(1.0)),
          Entry(278, 4, Array(math.max(1,
            math.min(rowsPerStrip, h)).toDouble)),
          Entry(279, 4, countsEntryValues)) ++
          (if (predictor == 3) Seq(Entry(317, 3, Array(3.0))) else Nil)
        else
          Seq(Entry(277, 3, Array(1.0))) ++
          (if (predictor == 3) Seq(Entry(317, 3, Array(3.0))) else Nil) ++
          Seq(
            Entry(322, 4, Array(tileSize.toDouble)),
            Entry(323, 4, Array(tileSize.toDouble)),
            Entry(324, 4, offsetsEntryValues),
            Entry(325, 4, countsEntryValues))) ++
        Seq(
          Entry(339, 3, Array(3.0)),
          Entry(33550, 12, geoScale),
          Entry(33922, 12, geoTie)))

    def elemSize(typ: Int) = typ match { case 3 => 2; case 4 => 4; case 12 => 8 }
    val ifdOff = 8
    val ifdSize = 2 + entries.length * 12 + 4
    val extOff = ifdOff + ifdSize
    val extSize = entries.map { e =>
      val sz = elemSize(e.typ) * e.values.length
      if (sz > 4) sz else 0
    }.sum
    val dataOff = extOff + extSize
    // patch chunk offsets now that the data origin is known
    var off = dataOff
    var ci = 0
    while (ci < n) {
      offsetsEntryValues(ci) = off.toDouble; off += chunks(ci).length; ci += 1
    }
    val total = off
    val bytes = new Array[Byte](total)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    buf.putShort(entries.length.toShort)
    var ext = extOff
    entries.foreach { e =>
      buf.putShort(e.tag.toShort).putShort(e.typ.toShort)
        .putInt(e.values.length)
      val sz = elemSize(e.typ) * e.values.length
      def putVals(at: Int): Unit = {
        var j = 0
        while (j < e.values.length) {
          e.typ match {
            case 3 => buf.putShort(at + j * 2, e.values(j).toInt.toShort)
            case 4 => buf.putInt(at + j * 4, e.values(j).toLong.toInt)
            case 12 => buf.putDouble(at + j * 8, e.values(j))
          }
          j += 1
        }
      }
      if (sz <= 4) {
        val at = buf.position()
        buf.putInt(0) // reserve, then overwrite in place
        putVals(at)
      } else {
        buf.putInt(ext)
        putVals(ext)
        ext += sz
      }
    }
    buf.putInt(0) // next-IFD pointer: none
    var p = dataOff
    chunks.foreach { c => System.arraycopy(c, 0, bytes, p, c.length); p += c.length }
    bytes
  }
}
