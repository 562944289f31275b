package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** GeoTIFF codec: byte-level golden decode (hand-assembled file, NOT
  * produced by our own writer), encode-decode round trips across
  * layouts/compressions, LZW corner cases (code-width growth, early
  * change, dictionary reset), and geo-tag round trip. */
class GeoTiffSpec extends AnyFunSuite {

  private def pattern(n: Int): Array[Float] =
    Array.tabulate(n)(i => ((i * 2654435761L % 4294967296L) % 1024).toFloat / 8f)

  test("golden: hand-assembled little-endian strip TIFF decodes " +
    "byte-for-byte") {
    // 3x2 float32, uncompressed, one strip, built field-by-field from the
    // TIFF 6.0 spec — independent of GeoTiff.encode.
    val vals = Array(1.5f, -2.25f, 3.0f, 0.0f, 100.125f, -0.5f)
    val nEntries = 11
    val ifdOff = 8
    val extOff = ifdOff + 2 + nEntries * 12 + 4
    val dataOff = extOff + 24 + 48 // pixelScale(3 doubles) + tiepoint(6)
    val bytes = new Array[Byte](dataOff + vals.length * 4)
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    b.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    b.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, cnt: Int, value: Int): Unit =
      b.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt).putInt(value)
    def entryShort(tag: Int, v: Int): Unit = { // SHORT packs left-justified
      b.putShort(tag.toShort).putShort(3).putInt(1)
      b.putShort(v.toShort).putShort(0)
    }
    entry(256, 4, 1, 3) // width
    entry(257, 4, 1, 2) // height
    entryShort(258, 32) // bits per sample
    entryShort(259, 1) // no compression
    entryShort(262, 1) // photometric
    entry(273, 4, 1, dataOff) // strip offset
    entryShort(277, 1) // samples per pixel
    entry(278, 4, 1, 2) // rows per strip
    entry(279, 4, 1, vals.length * 4) // strip byte count
    entryShort(339, 3) // sample format: IEEE float
    entry(33550, 12, 3, extOff) // ModelPixelScale
    b.putInt(0) // next IFD
    b.putDouble(extOff, 10000.0).putDouble(extOff + 8, 10000.0)
      .putDouble(extOff + 16, 0.0)
    val fb = ByteBuffer.wrap(bytes, dataOff, vals.length * 4)
      .order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
    fb.put(vals)
    val r = GeoTiff.decode(bytes)
    assert(r.w == 3 && r.h == 2)
    assert(java.util.Arrays.equals(r.pixels, vals))
    assert(r.pixelScale.contains((10000.0, 10000.0)))
  }

  test("golden: big-endian (MM) sample bytes decode with file byte order") {
    val vals = Array(0.5f, -8f)
    val nEntries = 9
    val ifdOff = 8
    val dataOff = ifdOff + 2 + nEntries * 12 + 4
    val bytes = new Array[Byte](dataOff + 8)
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    b.put('M'.toByte).put('M'.toByte).putShort(42).putInt(ifdOff)
    b.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, cnt: Int, value: Int): Unit =
      b.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt).putInt(value)
    def entryShort(tag: Int, v: Int): Unit = {
      b.putShort(tag.toShort).putShort(3).putInt(1)
      b.putShort(v.toShort).putShort(0)
    }
    entry(256, 4, 1, 2)
    entry(257, 4, 1, 1)
    entryShort(258, 32)
    entryShort(259, 1)
    entry(273, 4, 1, dataOff)
    entryShort(277, 1)
    entry(278, 4, 1, 1)
    entry(279, 4, 1, 8)
    entryShort(339, 3)
    b.putInt(0)
    ByteBuffer.wrap(bytes, dataOff, 8).order(ByteOrder.BIG_ENDIAN)
      .asFloatBuffer().put(vals)
    val r = GeoTiff.decode(bytes)
    assert(r.w == 2 && r.h == 1)
    assert(java.util.Arrays.equals(r.pixels, vals))
  }

  test("round trip: strips x {raw, lzw} x odd sizes, geo tags kept") {
    for {
      (w, h) <- Seq((7, 5), (64, 64), (33, 129))
      lzw <- Seq(false, true)
    } {
      val px = pattern(w * h)
      val tif = GeoTiff.encode(px, w, h, lzw = lzw, rowsPerStrip = 37,
        cellSize = 10000.0, xMin = -20037506.5671, yMax = 8686794.9791)
      val r = GeoTiff.decode(tif)
      assert(r.w == w && r.h == h, s"dims ${w}x$h lzw=$lzw")
      assert(java.util.Arrays.equals(r.pixels, px), s"pixels ${w}x$h lzw=$lzw")
      assert(r.pixelScale.contains((10000.0, 10000.0)))
      assert(r.tiepoint.contains((-20037506.5671, 8686794.9791)))
    }
  }

  test("round trip: tiled layout with clipped edge tiles, raw and lzw") {
    for {
      (w, h) <- Seq((50, 70), (16, 16), (100, 30))
      lzw <- Seq(false, true)
    } {
      val px = pattern(w * h)
      val tif = GeoTiff.encode(px, w, h, lzw = lzw, tileSize = 16)
      val r = GeoTiff.decode(tif)
      assert(java.util.Arrays.equals(r.pixels, px), s"tiled ${w}x$h lzw=$lzw")
    }
  }

  test("LZW: constant runs, ramp, and >4094-code streams (dictionary " +
    "reset) all round-trip") {
    val cases = Seq(
      Array.fill[Byte](10000)(7),
      Array.tabulate[Byte](256)(_.toByte),
      Array.tabulate[Byte](200000)(i => ((i * 31 + i / 7) & 0xFF).toByte),
      Array[Byte](),
      Array[Byte](42))
    cases.foreach { in =>
      val out = GeoTiff.lzwDecode(GeoTiff.lzwEncode(in), in.length)
      assert(java.util.Arrays.equals(out, in), s"len ${in.length}")
    }
  }

  test("LZW: code width grows exactly at the early-change boundaries") {
    // A stream of distinct 2-byte pairs fills the dictionary linearly;
    // any off-by-one in the width schedule corrupts everything after the
    // first boundary, so a long round trip pins the schedule.
    val in = new Array[Byte](60000)
    var i = 0
    var k = 0
    while (i + 1 < in.length) {
      in(i) = (k & 0xFF).toByte; in(i + 1) = ((k >> 8) & 0xFF).toByte
      k += 1; i += 2
    }
    val enc = GeoTiff.lzwEncode(in)
    assert(enc.length < in.length * 2)
    assert(java.util.Arrays.equals(GeoTiff.lzwDecode(enc, in.length), in))
  }

  test("LZW fuzz: 60 seeded random payloads across sizes and alphabets " +
    "round-trip exactly") {
    val rnd = new scala.util.Random(0xC0DEL) // deterministic
    (0 until 60).foreach { i =>
      val n = rnd.nextInt(1 << (6 + i % 12)) // up to ~128 KB
      val alphabet = 1 << (1 + rnd.nextInt(8)) // 2..256 symbols
      val in = Array.tabulate[Byte](n)(_ => (rnd.nextInt(alphabet)).toByte)
      val out = GeoTiff.lzwDecode(GeoTiff.lzwEncode(in), in.length)
      assert(java.util.Arrays.equals(out, in), s"case $i n=$n a=$alphabet")
    }
  }

  test("decode dispatch: Codec fmt=gtiff") {
    val px = pattern(256)
    val tif = GeoTiff.encode(px, 16, 16, lzw = true)
    assert(java.util.Arrays.equals(Codec.decodeBand("gtiff", tif, 256, 0), px))
  }

  test("predictor 3 golden: hand-differenced bytes (derived on paper " +
    "from TIFF TechNote 3) decode to the expected floats") {
    // one row of [1.0f, 2.0f]: MSB planes [3F,40][80,00][00,00][00,00]
    // -> interleaved 3F 40 80 00 00 00 00 00 -> deltas 3F 01 40 80 00..
    val stored = Array(0x3F, 0x01, 0x40, 0x80, 0, 0, 0, 0).map(_.toByte)
    val nEntries = 10
    val ifdOff = 8
    val dataOff = ifdOff + 2 + nEntries * 12 + 4
    val bytes = new Array[Byte](dataOff + stored.length)
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    b.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    b.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, cnt: Int, value: Int): Unit =
      b.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt).putInt(value)
    def entryShort(tag: Int, v: Int): Unit = {
      b.putShort(tag.toShort).putShort(3).putInt(1)
      b.putShort(v.toShort).putShort(0)
    }
    entry(256, 4, 1, 2) // width 2
    entry(257, 4, 1, 1) // height 1
    entryShort(258, 32)
    entryShort(259, 1) // no compression (predictor still applies)
    entry(273, 4, 1, dataOff)
    entryShort(277, 1)
    entry(278, 4, 1, 1)
    entry(279, 4, 1, stored.length)
    entryShort(317, 3) // floating-point predictor
    entryShort(339, 3)
    b.putInt(0)
    System.arraycopy(stored, 0, bytes, dataOff, stored.length)
    val r = GeoTiff.decode(bytes)
    assert(r.pixels.toSeq == Seq(1.0f, 2.0f))
  }

  test("predictor 3 round-trips: strips and tiles x {raw, lzw}; " +
    "predictor 2 stays rejected for float32") {
    for {
      (w, h) <- Seq((7, 5), (33, 129), (50, 20))
      lzw <- Seq(false, true)
      tile <- Seq(0, 16)
    } {
      val px = pattern(w * h)
      val tif = GeoTiff.encode(px, w, h, lzw = lzw, tileSize = tile,
        rowsPerStrip = 3, predictor = 3)
      assert(java.util.Arrays.equals(GeoTiff.decode(tif).pixels, px),
        s"pred3 ${w}x$h lzw=$lzw tile=$tile")
    }
    // smooth data: predictor 3 + LZW should actually compress better
    val smooth = Array.tabulate(64 * 64)(i => (1000.0f + i * 0.25f))
    val plain = GeoTiff.encode(smooth, 64, 64, lzw = true)
    val pred = GeoTiff.encode(smooth, 64, 64, lzw = true, predictor = 3)
    assert(pred.length < plain.length,
      s"predictor should shrink smooth rasters: ${pred.length} vs ${plain.length}")
    // predictor 2 (integer differencing) is meaningless for float32
    intercept[IllegalArgumentException](
      GeoTiff.encode(pattern(16), 4, 4, predictor = 2))
  }

  // ---- cross-engine LZW validation: the JDK ships an independent TIFF
  // plugin (javax.imageio, since Java 9) whose LZW codec descends from
  // JAI, not from this repo — a matched off-by-one in our encoder AND
  // decoder's early-change width schedule would pass every self round
  // trip but fail against it.

  /** Minimal test-side IFD walk (independent of GeoTiff.readIfd): tag ->
    * long values, both byte orders, enough types for strip tables. */
  private def ifdTags(bytes: Array[Byte]): (ByteOrder, Map[Int, Array[Long]]) = {
    val order = if (bytes(0) == 'I'.toByte) ByteOrder.LITTLE_ENDIAN
      else ByteOrder.BIG_ENDIAN
    val b = ByteBuffer.wrap(bytes).order(order)
    val off = b.getInt(4)
    val n = b.getShort(off) & 0xFFFF
    val tags = (0 until n).map { i =>
      val e = off + 2 + i * 12
      val tag = b.getShort(e) & 0xFFFF
      val typ = b.getShort(e + 2) & 0xFFFF
      val cnt = b.getInt(e + 4)
      val sz = typ match { case 1 => 1; case 3 => 2; case 4 => 4; case _ => 0 }
      val vo = if (sz * cnt <= 4) e + 8 else b.getInt(e + 8)
      val vals =
        if (sz == 0) Array.empty[Long]
        else Array.tabulate(cnt) { j =>
          typ match {
            case 1 => (b.get(vo + j) & 0xFF).toLong
            case 3 => (b.getShort(vo + j * 2) & 0xFFFF).toLong
            case 4 => b.getInt(vo + j * 4).toLong & 0xFFFFFFFFL
          }
        }
      tag -> vals
    }.toMap
    (order, tags)
  }

  /** Deterministic 8-bit test image: enough entropy to push the LZW
    * dictionary through the 9->10->11->12 bit boundaries. */
  private def grayPixels(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => ((i * 2654435761L % 4294967296L) % 256).toInt)

  test("LZW cross-engine: strips written by the JDK's ImageIO TIFF " +
    "encoder decode with our lzwDecode") {
    val (w, h) = (129, 100) // 12900 bytes/strip region: crosses widths
    val px = grayPixels(w, h)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    px.zipWithIndex.foreach { case (v, i) =>
      img.getRaster.setSample(i % w, i / w, 0, v)
    }
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    assert(writers.hasNext, "JDK TIFF ImageIO plugin expected (Java 9+)")
    val writer = writers.next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val tif = bos.toByteArray

    val (_, tags) = ifdTags(tif)
    assert(tags(259)(0) == 5, "expected LZW compression")
    assert(tags.getOrElse(317, Array(1L))(0) == 1, "expected no predictor")
    val offs = tags(273); val cnts = tags(279)
    val rps = tags.getOrElse(278, Array(h.toLong))(0).toInt
    val out = new Array[Byte](w * h)
    offs.indices.foreach { si =>
      val rows = math.min(rps, h - si * rps)
      val strip = java.util.Arrays.copyOfRange(tif, offs(si).toInt,
        (offs(si) + cnts(si)).toInt)
      System.arraycopy(GeoTiff.lzwDecode(strip, rows * w), 0, out,
        si * rps * w, rows * w)
    }
    assert(out.map(_ & 0xFF).sameElements(px),
      "JDK-encoded LZW must decode identically")
  }

  test("LZW cross-engine: our lzwEncode output is readable by the JDK's " +
    "ImageIO TIFF decoder") {
    val (w, h) = (129, 100)
    val px = grayPixels(w, h)
    val lzw = GeoTiff.lzwEncode(px.map(_.toByte))
    // hand-assemble a minimal 8-bit gray LZW TIFF around our stream
    val nEntries = 10
    val ifdOff = 8
    val dataOff = ifdOff + 2 + nEntries * 12 + 4
    val bytes = new Array[Byte](dataOff + lzw.length)
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    b.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    b.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, cnt: Int, value: Int): Unit =
      b.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt).putInt(value)
    def entryShort(tag: Int, v: Int): Unit = {
      b.putShort(tag.toShort).putShort(3).putInt(1)
      b.putShort(v.toShort).putShort(0)
    }
    entry(256, 4, 1, w)
    entry(257, 4, 1, h)
    entryShort(258, 8)
    entryShort(259, 5) // LZW
    entryShort(262, 1) // BlackIsZero
    entry(273, 4, 1, dataOff)
    entryShort(277, 1)
    entry(278, 4, 1, h)
    entry(279, 4, 1, lzw.length)
    entryShort(339, 1) // unsigned int samples
    b.putInt(0)
    System.arraycopy(lzw, 0, bytes, dataOff, lzw.length)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK TIFF reader rejected our LZW TIFF")
    assert(img.getWidth == w && img.getHeight == h)
    val got = Array.tabulate(w * h)(i =>
      img.getRaster.getSample(i % w, i / w, 0))
    assert(got.sameElements(px), "JDK must decode our LZW stream exactly")
  }

  test("hostile IFD: out-of-line value offsets past EOF or negative are " +
    "rejected loudly, not IndexOutOfBounds") {
    val ok = GeoTiff.encode(pattern(16), 4, 4, lzw = true)
    val b = ByteBuffer.wrap(ok.clone()).order(ByteOrder.LITTLE_ENDIAN)
    val n = b.getShort(8) & 0xFFFF
    // find an entry with an out-of-line value (ModelPixelScale: 3
    // doubles) and corrupt its offset
    def corrupt(newOff: Int): Array[Byte] = {
      val copy = ok.clone()
      val cb = ByteBuffer.wrap(copy).order(ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach { i =>
        val e = 10 + i * 12
        if ((cb.getShort(e) & 0xFFFF) == 33550) cb.putInt(e + 8, newOff)
      }
      copy
    }
    val e1 = intercept[IllegalArgumentException](
      GeoTiff.decode(corrupt(ok.length - 3)))
    assert(e1.getMessage.contains("corrupt IFD"))
    val e2 = intercept[IllegalArgumentException](
      GeoTiff.decode(corrupt(-100)))
    assert(e2.getMessage.contains("corrupt IFD"))
  }

  test("hostile chunk tables: strip offsets/counts past EOF are rejected " +
    "loudly") {
    val ok = GeoTiff.encode(pattern(256), 16, 16, rowsPerStrip = 16)
    val b = ByteBuffer.wrap(ok.clone()).order(ByteOrder.LITTLE_ENDIAN)
    val n = b.getShort(8) & 0xFFFF
    def corruptTag(tag: Int, v: Int): Array[Byte] = {
      val copy = ok.clone()
      val cb = ByteBuffer.wrap(copy).order(ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach { i =>
        val e = 10 + i * 12
        if ((cb.getShort(e) & 0xFFFF) == tag) cb.putInt(e + 8, v)
      }
      copy
    }
    val e1 = intercept[IllegalArgumentException](
      GeoTiff.decode(corruptTag(273, ok.length - 4))) // offset near EOF
    assert(e1.getMessage.contains("corrupt chunk"))
    val e2 = intercept[IllegalArgumentException](
      GeoTiff.decode(corruptTag(279, Int.MaxValue))) // absurd byte count
    assert(e2.getMessage.contains("corrupt chunk"))
  }

  test("unsupported shapes are rejected loudly") {
    val px = pattern(16)
    val ok = GeoTiff.encode(px, 4, 4)
    // clobber SampleFormat (tag 339) value to 1 (unsigned int)
    val b = ByteBuffer.wrap(ok).order(ByteOrder.LITTLE_ENDIAN)
    val n = b.getShort(8) & 0xFFFF
    (0 until n).foreach { i =>
      val e = 10 + i * 12
      if ((b.getShort(e) & 0xFFFF) == 339) b.putShort(e + 8, 1)
    }
    intercept[IllegalArgumentException](GeoTiff.decode(ok))
    intercept[IllegalArgumentException](GeoTiff.decode("nottiff".getBytes))
  }
}
