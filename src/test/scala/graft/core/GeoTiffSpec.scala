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
