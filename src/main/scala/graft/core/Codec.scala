package graft.core

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** Tile payload codec: raster pixel blocks carried as `bytes:binary`
  * rows of the Iceberg-shaped image table (BASELINE.json `input_hint`).
  *
  * Formats:
  *  - `f32`  : lossless; bands stored band-major as little-endian
  *             float32, no header (w, h, band count live in columns).
  *  - `png16`: lossy-quantized; single band as 16-bit grayscale PNG of
  *             round(value * Png16Scale) — exercises the PSNR >= 40 dB
  *             invariant for lossy payloads.
  *
  * The reference reads GeoTIFF rasters eagerly into vectors
  * (`Supplemental_Data_1.R:211,216-218`); our decode is the per-tile
  * analog feeding the raster->vector explode (SURVEY.md §2.1 S3).
  */
object Codec {

  /** Quantization scale for png16: value range [0, 1024) maps onto
    * 16-bit codes with 1/64 granularity. */
  val Png16Scale = 64.0

  def encodeF32(bands: Array[Array[Float]]): Array[Byte] = {
    val per = bands(0).length
    val buf = ByteBuffer.allocate(4 * per * bands.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    var b = 0
    while (b < bands.length) {
      require(bands(b).length == per, "ragged bands")
      val fb = buf.asFloatBuffer()
      fb.position(b * per)
      fb.put(bands(b))
      buf.position(0)
      b += 1
    }
    buf.array()
  }

  /** Decode one band of an f32 multiband payload. */
  def decodeF32Band(bytes: Array[Byte], nPixels: Int, band: Int): Array[Float] = {
    val out = new Array[Float](nPixels)
    val fb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
    fb.position(band * nPixels)
    fb.get(out)
    out
  }

  def bandCount(bytes: Array[Byte], nPixels: Int): Int = bytes.length / (4 * nPixels)

  def encodePng16(band: Array[Float], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < band.length) {
      val code = math.max(0, math.min(65535, math.round(band(i) * Png16Scale).toInt))
      raster.setSample(i % w, i / w, 0, code)
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def decodePng16(bytes: Array[Byte]): Array[Float] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val out = new Array[Float](w * h)
    var i = 0
    while (i < out.length) {
      out(i) = (raster.getSample(i % w, i / w, 0) / Png16Scale).toFloat
      i += 1
    }
    out
  }

  /** Encode a band as 8-bit grayscale baseline JPEG (the JDK's ImageIO
    * codec — present in every JRE, no native libs). Values are clamped
    * and rounded to [0, 255] codes; `quality` 1.0 = the encoder's
    * finest quantization tables (still lossy: JPEG is DCT-based). */
  def encodeJpegGray(band: Array[Float], w: Int, h: Int,
      quality: Float = 1.0f): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < band.length) {
      val code = math.max(0, math.min(255, math.round(band(i))))
      raster.setSample(i % w, i / w, 0, code)
      i += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode a grayscale JPEG back to its 8-bit code values as floats. */
  def decodeJpegGray(bytes: Array[Byte]): Array[Float] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val out = new Array[Float](w * h)
    var i = 0
    while (i < out.length) {
      out(i) = raster.getSample(i % w, i / w, 0).toFloat
      i += 1
    }
    out
  }

  /** Single float element of an f32 payload (little-endian), by flat
    * element index (band * nPixels + pixel). The zero-allocation random
    * access backing the fused pixel pipeline: within one whole-stage
    * codegen stage the payload stays a byte[] reference, so per-cell
    * band reads never materialize band arrays or struct rows. */
  @inline def floatAt(bytes: Array[Byte], idx: Int): Float = {
    val i = idx << 2
    java.lang.Float.intBitsToFloat(
      (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8) |
        ((bytes(i + 2) & 0xFF) << 16) | ((bytes(i + 3) & 0xFF) << 24))
  }

  /** Encode signed 16-bit PCM samples little-endian (the `s16le`
    * audio payload format: raw interleavable mono frames, the byte
    * layout of a WAV data chunk without the RIFF header). */
  def encodeS16(samples: Array[Short]): Array[Byte] = {
    val buf = ByteBuffer.allocate(2 * samples.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.asShortBuffer().put(samples)
    buf.array()
  }

  def decodeS16(bytes: Array[Byte]): Array[Short] = {
    val out = new Array[Short](bytes.length / 2)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      .asShortBuffer().get(out)
    out
  }

  /** Single s16le sample by index — the audio analog of `floatAt`:
    * zero-allocation random access so windowed stats inside one
    * codegen stage never materialize a sample array. */
  @inline def s16At(bytes: Array[Byte], idx: Int): Int = {
    val i = idx << 1
    ((bytes(i) & 0xFF) | (bytes(i + 1) << 8)).toShort.toInt
  }

  /** Decode dispatch on the table's `fmt` column. */
  def decodeBand(fmt: String, bytes: Array[Byte], nPixels: Int, band: Int): Array[Float] =
    fmt match {
      case "f32" =>
        // nPixels = -1: derive the length from the payload (single-band
        // only — nPixels is the band stride, so multi-band payloads
        // need it explicit). The variable-size decode path for ops
        // whose output dims are data-dependent (q139 autocrop).
        require(nPixels >= 0 || band == 0,
          "derived-length decode is single-band; pass nPixels for bands")
        decodeF32Band(bytes, if (nPixels < 0) bytes.length / 4 else nPixels,
          band)
      case "png16" =>
        require(band == 0, "png16 payloads are single-band")
        decodePng16(bytes)
      case "gtiff" =>
        require(band == 0, "gtiff payloads are single-band")
        val r = GeoTiff.decode(bytes)
        require(r.pixels.length == nPixels,
          s"gtiff pixel count ${r.pixels.length} != $nPixels")
        r.pixels
      case "jpeg" =>
        require(band == 0, "jpeg payloads are single-band")
        val px = decodeJpegGray(bytes)
        require(px.length == nPixels,
          s"jpeg pixel count ${px.length} != $nPixels")
        px
      case other => throw new IllegalArgumentException(s"unknown fmt: $other")
    }

  /** Peak signal-to-noise ratio in dB; infinite for identical inputs. */
  def psnr(a: Array[Float], b: Array[Float], peak: Double): Double = {
    require(a.length == b.length, "length mismatch")
    var sse = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      sse += d * d
      i += 1
    }
    if (sse == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(peak * peak * a.length / sse)
  }

  /** 64-bit perceptual hash of a pixel block: 8x8 block-mean average
    * hash (bit set where the block mean exceeds the global mean) — the
    * `phash` column of the input table. */
  def phash(band: Array[Float], w: Int, h: Int): Long = {
    val sums = new Array[Double](64)
    val counts = new Array[Long](64)
    var i = 0
    while (i < band.length) {
      val bx = math.min(7, (i % w) * 8 / w)
      val by = math.min(7, (i / w) * 8 / h)
      val k = by * 8 + bx
      sums(k) += band(i)
      counts(k) += 1
      i += 1
    }
    var total = 0.0
    var n = 0L
    var k = 0
    while (k < 64) { total += sums(k); n += counts(k); k += 1 }
    val mean = if (n == 0) 0.0 else total / n
    var hash = 0L
    k = 0
    while (k < 64) {
      val m = if (counts(k) == 0) 0.0 else sums(k) / counts(k)
      if (m > mean) hash |= (1L << k)
      k += 1
    }
    hash
  }
}
