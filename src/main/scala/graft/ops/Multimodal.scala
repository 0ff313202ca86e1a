package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing (north-star surface).
  *
  * Media payloads are opaque `BinaryType` columns plus a typed metadata
  * struct; decode / feature-extract operators run per-partition so a real
  * codec (JNI / external lib) drops in behind the [[MediaDecoder]] trait
  * without touching the pipeline shape. Uncompressed formats are decoded
  * FOR REAL in pure JVM — [[WavDecoder]] (RIFF/PCM-16 audio) and
  * [[BmpDecoder]] (24bpp images) parse actual media bytes with no external
  * library; compressed formats (JPEG/MP3/H.264) need codec libs the
  * container doesn't ship, for which [[StubDecoder]] remains the
  * clearly-marked deterministic stand-in behind the same trait.
  *
  * Scale notes: payload bytes never shuffle — metadata extraction and
  * feature extraction are projections; anything keyed (e.g. near-dup on
  * feature vectors) first reduces to small fixed-size columns.
  */
object Multimodal {

  /** Decode-side decompression-bomb guard: max pixels a single image may
    * declare before any pixel buffer is allocated (default 2^26 ≈ 67 MP —
    * a 256 MB ARGB raster, comfortably above any legitimate training
    * image; configurable via `-Dgraft.media.maxPixels=`). Checked from the
    * parsed HEADER dims in both [[PngDecoder]] and [[ImageIODecoder]], so
    * a kilobyte payload claiming a terapixel canvas is a clean
    * errors-as-data reject, not an executor OOM. */
  val maxPixels: Long =
    sys.props.get("graft.media.maxPixels").map(_.toLong).getOrElse(1L << 26)

  private[ops] def checkPixelCount(width: Int, height: Int): Unit =
    if (width.toLong * height > maxPixels)
      throw new IllegalArgumentException(
        s"image ${width}x$height exceeds the $maxPixels-pixel decode cap")

  /** Typed metadata carried alongside every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Synthesize a deterministic fake media payload for a row: a parseable
    * header `IMG:<w>x<h>:` followed by pseudo-random body bytes derived from
    * the id. Used by fixtures/tests; at 100 TB the payload comes from object
    * storage instead. */
  def fakePayload(id: Column): Column = {
    val w = (pmod(id, lit(4)) + 1) * 64
    val h = (pmod(id, lit(3)) + 1) * 64
    val body = md5(concat(lit("body"), id))
    concat(lit("IMG:"), w.cast("string"), lit("x"), h.cast("string"), lit(":"), body).cast("binary")
  }

  /** Parse the typed metadata struct out of a payload header — pure
    * expressions (codegen'd), no decode of the body. */
  def extractMeta(bin: Column): Column = {
    val s = bin.cast("string")
    struct(
      regexp_extract(s, "^([A-Z]+):", 1).as("format"),
      regexp_extract(s, "^[A-Z]+:([0-9]+)x", 1).cast("int").as("width"),
      regexp_extract(s, "^[A-Z]+:[0-9]+x([0-9]+):", 1).cast("int").as("height"),
      length(bin).cast("long").as("n_bytes"))
  }

  /** Per-partition media decoder: bytes → fixed-size feature vector.
    * Implementations must be serializable (shipped to executors). */
  trait MediaDecoder extends Serializable {
    def dim: Int
    /** Decode one payload; throw on corrupt input (captured per-row). */
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** A decoder that can WALK the image's pixels in visual (top-down,
    * left-right) order — the raw-pixel contract behind orientation-
    * sensitive consumers like the [[imageDhash]] perceptual hash, where
    * the 8-feature summary of [[MediaDecoder.decode]] is not enough.
    * `f` receives (x, y, r, g, b) per pixel; returns (width, height). */
  trait PixelDecoder extends Serializable {
    private[ops] def walkPixels(bytes: Array[Byte])
        (f: (Int, Int, Int, Int, Int) => Unit): (Int, Int)
    /** (width, height) from the HEADER only — O(1), no pixel decode, so
      * consumers that need dims before walking (the dHash pooling grid)
      * don't pay the decode twice. Validation stays in the walk. */
    private[ops] def dims(bytes: Array[Byte]): (Int, Int)
  }

  /** Deterministic STUB for the missing codec libraries: a normalized
    * byte-value histogram. Stands in for "decode image → embed"; swap for a
    * real codec behind the same trait. */
  final class StubDecoder(val dim: Int = 16) extends MediaDecoder {
    def decode(bytes: Array[Byte]): Array[Float] = {
      if (bytes == null || bytes.isEmpty) throw new IllegalArgumentException("empty payload")
      val counts = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { counts((bytes(i) & 0xff) % dim) += 1f; i += 1 }
      val n = bytes.length.toFloat
      counts.map(_ / n)
    }
  }

  /** REAL audio decoder, pure JVM — RIFF/WAVE with 16-bit PCM needs no
    * codec library, so "decode audio → features" is genuinely implemented
    * for the uncompressed format; compressed formats (MP3/AAC) still need
    * an external codec behind the same trait. Walks the RIFF chunk list
    * (fmt / data may be preceded by LIST etc.), validates PCM-16, and
    * emits 8 features: channels, sample-rate (per 48 kHz), duration (s),
    * RMS amplitude, peak amplitude, zero-crossing rate, mean |sample|, DC
    * offset — amplitudes normalized to [-1, 1]. Throws on corrupt input
    * (captured per-row by [[decodeFeatures]]). */
  final class WavDecoder extends MediaDecoder {
    val dim = 8
    def decode(bytes: Array[Byte]): Array[Float] = {
      import java.nio.{ByteBuffer, ByteOrder}
      if (bytes == null || bytes.length < 44)
        throw new IllegalArgumentException("payload too short for a WAV header")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
      if (tag(0) != "RIFF" || tag(8) != "WAVE")
        throw new IllegalArgumentException("not a RIFF/WAVE payload")
      var off = 12
      var channels = 0; var sampleRate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= bytes.length && (dataOff < 0 || channels == 0)) {
        val id = tag(off); val size = bb.getInt(off + 4)
        if (size < 0 || off + 8 + size > bytes.length)
          throw new IllegalArgumentException(s"chunk $id overruns payload")
        id match {
          case "fmt " =>
            val audioFormat = bb.getShort(off + 8).toInt
            if (audioFormat != 1)
              throw new IllegalArgumentException(s"not PCM (format $audioFormat)")
            channels = bb.getShort(off + 10).toInt
            sampleRate = bb.getInt(off + 12)
            bits = bb.getShort(off + 22).toInt
            if (bits != 16)
              throw new IllegalArgumentException(s"only 16-bit PCM supported, got $bits")
          case "data" => dataOff = off + 8; dataLen = size
          case _ => ()
        }
        off += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      if (channels <= 0 || sampleRate <= 0 || dataOff < 0)
        throw new IllegalArgumentException("missing fmt or data chunk")
      val n = dataLen / 2
      if (n == 0) throw new IllegalArgumentException("empty data chunk")
      var i = 0; var sumSq = 0.0; var sumAbs = 0.0; var sum = 0.0
      var peak = 0.0; var crossings = 0; var prevNeg = false
      while (i < n) {
        val s = bb.getShort(dataOff + i * 2) / 32768.0
        sumSq += s * s; sumAbs += math.abs(s); sum += s
        if (math.abs(s) > peak) peak = math.abs(s)
        val neg = s < 0
        if (i > 0 && neg != prevNeg) crossings += 1
        prevNeg = neg
        i += 1
      }
      val frames = n / channels
      Array(
        channels.toFloat,
        sampleRate / 48000f,
        (frames.toDouble / sampleRate).toFloat,
        math.sqrt(sumSq / n).toFloat,
        peak.toFloat,
        (crossings.toDouble / n).toFloat,
        (sumAbs / n).toFloat,
        (sum / n).toFloat)
    }
  }

  /** REAL image decoder, pure JVM — uncompressed 24-bit BMP needs no codec
    * library. Validates the BITMAPFILEHEADER/INFOHEADER, walks the
    * (4-byte-row-padded, bottom-up) pixel array, and emits 8 features:
    * width and height (per 4096), bits-per-pixel (per 32), mean R/G/B and
    * mean luma (all per 255), and luma standard deviation — the "decode
    * image → embed" contract on the format the JVM can honestly decode;
    * JPEG/PNG still need external codecs behind the same trait. */
  final class BmpDecoder extends MediaDecoder with PixelDecoder {
    val dim = 8
    private[ops] def dims(bytes: Array[Byte]): (Int, Int) = {
      import java.nio.{ByteBuffer, ByteOrder}
      if (bytes == null || bytes.length < 54)
        throw new IllegalArgumentException("payload too short for a BMP header")
      if (bytes(0) != 'B' || bytes(1) != 'M')
        throw new IllegalArgumentException("not a BMP payload")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val width = bb.getInt(18)
      val heightRaw = bb.getInt(22)
      if (width <= 0 || heightRaw == 0)
        throw new IllegalArgumentException(s"bad dimensions ${width}x$heightRaw")
      (width, math.abs(heightRaw))
    }
    private[ops] def walkPixels(bytes: Array[Byte])
        (f: (Int, Int, Int, Int, Int) => Unit): (Int, Int) = {
      import java.nio.{ByteBuffer, ByteOrder}
      if (bytes == null || bytes.length < 54)
        throw new IllegalArgumentException("payload too short for a BMP header")
      if (bytes(0) != 'B' || bytes(1) != 'M')
        throw new IllegalArgumentException("not a BMP payload")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val dataOff = bb.getInt(10)
      val width = bb.getInt(18)
      val heightRaw = bb.getInt(22)
      val bpp = bb.getShort(28).toInt
      val compression = bb.getInt(30)
      if (width <= 0 || heightRaw == 0)
        throw new IllegalArgumentException(s"bad dimensions ${width}x$heightRaw")
      if (bpp != 24 || compression != 0)
        throw new IllegalArgumentException(s"only uncompressed 24bpp supported (bpp=$bpp, compression=$compression)")
      val height = math.abs(heightRaw)
      val rowBytes = ((width * 3 + 3) / 4) * 4
      if (dataOff < 54 || dataOff.toLong + rowBytes.toLong * height > bytes.length)
        throw new IllegalArgumentException("pixel array overruns payload")
      var y = 0
      while (y < height) {
        val row = dataOff + y * rowBytes
        // positive height = bottom-up storage: emit VISUAL coordinates so
        // orientation-sensitive consumers (the dHash grid) see the image,
        // not the file layout; orientation-free stats are unaffected
        val vy = if (heightRaw > 0) height - 1 - y else y
        var x = 0
        while (x < width) {
          val b = bytes(row + x * 3) & 0xff
          val g = bytes(row + x * 3 + 1) & 0xff
          val r = bytes(row + x * 3 + 2) & 0xff
          f(x, vy, r, g, b)
          x += 1
        }
        y += 1
      }
      (width, height)
    }
    def decode(bytes: Array[Byte]): Array[Float] = {
      var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
      val (width, height) = walkPixels(bytes) { (_, _, r, g, b) =>
        val l = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += l; sl2 += l * l
      }
      val n = width.toDouble * height
      val meanL = sl / n
      Array(
        width / 4096f, height / 4096f, 24 / 32f,
        (sr / n / 255).toFloat, (sg / n / 255).toFloat, (sb / n / 255).toFloat,
        (meanL / 255).toFloat,
        (math.sqrt(math.max(0, sl2 / n - meanL * meanL)) / 255).toFloat)
    }
  }

  /** REAL image decoder, pure JVM — PNG's pixel stream is zlib/Deflate,
    * which ships IN the JDK (`java.util.zip.Inflater`), so 8-bit
    * truecolor PNG (color type 2 RGB / 6 RGBA, non-interlaced) decodes
    * with no external codec: chunk walk (IHDR/IDAT/IEND), one Inflater
    * pass over the concatenated IDAT stream, then per-row unfiltering
    * (None/Sub/Up/Average/Paeth — the full filter set). Emits the same 8
    * features as [[BmpDecoder]] — width and height (per 4096),
    * bits-per-pixel (per 32), mean R/G/B and mean luma (per 255), luma
    * standard deviation — alpha is parsed but excluded from the stats.
    * Palette/grayscale/16-bit/interlaced variants throw (captured per-row
    * by [[decodeFeatures]]); JPEG still needs an external codec. */
  final class PngDecoder extends MediaDecoder with PixelDecoder {
    val dim = 8
    private[ops] def dims(bytes: Array[Byte]): (Int, Int) = {
      import java.nio.ByteBuffer
      if (bytes == null || bytes.length < 33)
        throw new IllegalArgumentException("payload too short for a PNG stream")
      val bb = ByteBuffer.wrap(bytes)
      var off = 8
      while (off + 8 <= bytes.length) {
        val len = bb.getInt(off)
        if (len < 0 || off + 12 + len.toLong > bytes.length)
          throw new IllegalArgumentException("chunk overruns payload")
        if (new String(bytes, off + 4, 4, "US-ASCII") == "IHDR") {
          val w = bb.getInt(off + 8); val h = bb.getInt(off + 12)
          if (w <= 0 || h <= 0)
            throw new IllegalArgumentException(s"bad dimensions ${w}x$h")
          return (w, h)
        }
        off += 12 + len
      }
      throw new IllegalArgumentException("missing IHDR chunk")
    }
    private[ops] def walkPixels(bytes: Array[Byte])
        (f: (Int, Int, Int, Int, Int) => Unit): (Int, Int) = {
      import java.nio.ByteBuffer
      if (bytes == null || bytes.length < 45)
        throw new IllegalArgumentException("payload too short for a PNG stream")
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      var k = 0
      while (k < 8) {
        if ((bytes(k) & 0xff) != sig(k))
          throw new IllegalArgumentException("not a PNG payload")
        k += 1
      }
      val bb = ByteBuffer.wrap(bytes) // PNG ints are big-endian (the default)
      var off = 8
      var width = 0; var height = 0; var colorType = -1
      val idat = new java.io.ByteArrayOutputStream()
      var sawIend = false
      while (off + 8 <= bytes.length && !sawIend) {
        val len = bb.getInt(off)
        if (len < 0 || off + 12 + len.toLong > bytes.length)
          throw new IllegalArgumentException("chunk overruns payload")
        new String(bytes, off + 4, 4, "US-ASCII") match {
          case "IHDR" =>
            width = bb.getInt(off + 8); height = bb.getInt(off + 12)
            val bitDepth = bytes(off + 16) & 0xff
            colorType = bytes(off + 17) & 0xff
            val interlace = bytes(off + 20) & 0xff
            if (width <= 0 || height <= 0)
              throw new IllegalArgumentException(s"bad dimensions ${width}x$height")
            // cap at the HEADER, before any IDAT bytes are even buffered —
            // a zlib bomb must not get to stage its compressed payload
            Multimodal.checkPixelCount(width, height)
            if (bitDepth != 8 || (colorType != 2 && colorType != 6))
              throw new IllegalArgumentException(
                s"only 8-bit RGB/RGBA supported (depth=$bitDepth, color=$colorType)")
            if (interlace != 0)
              throw new IllegalArgumentException("interlaced PNG not supported")
          case "IDAT" => idat.write(bytes, off + 8, len)
          case "IEND" => sawIend = true
          case _ => () // ancillary chunks (tEXt, pHYs, …) are skippable
        }
        off += 12 + len
      }
      if (colorType < 0 || idat.size() == 0)
        throw new IllegalArgumentException("missing IHDR or IDAT chunk")
      val bpp = if (colorType == 2) 3 else 4 // bytes per pixel
      // stride in LONG before any narrowing: a crafted IHDR width ≥ ~2^29
      // overflows `width * bpp` in Int, which would make the size guard
      // check a wrong (possibly small-positive) value and surface the
      // failure as an array-bounds error instead of a clean reject
      val strideL = width.toLong * bpp
      if ((strideL + 1L) * height > Int.MaxValue - 8)
        throw new IllegalArgumentException("pixel array too large for one buffer")
      val stride = strideL.toInt
      val raw = new Array[Byte]((stride + 1) * height)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var got = 0
      try {
        while (got < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, got, raw.length - got)
          if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
            throw new IllegalArgumentException("truncated IDAT stream")
          got += n
        }
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(s"corrupt zlib stream: ${e.getMessage}")
      } finally inf.end()
      if (got < raw.length)
        throw new IllegalArgumentException("short pixel data")
      var y = 0
      while (y < height) {
        val rowOff = y * (stride + 1)
        val filter = raw(rowOff) & 0xff
        val cur = rowOff + 1
        val prev = cur - (stride + 1) // valid only when y > 0
        var i = 0
        while (i < stride) {
          val x = raw(cur + i) & 0xff
          val a = if (i >= bpp) raw(cur + i - bpp) & 0xff else 0
          val b = if (y > 0) raw(prev + i) & 0xff else 0
          val c = if (y > 0 && i >= bpp) raw(prev + i - bpp) & 0xff else 0
          val recon = filter match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + (a + b) / 2
            case 4 =>
              // Paeth: nearest of a/b/c to the gradient p = a + b - c
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case f => throw new IllegalArgumentException(s"bad filter type $f")
          }
          raw(cur + i) = (recon & 0xff).toByte
          i += 1
        }
        var px = 0
        while (px < width) {
          f(px, y,
            raw(cur + px * bpp) & 0xff,
            raw(cur + px * bpp + 1) & 0xff,
            raw(cur + px * bpp + 2) & 0xff)
          px += 1
        }
        y += 1
      }
      (width, height)
    }
    def decode(bytes: Array[Byte]): Array[Float] = {
      var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
      var bpp8 = 24
      val (width, height) = walkPixels(bytes) { (_, _, r, g, b) =>
        val l = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += l; sl2 += l * l
      }
      // bits-per-pixel feature: re-find IHDR's color type in the chunk list
      // the walk already validated (type 6 carries alpha = 32 bpp)
      val bbh = java.nio.ByteBuffer.wrap(bytes)
      var offh = 8
      var found = false
      while (!found && offh + 8 <= bytes.length) {
        val len = bbh.getInt(offh)
        if (new String(bytes, offh + 4, 4, "US-ASCII") == "IHDR") {
          bpp8 = if ((bytes(offh + 17) & 0xff) == 6) 32 else 24
          found = true
        } else offh += 12 + len
      }
      val n = width.toDouble * height
      val meanL = sl / n
      Array(
        width / 4096f, height / 4096f, bpp8 / 32f,
        (sr / n / 255).toFloat, (sg / n / 255).toFloat, (sb / n / 255).toFloat,
        (meanL / 255).toFloat,
        (math.sqrt(math.max(0, sl2 / n - meanL * meanL)) / 255).toFloat)
    }
  }

  /** REAL decoder for every format the JDK's built-in `javax.imageio`
    * registry reads — JPEG (baseline + progressive), PNG (all color
    * types/depths, incl. palette and 16-bit, which [[PngDecoder]]'s
    * hand-rolled truecolor path declines), GIF, and BMP — with no external
    * library: the readers live in the `java.desktop` module. Emits the
    * same 8 features as [[BmpDecoder]]/[[PngDecoder]] (width and height
    * per 4096, bits-per-pixel per 32, mean R/G/B and mean luma per 255,
    * luma stddev); `getRGB` yields non-premultiplied sRGB, so alpha never
    * leaks into the channel means. Kept ALONGSIDE the wire-format decoders
    * (which prove the byte-level parse and serve as an independent
    * cross-check — spec-asserted equal on shared PNG inputs); lossy
    * formats with no JDK codec (MP3/H.264) still need [[StubDecoder]]. */
  final class ImageIODecoder extends MediaDecoder with PixelDecoder {
    val dim = 8
    private[ops] def walkPixels(bytes: Array[Byte])
        (f: (Int, Int, Int, Int, Int) => Unit): (Int, Int) = {
      val img = readGuarded(bytes)
      val width = img.getWidth; val height = img.getHeight
      val row = new Array[Int](width)
      var y = 0
      while (y < height) {
        img.getRGB(0, y, width, 1, row, 0, width)
        var x = 0
        while (x < width) {
          val argb = row(x)
          f(x, y, (argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
          x += 1
        }
        y += 1
      }
      (width, height)
    }
    private[ops] def dims(bytes: Array[Byte]): (Int, Int) = {
      if (bytes == null || bytes.length == 0)
        throw new IllegalArgumentException("empty payload")
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new IllegalArgumentException("no ImageIO reader recognizes the payload")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val (w, h) = (reader.getWidth(0), reader.getHeight(0))
        if (w <= 0 || h <= 0)
          throw new IllegalArgumentException(s"bad dimensions ${w}x$h")
        (w, h)
      } finally { reader.dispose(); iis.close() }
    }
    private def readGuarded(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      if (bytes == null || bytes.length == 0)
        throw new IllegalArgumentException("empty payload")
      // HEADER dims first, pixel buffers after: a tiny crafted payload can
      // declare huge dimensions, and ImageIO.read would allocate the full
      // raster before we ever saw them — an executor OOM that escapes the
      // errors-as-data contract. getWidth/getHeight parse only the header.
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new IllegalArgumentException("no ImageIO reader recognizes the payload")
      val reader = readers.next()
      val img = try {
        reader.setInput(iis)
        val (w0, h0) = (reader.getWidth(0), reader.getHeight(0))
        if (w0 <= 0 || h0 <= 0)
          throw new IllegalArgumentException(s"bad dimensions ${w0}x$h0")
        Multimodal.checkPixelCount(w0, h0)
        reader.read(0)
      } finally { reader.dispose(); iis.close() }
      if (img.getWidth <= 0 || img.getHeight <= 0)
        throw new IllegalArgumentException(
          s"bad dimensions ${img.getWidth}x${img.getHeight}")
      img
    }
    def decode(bytes: Array[Byte]): Array[Float] = {
      val img = readGuarded(bytes)
      val width = img.getWidth; val height = img.getHeight
      val bpp = img.getColorModel.getPixelSize
      var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
      val row = new Array[Int](width)
      var y = 0
      while (y < height) {
        img.getRGB(0, y, width, 1, row, 0, width)
        var x = 0
        while (x < width) {
          val argb = row(x)
          val r = (argb >> 16) & 0xff
          val g = (argb >> 8) & 0xff
          val b = argb & 0xff
          val l = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sl += l; sl2 += l * l
          x += 1
        }
        y += 1
      }
      val n = width.toDouble * height
      val meanL = sl / n
      Array(
        width / 4096f, height / 4096f, bpp / 32f,
        (sr / n / 255).toFloat, (sg / n / 255).toFloat, (sb / n / 255).toFloat,
        (meanL / 255).toFloat,
        (math.sqrt(math.max(0, sl2 / n - meanL * meanL)) / 255).toFloat)
    }
  }

  /** Row-level decode outcome: errors travel as data (SafeMap contract, A2). */
  private val decodeResultType = StructType(Seq(
    StructField("ok", BooleanType, nullable = true),
    StructField("features", ArrayType(FloatType), nullable = true),
    StructField("error", StringType, nullable = true)))

  /** Decode a binary column to feature vectors via mapPartitions: one decoder
    * instance per partition (real codecs have per-thread init cost), failures
    * captured per-row as data, schema appended — the genuine 100 TB shape for
    * batch media decode. */
  def decodeFeatures(df: DataFrame, binCol: String, decoder: MediaDecoder,
                     outCol: String = "decoded"): DataFrame = {
    val schema = df.schema.add(outCol, decodeResultType)
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out =
          try {
            val f = decoder.decode(r.getAs[Array[Byte]](idx))
            Row(true, f.toSeq, null)
          } catch {
            case e: Throwable => Row(false, null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }
  }

  /** 64-bit DIFFERENCE HASH (dHash) of one decoded image — the perceptual
    * fingerprint that makes image near-dup a pipeline operator (Krawetz's
    * public dHash recipe): pool the pixels into a 9-wide × 8-tall
    * grayscale grid, then bit (gy·8 + gx) is set iff cell (gx, gy) is
    * strictly brighter than its right neighbour (gx+1, gy). Resizes,
    * re-encodes, and global brightness/contrast shifts preserve the
    * gradient signs, so true near-duplicates land within a few bits.
    *
    * EXACT integer arithmetic end-to-end, so any engine replays it
    * bit-for-bit: luma is the integer per-mille 299·r + 587·g + 114·b,
    * pooling buckets pixel x into column ⌊x·9/w⌋ (y likewise into 8
    * rows), and the brightness comparison cross-multiplies sums by
    * counts — sumL·cntR > sumR·cntL — so unequal cell sizes never meet a
    * division. Requires w ≥ 9 and h ≥ 8 (fewer pixels than cells has no
    * honest gradient; throws — captured per-row by [[imageDhash]]). */
  def dhash64(decoder: PixelDecoder, bytes: Array[Byte]): Long = {
    val (w, h) = decoder.dims(bytes) // header-only: no double decode
    if (w < 9 || h < 8)
      throw new IllegalArgumentException(
        s"image ${w}x$h too small for a 9x8 dHash grid")
    val sums = new Array[Long](9 * 8)
    val cnts = new Array[Long](9 * 8)
    decoder.walkPixels(bytes) { (x, y, r, g, b) =>
      val gx = ((x.toLong * 9) / w).toInt
      val gy = ((y.toLong * 8) / h).toInt
      val i = gy * 9 + gx
      sums(i) += 299L * r + 587L * g + 114L * b
      cnts(i) += 1L
    }
    var hash = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val l = gy * 9 + gx
        if (sums(l) * cnts(l + 1) > sums(l + 1) * cnts(l))
          hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Row-level dHash outcome: errors travel as data (SafeMap contract, A2). */
  private val dhashResultType = StructType(Seq(
    StructField("ok", BooleanType, nullable = true),
    StructField("dhash", LongType, nullable = true),
    StructField("error", StringType, nullable = true)))

  /** Perceptual-hash a binary image column via mapPartitions — the same
    * shape as [[decodeFeatures]]: one decoder per partition, corrupt
    * payloads captured per-row as (ok, dhash, error), schema appended.
    * Feed the hashes to [[graft.ops.Dedup.hammingNearDupPairs]] for
    * banded image near-dup at corpus scale. */
  def imageDhash(df: DataFrame, binCol: String, decoder: PixelDecoder,
                 outCol: String = "dhashed"): DataFrame = {
    val schema = df.schema.add(outCol, dhashResultType)
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out =
          try Row(true, dhash64(decoder, r.getAs[Array[Byte]](idx)), null)
          catch {
            case e: Throwable =>
              Row(false, null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }
  }

  /** Build a REAL uncompressed 24-bpp BMP (bottom-up, 4-byte row padding)
    * with r = g = b = luma(x, y) & 0xff per VISUAL pixel — the fixture/
    * spec generator whose payloads exercise the genuine wire decoders
    * while staying arithmetic an oracle can replay from (x, y) alone. */
  def syntheticBmp(w: Int, h: Int, luma: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowBytes * h
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    val bytes = bb.array()
    var sy = 0
    while (sy < h) {
      val vy = h - 1 - sy // bottom-up storage ← visual row
      val row = 54 + sy * rowBytes
      var x = 0
      while (x < w) {
        val v = (luma(x, vy) & 0xff).toByte
        bytes(row + x * 3) = v
        bytes(row + x * 3 + 1) = v
        bytes(row + x * 3 + 2) = v
        x += 1
      }
      sy += 1
    }
    bytes
  }

  /** Frame-sample a "video" payload: slice the body into fixed-size frames
    * and keep every `everyN`-th — pure expressions over binary. */
  def frameSample(bin: Column, frameBytes: Int, everyN: Int): Column = {
    val nFrames = floor(length(bin) / frameBytes).cast("int")
    transform(
      filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
        i => (i < nFrames) && (i % everyN === 0)),
      i => bin.substr(i * frameBytes + 1, lit(frameBytes)))
  }
}
