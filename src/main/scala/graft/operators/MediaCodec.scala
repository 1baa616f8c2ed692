package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal tier: RIFF/WAVE PCM audio,
  * BMP (BITMAPINFOHEADER, uncompressed 24-bpp) and PNG (8-bit
  * truecolor/truecolor-alpha, zlib, filters 0-4) images. These are
  * REAL decoders — byte-level header parsing, chunk walking with CRC
  * validation, zlib inflation, per-scanline filter reconstruction —
  * chosen because the formats are decodable without external
  * libraries (java.util.zip IS the zlib PNG requires); codec-heavy
  * formats (JPEG, H.264, …) still need native libs and remain out of
  * scope in this container.
  *
  * Format references: the public RIFF/WAVE and BMP file-format
  * specifications (Microsoft/IBM, 1991–1994) and RFC 2083 (PNG).
  */
object MediaCodec {

  // ------------------------------------------------------------------
  // WAV (RIFF / PCM)
  // ------------------------------------------------------------------

  final case class WavData(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int])

  /** Encode PCM16LE mono samples as a canonical 44-byte-header WAV. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(1.toShort) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2.toShort)    // block align
      .putShort(16.toShort)   // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  /** Decode a RIFF/WAVE byte payload: walks chunks to `fmt ` and
    * `data`, validates PCM, extracts samples (8-bit unsigned or
    * 16-bit signed LE). Throws on malformed input.
    */
  def decodeWav(bytes: Array[Byte]): WavData = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF container")
    bb.getInt // riff size
    require(fourcc() == "WAVE", "not a WAVE file")
    var sampleRate = -1; var channels = -1; var bits = -1
    var data: Array[Byte] = null
    while (bb.remaining() >= 8 && (data == null || sampleRate < 0)) {
      val id = fourcc()
      val len = bb.getInt
      id match {
        case "fmt " =>
          val fmt = bb.getShort()
          require(fmt == 1, s"only PCM supported, got format $fmt")
          channels = bb.getShort()
          sampleRate = bb.getInt
          bb.getInt; bb.getShort() // byte rate, block align
          bits = bb.getShort()
          require(bits == 8 || bits == 16, s"unsupported bit depth $bits")
          if (len > 16) bb.position(bb.position() + (len - 16))
        case "data" =>
          data = new Array[Byte](len); bb.get(data)
        case _ => // skip unknown chunk (word-aligned)
          bb.position(bb.position() + len + (len & 1))
      }
    }
    require(sampleRate > 0 && data != null, "missing fmt/data chunk")
    val samples =
      if (bits == 16) {
        val sb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
        Array.fill(data.length / 2)(sb.getShort().toInt)
      } else data.map(b => (b & 0xff) - 128)
    WavData(sampleRate, channels, bits, samples)
  }

  // ------------------------------------------------------------------
  // BMP (uncompressed 24-bpp, BITMAPINFOHEADER)
  // ------------------------------------------------------------------

  final case class BmpData(width: Int, height: Int,
      /** row-major top-down (r, g, b) triples */
      pixels: Array[(Int, Int, Int)])

  /** Encode 24-bpp pixels (row-major top-down) as a standard
    * bottom-up BMP with 4-byte row padding.
    */
  def encodeBmp24(width: Int, height: Int, pixels: Array[(Int, Int, Int)]): Array[Byte] = {
    require(pixels.length == width * height)
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataLen = rowSize * height
    val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel offset
    bb.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
      .putShort(1.toShort).putShort(24.toShort) // planes, bpp
      .putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up rows, BGR byte order, padded to 4 bytes
    (height - 1) to 0 by -1 foreach { y =>
      var x = 0
      while (x < width) {
        val (r, g, b) = pixels(y * width + x)
        bb.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      (width * 3 until rowSize).foreach(_ => bb.put(0.toByte))
    }
    bb.array()
  }

  /** Decode an uncompressed 24-bpp BMP (positive height = bottom-up
    * rows, 4-byte padding) to row-major top-down pixels.
    */
  def decodeBmp(bytes: Array[Byte]): BmpData = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP")
    bb.getInt; bb.getShort(); bb.getShort()
    val pixelOffset = bb.getInt
    val hdrSize = bb.getInt
    require(hdrSize >= 40, s"unsupported DIB header size $hdrSize")
    val width = bb.getInt
    val height = bb.getInt
    require(height > 0, "top-down BMPs not supported")
    bb.getShort()
    val bpp = bb.getShort()
    require(bpp == 24, s"only 24-bpp supported, got $bpp")
    val compression = bb.getInt
    require(compression == 0, "compressed BMPs not supported")
    val rowSize = (width * 3 + 3) / 4 * 4
    val pixels = new Array[(Int, Int, Int)](width * height)
    var y = 0
    while (y < height) {
      // file rows are bottom-up: file row y holds image row height-1-y
      val base = pixelOffset + y * rowSize
      val imgY = height - 1 - y
      var x = 0
      while (x < width) {
        val b = bytes(base + x * 3) & 0xff
        val g = bytes(base + x * 3 + 1) & 0xff
        val r = bytes(base + x * 3 + 2) & 0xff
        pixels(imgY * width + x) = (r, g, b)
        x += 1
      }
      y += 1
    }
    BmpData(width, height, pixels)
  }

  /** Linear-interpolation resample of a PCM channel to `m` samples in
    * EXACT fixed-point (the 1-D twin of [[resizeBilinearScaled]]):
    * target index t samples source position t·(n-1)/(m-1)
    * (corner-aligned) and returned values are scaled by (m-1), so
    * every weight is an integer — sample-rate conversion whose output
    * an SQL oracle replays exactly.
    */
  def resampleLinearScaled(samples: Array[Int], m: Int): Array[Long] = {
    val n = samples.length
    Array.tabulate(m) { t =>
      val num = t.toLong * (n - 1)
      val q = (num / (m - 1)).toInt; val r = num % (m - 1)
      val q1 = math.min(q + 1, n - 1)
      (m - 1L - r) * samples(q) + r * samples(q1)
    }
  }

  /** Bilinear resize to `tw × th` in EXACT fixed-point arithmetic:
    * target pixel (tx,ty) samples source coordinate
    * (tx·(sw-1)/(tw-1), ty·(sh-1)/(th-1)) (corner-aligned), and the
    * returned RGB values are scaled by D = (tw-1)·(th-1) so every
    * weight is an integer and the result is exact — no float weights,
    * so an SQL oracle replays the kernel bit-for-bit and a mean needs
    * only one IEEE division at the end. Index clamps cover the rx=0 /
    * ry=0 edge where the right/bottom neighbor's weight is zero.
    */
  def resizeBilinearScaled(img: BmpData, tw: Int, th: Int): Array[(Long, Long, Long)] = {
    val (sw, sh) = (img.width, img.height)
    Array.tabulate(tw * th) { i =>
      val (tx, ty) = (i % tw, i / tw)
      val nx = tx * (sw - 1); val ny = ty * (sh - 1)
      val qx = nx / (tw - 1); val rx = nx % (tw - 1)
      val qy = ny / (th - 1); val ry = ny % (th - 1)
      val qx1 = math.min(qx + 1, sw - 1); val qy1 = math.min(qy + 1, sh - 1)
      val p00 = img.pixels(qy * sw + qx); val p10 = img.pixels(qy * sw + qx1)
      val p01 = img.pixels(qy1 * sw + qx); val p11 = img.pixels(qy1 * sw + qx1)
      def mix(c00: Int, c10: Int, c01: Int, c11: Int): Long =
        (tw - 1L - rx) * (th - 1L - ry) * c00 + rx.toLong * (th - 1L - ry) * c10 +
          (tw - 1L - rx) * ry.toLong * c01 + rx.toLong * ry.toLong * c11
      (mix(p00._1, p10._1, p01._1, p11._1),
        mix(p00._2, p10._2, p01._2, p11._2),
        mix(p00._3, p10._3, p01._3, p11._3))
    }
  }

  /** Nearest-neighbor downsample to `tw × th` (a real resize kernel —
    * the op a training pipeline runs per image).
    */
  def resizeNearest(img: BmpData, tw: Int, th: Int): Array[(Int, Int, Int)] =
    Array.tabulate(tw * th) { i =>
      val (tx, ty) = (i % tw, i / tw)
      val sx = tx * img.width / tw
      val sy = ty * img.height / th
      img.pixels(sy * img.width + sx)
    }

  // ------------------------------------------------------------------
  // GVID — a minimal length-prefixed video container over BMP frames
  // (magic + frame count + per-frame [u32 length | BMP payload]):
  // the frame-extraction path of the multimodal tier with REAL
  // per-frame image decoding. Real video codecs (H.264…) need native
  // libs; the container walk + per-frame decode IS the distributed
  // shape a keyframe pipeline runs.
  // ------------------------------------------------------------------

  /** Encode frames (each as a standard BMP) into a GVID container. */
  def encodeGvid(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 6 + frames.map(4 + _.length).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("GVID".getBytes("US-ASCII")).putShort(frames.length.toShort)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  /** Decode a GVID container to its BMP frames. Throws on malformed
    * input (bad magic, truncated frame, non-BMP payload).
    */
  def decodeGvid(bytes: Array[Byte]): Seq[BmpData] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); bb.get(magic)
    require(new String(magic, "US-ASCII") == "GVID", "not a GVID container")
    val n = bb.getShort().toInt
    require(n >= 0, s"negative frame count $n")
    (0 until n).map { i =>
      require(bb.remaining() >= 4, s"truncated header of frame $i")
      val len = bb.getInt
      require(len > 0 && bb.remaining() >= len, s"truncated frame $i")
      val f = new Array[Byte](len); bb.get(f)
      decodeBmp(f)
    }
  }

  /** Walk a GVID container's length prefixes and return the encoded
    * byte size of each frame WITHOUT decoding the payloads — the cheap
    * manifest pass a frame-sampling pipeline runs before deciding
    * which frames to decode.
    */
  def gvidFrameSizes(bytes: Array[Byte]): Seq[Int] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); bb.get(magic)
    require(new String(magic, "US-ASCII") == "GVID", "not a GVID container")
    val n = bb.getShort().toInt
    require(n >= 0, s"negative frame count $n")
    (0 until n).map { i =>
      require(bb.remaining() >= 4, s"truncated header of frame $i")
      val len = bb.getInt
      require(len > 0 && bb.remaining() >= len, s"truncated frame $i")
      bb.position(bb.position() + len)
      len
    }
  }

  // ------------------------------------------------------------------
  // JPEG via the JDK's bundled codec (java.desktop — part of the JVM,
  // not an external dependency): unlike WAV/BMP/PNG/GVID above this is
  // NOT a hand-written parser; it exists to make the LOSSY-format path
  // honest — real DCT compression with real reconstruction error,
  // which is why its oracle asserts error BOUNDS, not bit equality.
  // ------------------------------------------------------------------

  /** Encode 24-bpp pixels as baseline JPEG at an EXPLICIT quality (0.9):
    * the writer's default quality is JVM-implementation specific, and the
    * downstream oracle asserts a reconstruction-error bound — pinning the
    * quality keeps that bound under the repo's control across JDK upgrades.
    */
  def encodeJpeg(width: Int, height: Int, pixels: Array[(Int, Int, Int)]): Array[Byte] = {
    require(pixels.length == width * height)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < pixels.length) {
      val (r, g, b) = pixels(i)
      img.setRGB(i % width, i / width, (r << 16) | (g << 8) | b)
      i += 1
    }
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
    require(writers.hasNext, "no JPEG writer")
    val writer = writers.next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.9f)
    val bos = new java.io.ByteArrayOutputStream()
    // MEMORY-cached stream, explicitly: ImageIO.createImageOutputStream
    // defaults to a DISK-backed cache file per call (useCache=true), so a
    // 32-thread executor decoding millions of payloads hammers the local
    // filesystem with temp-file create/delete churn — measured super-linear
    // at sf10 (18x on 10x docs). The whole image lives in memory anyway.
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode a JPEG to row-major top-down pixels. Throws on malformed
    * input (ImageIO returns null or errors on garbage).
    */
  def decodeJpeg(bytes: Array[Byte]): BmpData = {
    // Memory-cached input for the same reason as encodeJpeg: the
    // InputStream overload of ImageIO.read spools through a disk cache
    // file per call by default.
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // ImageIO.read(ImageInputStream) closes the stream itself on success;
    // on the null (no-reader) path the in-memory stream is just GC'd.
    val img = javax.imageio.ImageIO.read(iis)
    require(img != null, "not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val pixels = Array.tabulate(w * h) { i =>
      val rgb = img.getRGB(i % w, i / w)
      ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
    }
    BmpData(w, h, pixels)
  }

  /** Build a raw JPEG marker segment: FF <marker> <len16> <payload>,
    * where len16 (big-endian) counts itself plus the payload (T.81
    * B.1.1.4).
    */
  def jpegSegment(marker: Int, payload: Array[Byte]): Array[Byte] = {
    val len = payload.length + 2
    require(len <= 0xFFFF, "segment payload too large")
    val b = new Array[Byte](4 + payload.length)
    b(0) = 0xFF.toByte
    b(1) = marker.toByte
    b(2) = ((len >> 8) & 0xFF).toByte
    b(3) = (len & 0xFF).toByte
    System.arraycopy(payload, 0, b, 4, payload.length)
    b
  }

  /** Splice raw marker segments immediately after SOI — how Exif/XMP
    * metadata enters a JPEG in the wild (T.81 allows APPn anywhere
    * between SOI and SOS; writers put them first).
    */
  def injectJpegSegments(jpeg: Array[Byte], segments: Seq[Array[Byte]]): Array[Byte] = {
    require(jpeg.length >= 2 && jpeg(0) == 0xFF.toByte && jpeg(1) == 0xD8.toByte,
      "not a JPEG (missing SOI)")
    val out = new java.io.ByteArrayOutputStream(
      jpeg.length + segments.map(_.length).sum)
    out.write(jpeg, 0, 2)
    segments.foreach(s => out.write(s, 0, s.length))
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  /** Strip metadata segments — APP1..APP15 (Exif, XMP, ICC, Photoshop)
    * and COM — from a baseline JPEG, preserving APP0/JFIF and every
    * structural segment (DQT/DHT/SOF/DRI/SOS) byte-for-byte. Walks the
    * marker stream to SOS, then copies the entropy-coded tail
    * verbatim. Returns (cleaned bytes, segments removed, bytes
    * removed). Stripping MUST NOT change the decoded image — the
    * F19 query asserts pixel equality per row.
    */
  def stripJpegMetadata(jpeg: Array[Byte]): (Array[Byte], Int, Long) = {
    require(jpeg.length >= 2 && jpeg(0) == 0xFF.toByte && jpeg(1) == 0xD8.toByte,
      "not a JPEG (missing SOI)")
    val out = new java.io.ByteArrayOutputStream(jpeg.length)
    out.write(jpeg, 0, 2)
    var i = 2
    var nRemoved = 0
    var bytesRemoved = 0L
    var sos = false
    while (!sos && i + 1 < jpeg.length) {
      require(jpeg(i) == 0xFF.toByte, s"expected marker at offset $i")
      val m = jpeg(i + 1) & 0xFF
      if (m == 0xDA) { // SOS: entropy-coded data follows — copy the rest
        out.write(jpeg, i, jpeg.length - i)
        sos = true
      } else {
        val len = ((jpeg(i + 2) & 0xFF) << 8) | (jpeg(i + 3) & 0xFF)
        val segLen = 2 + len
        if ((m >= 0xE1 && m <= 0xEF) || m == 0xFE) {
          nRemoved += 1
          bytesRemoved += segLen
        } else out.write(jpeg, i, segLen)
        i += segLen
      }
    }
    (out.toByteArray, nRemoved, bytesRemoved)
  }

  // ------------------------------------------------------------------
  // PNG (RFC 2083): 8-bit truecolor (RGB) / truecolor+alpha, zlib
  // (Inflater/Deflater) IDAT, per-scanline filters 0-4 — the first
  // COMPRESSED format in the tier, still decodable with nothing but
  // the JVM (java.util.zip carries the zlib the spec requires).
  // ------------------------------------------------------------------

  final case class PngData(width: Int, height: Int, hasAlpha: Boolean,
      /** row-major top-down (r, g, b) triples */
      pixels: Array[(Int, Int, Int)],
      /** per-pixel alpha; all-255 for RGB images */
      alpha: Array[Int])

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  private def pngChunk(bb: ByteBuffer, chunkType: String, data: Array[Byte]): Unit = {
    bb.putInt(data.length)
    val t = chunkType.getBytes("US-ASCII")
    bb.put(t).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    bb.putInt(crc.getValue.toInt)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode 8-bit RGB(A) pixels as a standard PNG. `filterOf` picks
    * the filter type per scanline (default cycles 0-4, so a round-trip
    * exercises every de-filter path — a real encoder would pick per
    * row by heuristic; any choice is spec-valid).
    */
  def encodePng(width: Int, height: Int, pixels: Array[(Int, Int, Int)],
      alpha: Option[Array[Int]] = None,
      filterOf: Int => Int = _ % 5): Array[Byte] = {
    require(pixels.length == width * height)
    alpha.foreach(a => require(a.length == width * height))
    val bpp = if (alpha.isDefined) 4 else 3
    val stride = width * bpp
    // raw scanlines
    val raw = Array.ofDim[Byte](height, stride)
    var i = 0
    while (i < pixels.length) {
      val (x, y) = (i % width, i / width)
      val (r, g, b) = pixels(i)
      raw(y)(x * bpp) = r.toByte
      raw(y)(x * bpp + 1) = g.toByte
      raw(y)(x * bpp + 2) = b.toByte
      alpha.foreach(a => raw(y)(x * bpp + 3) = a(i).toByte)
      i += 1
    }
    // filter, concatenate (1 filter byte + stride per row), deflate
    val filtered = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val f = filterOf(y)
      require(f >= 0 && f <= 4, s"invalid filter $f")
      filtered(y * (1 + stride)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = raw(y)(x) & 0xff
        val left = if (x >= bpp) raw(y)(x - bpp) & 0xff else 0
        val up = if (y > 0) raw(y - 1)(x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) raw(y - 1)(x - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        filtered(y * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idat = comp.toByteArray
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte)                                  // bit depth
      .put((if (alpha.isDefined) 6 else 2).toByte)    // color type
      .put(0.toByte).put(0.toByte).put(0.toByte)      // deflate/adaptive/no interlace
      .array()
    val out = ByteBuffer.allocate(
      PngSig.length + (12 + 13) + (12 + idat.length) + 12)
      .order(ByteOrder.BIG_ENDIAN)
    out.put(PngSig)
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "IDAT", idat)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.array()
  }

  /** Decode an 8-bit truecolor PNG (color type 2 or 6, deflate,
    * non-interlaced): signature + chunk walk with CRC validation,
    * multi-IDAT zlib inflate, and full filter reconstruction
    * (None/Sub/Up/Average/Paeth). Throws on malformed input.
    */
  def decodePng(bytes: Array[Byte]): PngData = {
    require(bytes.length >= PngSig.length &&
      PngSig.indices.forall(i => bytes(i) == PngSig(i)), "not a PNG")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    bb.position(PngSig.length)
    var width = -1; var height = -1; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(bb.remaining() >= 12, "truncated chunk")
      val len = bb.getInt
      require(len >= 0 && bb.remaining() >= len + 8, "truncated chunk body")
      val tBytes = new Array[Byte](4); bb.get(tBytes)
      val chunkType = new String(tBytes, "US-ASCII")
      val data = new Array[Byte](len); bb.get(data)
      val crc = new java.util.zip.CRC32
      crc.update(tBytes); crc.update(data)
      require(bb.getInt == crc.getValue.toInt, s"bad CRC in $chunkType")
      chunkType match {
        case "IHDR" =>
          val h = ByteBuffer.wrap(data).order(ByteOrder.BIG_ENDIAN)
          width = h.getInt; height = h.getInt
          val bitDepth = h.get(); colorType = h.get()
          require(bitDepth == 8, s"only 8-bit supported, got $bitDepth")
          require(colorType == 2 || colorType == 6,
            s"only truecolor/truecolor-alpha supported, got color type $colorType")
          require(h.get() == 0 && h.get() == 0 && h.get() == 0,
            "unsupported compression/filter/interlace method")
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _ => // ancillary chunk — skip
      }
    }
    require(width > 0 && height > 0, "missing IHDR")
    require(idat.size() > 0, "missing IDAT")
    val bpp = if (colorType == 6) 4 else 3
    val stride = width * bpp
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val filtered = new Array[Byte](height * (1 + stride))
    var off = 0
    while (!inflater.finished() && off < filtered.length) {
      val n = inflater.inflate(filtered, off, filtered.length - off)
      require(n > 0 || inflater.finished(), "bad zlib stream")
      off += n
    }
    inflater.end()
    require(off == filtered.length,
      s"decompressed $off bytes, expected ${filtered.length}")
    // reconstruct scanlines in place
    val raw = Array.ofDim[Byte](height, stride)
    var y = 0
    while (y < height) {
      val f = filtered(y * (1 + stride)) & 0xff
      require(f <= 4, s"invalid filter type $f on row $y")
      var x = 0
      while (x < stride) {
        val v = filtered(y * (1 + stride) + 1 + x) & 0xff
        val left = if (x >= bpp) raw(y)(x - bpp) & 0xff else 0
        val up = if (y > 0) raw(y - 1)(x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) raw(y - 1)(x - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y)(x) = ((v + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val n = width * height
    val pixels = new Array[(Int, Int, Int)](n)
    val alpha = new Array[Int](n)
    var i = 0
    while (i < n) {
      val (x, y2) = (i % width, i / width)
      pixels(i) = (raw(y2)(x * bpp) & 0xff, raw(y2)(x * bpp + 1) & 0xff,
        raw(y2)(x * bpp + 2) & 0xff)
      alpha(i) = if (bpp == 4) raw(y2)(x * bpp + 3) & 0xff else 255
      i += 1
    }
    PngData(width, height, colorType == 6, pixels, alpha)
  }
}
