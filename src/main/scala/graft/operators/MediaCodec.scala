package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal tier: RIFF/WAVE PCM audio
  * and BMP (BITMAPINFOHEADER, uncompressed 24-bpp) images. These are
  * REAL decoders — byte-level header parsing, chunk walking, sample
  * extraction, row-padding arithmetic — chosen because the formats are
  * decodable without external libraries; codec-heavy formats (JPEG,
  * H.264, …) still need native libs and remain out of scope in this
  * container.
  *
  * Format references: the public RIFF/WAVE and BMP file-format
  * specifications (Microsoft/IBM, 1991–1994).
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
}
