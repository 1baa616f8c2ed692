package graft.operators

/** Hand-rolled BASELINE JPEG (ITU-T T.81 / ISO 10918-1) decoder —
  * markers, canonical Huffman entropy decode, dequantization, 8×8
  * inverse DCT, subsampled-chroma upsampling and YCbCr→RGB, all from
  * the public spec with nothing but the JVM. Closes the last
  * honest-decode gap in the multimodal tier (WAV/BMP/PNG/GVID are
  * already hand-parsed; JPEG previously leaned on the JDK codec,
  * which remains as the encoder and as the parity reference in
  * MediaCodecSpec).
  *
  * Scope: baseline sequential DCT, 8-bit, 1 or 3 components, optional
  * restart intervals. Progressive (SOF2) and arithmetic coding are
  * rejected with a clear error — the JDK writer this repo encodes
  * with emits baseline only.
  */
object JpegCodec {

  final case class Decoded(width: Int, height: Int,
      pixels: Array[(Int, Int, Int)])

  /** Zigzag index -> natural (row-major) position in an 8×8 block. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table in the spec's decode form (F.2.2.3). */
  private final class HuffTable(counts: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val huffVal: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
  }

  private final class Component(val id: Int, val h: Int, val v: Int,
      val tq: Int) {
    var dcTable: HuffTable = _
    var acTable: HuffTable = _
    var pred: Int = 0
    var plane: Array[Int] = _
    var planeW: Int = 0
    var planeH: Int = 0
  }

  /** Entropy-coded-segment bit reader: un-stuffs FF00, stops cleanly
    * at any marker (restart or EOI) and lets the MCU loop consume it.
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0

    /** The marker (0xFFxx low byte) the reader ran into, or -1. */
    var pendingMarker: Int = -1

    def readBit(): Int = {
      if (bitCnt == 0) {
        if (pendingMarker >= 0) return 0 // spec: pad past marker with 0s
        if (pos >= data.length) { pendingMarker = 0xD9; return 0 }
        var b = data(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          val b2 = if (pos < data.length) data(pos) & 0xFF else 0xD9
          if (b2 == 0x00) { pos += 1 } // stuffed FF
          else { pendingMarker = b2; pos += 1; return 0 }
          b = 0xFF
        }
        bitBuf = b
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** Reset at a restart marker: drop partial bits, consume marker. */
    def restart(): Unit = { bitCnt = 0; pendingMarker = -1 }

    def decodeHuff(t: HuffTable): Int = {
      var code = readBit()
      var l = 1
      while (code > t.maxCode(l)) {
        code = (code << 1) | readBit()
        l += 1
        require(l <= 16, "corrupt Huffman stream")
      }
      t.huffVal(t.valPtr(l) + code - t.minCode(l))
    }
  }

  /** EXTEND (spec F.2.2.1): map a magnitude-coded value to signed. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0) *
      (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
  }

  /** Separable 2-D inverse DCT of one dequantized 8×8 block (natural
    * order in), level-shifted (+128) clamped samples out.
    */
  private def idct(coef: Array[Double], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: over u for each x
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosT(x)(u) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // columns: over v for each y
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CosT(yy)(v) * tmp(v * 8 + x); v += 1 }
        val p = math.round(s / 4.0 + 128.0).toInt
        out(yy * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        yy += 1
      }
      x += 1
    }
  }

  def decodeBaseline(bytes: Array[Byte]): Decoded = {
    var p = 0
    def u8(): Int = { val v = bytes(p) & 0xFF; p += 1; v }
    def u16(): Int = { val v = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF); p += 2; v }
    require(bytes.length > 4 && u16() == 0xFFD8, "not a JPEG (no SOI)")

    val quant = new Array[Array[Int]](4) // zigzag order, as stored
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var scanStart = -1

    // ---- marker segments until SOS ----
    while (scanStart < 0) {
      var m = u8()
      while (m != 0xFF) m = u8() // tolerate fill
      var marker = u8()
      while (marker == 0xFF) marker = u8()
      marker match {
        case 0xDB => // DQT
          val end = p + u16() - 2
          while (p < end) {
            val pqtq = u8()
            val tbl = new Array[Int](64)
            var i = 0
            while (i < 64) {
              tbl(i) = if ((pqtq >> 4) == 0) u8() else u16()
              i += 1
            }
            quant(pqtq & 0xF) = tbl
          }
        case 0xC0 | 0xC1 => // SOF0/1 (baseline / extended sequential)
          u16(); val prec = u8()
          require(prec == 8, s"unsupported precision $prec")
          height = u16(); width = u16()
          val n = u8()
          require(n == 1 || n == 3, s"unsupported component count $n")
          comps = Array.fill(n) {
            val id = u8(); val hv = u8(); val tq = u8()
            new Component(id, hv >> 4, hv & 0xF, tq)
          }
        case 0xC2 => sys.error("progressive JPEG (SOF2) not supported")
        case 0xC4 => // DHT
          val end = p + u16() - 2
          while (p < end) {
            val tcth = u8()
            val counts = Array.fill(16)(u8())
            val vals = Array.fill(counts.sum)(u8())
            val t = new HuffTable(counts, vals)
            if ((tcth >> 4) == 0) dcTables(tcth & 0xF) = t
            else acTables(tcth & 0xF) = t
          }
        case 0xDD => u16(); restartInterval = u16()
        case 0xDA => // SOS
          u16(); val ns = u8()
          var i = 0
          while (i < ns) {
            val id = u8(); val tdta = u8()
            val c = comps.find(_.id == id).getOrElse(sys.error(s"SOS comp $id"))
            c.dcTable = dcTables(tdta >> 4)
            c.acTable = acTables(tdta & 0xF)
            i += 1
          }
          p += 3 // Ss, Se, AhAl (fixed for baseline)
          scanStart = p
        case 0xD9 => sys.error("EOI before SOS")
        case _ => p += u16() - 2 // APPn, COM, anything else with length
      }
    }

    // ---- MCU geometry + per-component planes ----
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
    }

    // ---- entropy-coded scan ----
    val br = new BitReader(bytes, scanStart)
    val coef = new Array[Double](64)
    val block = new Array[Int](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        val rst = br.pendingMarker
        require(rst >= 0xD0 && rst <= 0xD7, s"expected RST, got $rst")
        br.restart()
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      comps.foreach { c =>
        val qt = quant(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0.0)
            val t = br.decodeHuff(c.dcTable)
            c.pred += extend(br.receive(t), t)
            coef(0) = c.pred.toDouble * qt(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = br.decodeHuff(c.acTable)
              val r = rs >> 4
              val sz = rs & 0xF
              if (sz == 0) { if (r == 15) k += 16 else eob = true }
              else {
                k += r
                require(k < 64, "AC run past block end")
                coef(Zigzag(k)) = extend(br.receive(sz), sz).toDouble * qt(k)
                k += 1
              }
            }
            idct(coef, block)
            val x0 = (mx * c.h + bx) * 8
            val y0 = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                c.plane((y0 + yy) * c.planeW + (x0 + xx)) = block(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
      }
      mcu += 1
    }

    // ---- upsample + color convert ----
    // center-aligned bilinear upsampling (libjpeg's "fancy" triangular
    // kernel is exactly this for 2× factors), clamped to each
    // component's VALID region — the MCU padding holds encoder slop
    def sample(c: Component, x: Int, y: Int): Double = {
      val validW = (width * c.h + hMax - 1) / hMax
      val validH = (height * c.v + vMax - 1) / vMax
      val fx = (x + 0.5) * c.h / hMax.toDouble - 0.5
      val fy = (y + 0.5) * c.v / vMax.toDouble - 0.5
      val x0 = math.floor(fx).toInt
      val y0 = math.floor(fy).toInt
      val ax = fx - x0
      val ay = fy - y0
      def at(sx: Int, sy: Int): Double = {
        val cx = math.max(0, math.min(sx, validW - 1))
        val cy = math.max(0, math.min(sy, validH - 1))
        c.plane(cy * c.planeW + cx).toDouble
      }
      (1 - ax) * (1 - ay) * at(x0, y0) + ax * (1 - ay) * at(x0 + 1, y0) +
        (1 - ax) * ay * at(x0, y0 + 1) + ax * ay * at(x0 + 1, y0 + 1)
    }
    def clamp(d: Double): Int = {
      val v = math.round(d).toInt
      if (v < 0) 0 else if (v > 255) 255 else v
    }
    val px = Array.tabulate(width * height) { i =>
      val x = i % width
      val y = i / width
      if (comps.length == 1) {
        val g = clamp(sample(comps(0), x, y)); (g, g, g)
      } else {
        val yv = sample(comps(0), x, y)
        val cb = sample(comps(1), x, y) - 128.0
        val cr = sample(comps(2), x, y) - 128.0
        (clamp(yv + 1.402 * cr),
          clamp(yv - 0.344136 * cb - 0.714136 * cr),
          clamp(yv + 1.772 * cb))
      }
    }
    Decoded(width, height, px)
  }
}
