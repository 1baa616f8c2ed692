package graft

import graft.operators.MediaCodec
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level behavior of the real WAV/BMP codecs — the properties the
  * closed-form oracle relies on.
  */
class MediaCodecSpec extends AnyFunSuite {

  test("WAV: PCM16 roundtrip preserves rate and samples exactly") {
    val samples = Array(0, 1, -1, 32767, -32768, 100, -100)
    val d = MediaCodec.decodeWav(MediaCodec.encodeWavPcm16(44100, samples))
    assert(d.sampleRate == 44100 && d.channels == 1 && d.bitsPerSample == 16)
    assert(d.samples.toSeq == samples.toSeq)
  }

  test("WAV: decoder walks past unknown chunks (incl. odd-length padding)") {
    val base = MediaCodec.encodeWavPcm16(8000, Array(5, -5, 7))
    // splice a 3-byte 'LIST' chunk (padded to 4) between WAVE and fmt
    val bb = java.nio.ByteBuffer.allocate(base.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(base, 0, 12)
    bb.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0))
    bb.put(base, 12, base.length - 12)
    val spliced = bb.array()
    // fix RIFF size
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val d = MediaCodec.decodeWav(spliced)
    assert(d.samples.toSeq == Seq(5, -5, 7))
  }

  test("WAV: malformed input fails loudly") {
    intercept[IllegalArgumentException] {
      MediaCodec.decodeWav("JUNKJUNKJUNKJUNK".getBytes)
    }
  }

  test("BMP: roundtrip across padded and unpadded widths") {
    // width 8 -> rowSize 24 (no pad); width 9 -> 27 -> padded to 28
    Seq(8, 9, 10, 11).foreach { w =>
      val h = 3
      val px = Array.tabulate(w * h)(i => (i % 256, (i * 2) % 256, (i * 3) % 256))
      val d = MediaCodec.decodeBmp(MediaCodec.encodeBmp24(w, h, px))
      assert(d.width == w && d.height == h)
      assert(d.pixels.toSeq == px.toSeq, s"roundtrip mismatch at width $w")
    }
  }

  test("BMP: row order is top-down after decode (bottom-up on disk)") {
    // 1x2 image: top pixel red, bottom pixel blue
    val px = Array((255, 0, 0), (0, 0, 255))
    val bytes = MediaCodec.encodeBmp24(1, 2, px)
    // on disk, the FIRST row after the 54-byte header must be the
    // BOTTOM image row (blue), stored BGR
    assert((bytes(54) & 0xff) == 255 && (bytes(56) & 0xff) == 0, "disk row 0 = blue")
    val d = MediaCodec.decodeBmp(bytes)
    assert(d.pixels.toSeq == px.toSeq)
  }

  test("nearest-neighbor resize picks the exact source pixels") {
    val w = 8; val h = 4
    val px = Array.tabulate(w * h)(i => (i, 0, 0))
    val img = MediaCodec.BmpData(w, h, px)
    val t = MediaCodec.resizeNearest(img, 4, 2)
    // target (tx,ty) -> source (tx*8/4, ty*4/2) = (2tx, 2ty)
    val expect = for (ty <- 0 until 2; tx <- 0 until 4)
      yield ((2 * ty) * w + 2 * tx, 0, 0)
    assert(t.toSeq == expect)
  }

  test("PNG: RGB roundtrip under every filter type (None/Sub/Up/Avg/Paeth)") {
    val w = 7; val h = 6 // 6 rows: cycles through all 5 filters + one repeat
    val px = Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      ((x * 37 + y * 11) % 256, (x * 5 + y * 91) % 256, (x * 17 + y * 3) % 256)
    }
    // per-row cycling filter (default), plus each filter uniformly
    (Seq[Int => Int](_ % 5) ++ (0 to 4).map(f => (_: Int) => f)).foreach { fo =>
      val d = MediaCodec.decodePng(MediaCodec.encodePng(w, h, px, filterOf = fo))
      assert(d.width == w && d.height == h && !d.hasAlpha)
      assert(d.pixels.toSeq == px.toSeq)
      assert(d.alpha.forall(_ == 255))
    }
  }

  test("PNG: RGBA roundtrip carries the alpha channel") {
    val w = 5; val h = 5
    val px = Array.tabulate(w * h)(i => (i % 256, (i * 3) % 256, (i * 7) % 256))
    val a = Array.tabulate(w * h)(i => (i * 13) % 256)
    val d = MediaCodec.decodePng(MediaCodec.encodePng(w, h, px, alpha = Some(a)))
    assert(d.hasAlpha && d.pixels.toSeq == px.toSeq && d.alpha.toSeq == a.toSeq)
  }

  test("JPEG (JDK codec): lossy roundtrip preserves dims and bounded means") {
    val w = 24; val h = 16
    val px = Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      ((x * 255) / (w - 1), (y * 255) / (h - 1), 128)
    }
    val d = MediaCodec.decodeJpeg(MediaCodec.encodeJpeg(w, h, px))
    assert(d.width == w && d.height == h)
    def mean(f: ((Int, Int, Int)) => Int, ps: Array[(Int, Int, Int)]) =
      ps.map(f).sum.toDouble / ps.length
    assert(math.abs(mean(_._1, d.pixels) - mean(_._1, px)) <= 4.0)
    assert(math.abs(mean(_._3, d.pixels) - 128.0) <= 4.0)
    assertThrows[IllegalArgumentException](
      MediaCodec.decodeJpeg("definitely not a jpeg".getBytes))
  }

  test("GVID: container roundtrip decodes every frame; malformed fails") {
    val frames = (0 until 3).map(f =>
      MediaCodec.encodeBmp24(2, 2, Array.fill(4)((f * 10, f * 20, f * 30))))
    val d = MediaCodec.decodeGvid(MediaCodec.encodeGvid(frames))
    assert(d.length == 3)
    assert(d(1).pixels.forall(_ == (10, 20, 30)))
    assertThrows[IllegalArgumentException](
      MediaCodec.decodeGvid("AVI?xxxx".getBytes))
    val good = MediaCodec.encodeGvid(frames)
    assertThrows[IllegalArgumentException](
      MediaCodec.decodeGvid(good.take(good.length - 10)))
    // manifest pass: per-frame encoded sizes without decoding pixels
    assert(MediaCodec.gvidFrameSizes(good) == frames.map(_.length))
    assertThrows[IllegalArgumentException](
      MediaCodec.gvidFrameSizes(good.take(good.length - 10)))
  }

  test("JPEG (hand-rolled): baseline decode agrees with the JDK decoder") {
    import graft.operators.JpegCodec
    // sizes straddling MCU boundaries (16x16 multiples, remainders both
    // directions) — gradient content like the F12/F13 queries
    for ((w, h) <- Seq((16, 16), (16, 12), (23, 17), (40, 25), (8, 8), (64, 48))) {
      val px = Array.tabulate(w * h) { i =>
        val (x, y) = (i % w, i / w)
        ((x * 255) / math.max(w - 1, 1), (y * 255) / math.max(h - 1, 1),
          ((x + y) * 255) / math.max(w + h - 2, 1))
      }
      val jpeg = MediaCodec.encodeJpeg(w, h, px)
      val jdk = MediaCodec.decodeJpeg(jpeg)
      val own = JpegCodec.decodeBaseline(jpeg)
      assert(own.width == w && own.height == h)
      assert(jdk.width == w && jdk.height == h)
      // per-pixel agreement with the JDK decoder: same Huffman/DCT math,
      // upsampling policy may differ (ours is box, libjpeg's is fancy)
      val diffs = own.pixels.zip(jdk.pixels).map { case ((a, b, c), (d, e, f)) =>
        (math.abs(a - d) + math.abs(b - e) + math.abs(c - f)) / 3.0
      }
      val meanDiff = diffs.sum / diffs.length
      assert(meanDiff <= 2.0,
        f"$w x $h: mean |own-jdk| $meanDiff%.2f > 2")
      // and the honest-reconstruction bound vs the ORIGINAL pixels —
      // the same +-4 channel-mean contract the F12 query enforces
      def mean(f: ((Int, Int, Int)) => Int, ps: Array[(Int, Int, Int)]) =
        ps.foldLeft(0L)((s, t) => s + f(t)).toDouble / ps.length
      for (ch <- Seq[((Int, Int, Int)) => Int](_._1, _._2, _._3))
        assert(math.abs(mean(ch, own.pixels) - mean(ch, px)) <= 4.0,
          s"$w x $h: hand-decoded channel mean off the original by > 4")
    }
    // non-JPEG input fails loudly
    assertThrows[IllegalArgumentException](
      JpegCodec.decodeBaseline("not a jpeg at all".getBytes))
  }

  test("PNG: malformed input fails loudly") {
    val good = MediaCodec.encodePng(3, 3,
      Array.fill(9)((1, 2, 3)), filterOf = _ => 0)
    // not a PNG
    assertThrows[IllegalArgumentException](
      MediaCodec.decodePng("JFIF-ish".getBytes))
    // corrupt a byte inside the IDAT payload -> CRC mismatch
    val corrupt = good.clone()
    corrupt(good.length - 13) = (corrupt(good.length - 13) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](MediaCodec.decodePng(corrupt))
    assert(e.getMessage.contains("CRC"))
    // truncated stream
    assertThrows[IllegalArgumentException](
      MediaCodec.decodePng(good.take(good.length - 6)))
  }

  test("JPEG metadata strip: removes APPn/COM exactly, keeps the image") {
    val px = Array.tabulate(24 * 16) { i =>
      val (x, y) = (i % 24, i / 24)
      ((x * 11) % 256, (y * 17) % 256, ((x + y) * 7) % 256)
    }
    val jpeg = MediaCodec.encodeJpeg(24, 16, px)
    // a clean encoder JPEG has no APP1..APP15/COM -> strip is identity
    val (same, n0, b0) = MediaCodec.stripJpegMetadata(jpeg)
    assert(n0 == 0 && b0 == 0L && same.sameElements(jpeg),
      "stripping a metadata-free JPEG must be the identity")
    // inject Exif + XMP + COM; strip must remove exactly those bytes
    val exif = MediaCodec.jpegSegment(0xE1, "Exif  junkjunk".getBytes("US-ASCII"))
    val com = MediaCodec.jpegSegment(0xFE, "gps=51.5,-0.1".getBytes("US-ASCII"))
    val tainted = MediaCodec.injectJpegSegments(jpeg, Seq(exif, com))
    assert(tainted.length == jpeg.length + exif.length + com.length)
    val (clean, n, b) = MediaCodec.stripJpegMetadata(tainted)
    assert(n == 2 && b == exif.length + com.length)
    assert(clean.sameElements(jpeg),
      "strip(inject(x)) must round-trip to the original bytes")
    // decoded image unchanged through the taint+strip round trip
    assert(MediaCodec.decodeJpeg(clean).pixels
      .sameElements(MediaCodec.decodeJpeg(tainted).pixels))
    // metadata segments may sit between structural segments, not just
    // after SOI: splice a COM after the APP0 block and strip again
    val app0End = {
      // in the CLEAN jpeg: SOI, then APP0 with its big-endian length
      assert((jpeg(3) & 0xFF) == 0xE0, "encoder JPEG must lead with APP0")
      val len = ((jpeg(4) & 0xFF) << 8) | (jpeg(5) & 0xFF)
      2 + 2 + len
    }
    val mid = jpeg.take(app0End) ++ com ++ jpeg.drop(app0End)
    val (clean2, n2, _) = MediaCodec.stripJpegMetadata(mid)
    assert(n2 == 1 && clean2.sameElements(jpeg))
    // garbage input fails loudly
    assertThrows[IllegalArgumentException](
      MediaCodec.stripJpegMetadata("BM not a jpeg".getBytes))
  }
}
