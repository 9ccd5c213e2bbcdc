package graft

import graft.multimodal.{FlacDecode, FlacSamples, MediaFile, MediaPipeline}
import org.scalatest.funsuite.AnyFunSuite

/** [[FlacDecode]] — the pure-JVM FLAC payload decoder (r16, VERDICT r15
  * item 8). The spec carries its own spec-correct bit-level ENCODER
  * (sync codes, UTF-8 frame numbers, Rice residuals, fixed/LPC
  * prediction, stereo decorrelation, wasted bits), so every test decodes
  * a stream whose exact PCM content is known and pins RMS against a
  * direct recomputation — an independent algorithm pin, not a fixture
  * hash. */
class FlacDecodeSpec extends AnyFunSuite {

  // ---- bit-level FLAC encoder (test-side, spec section numbers in
  // comments refer to RFC 9639) ------------------------------------------

  private class BitWriter {
    private val buf = collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nBits = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nBits += 1
      if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
    }
    def bits(v: Long, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => bit(((v >> i) & 1L).toInt))
    def align(): Unit = while (nBits != 0) bit(0)
    def raw(b: Array[Byte]): Unit = { require(nBits == 0); buf ++= b }
    def bytes: Array[Byte] = { require(nBits == 0); buf.toArray }
  }

  /** fLaC + STREAMINFO (the MediaPipelineSpec builder, duplicated here —
    * both are 20-line test scaffolding over the same public layout). */
  private def streamInfo(ch: Int, rate: Int, bits: Int,
                         totalSamples: Long): Array[Byte] = {
    val out = collection.mutable.ArrayBuffer[Byte]()
    out ++= "fLaC".getBytes("US-ASCII")
    out ++= Array[Byte](0x80.toByte, 0x00, 0x00, 34) // LAST=1, type 0
    out ++= Array[Byte](0x10, 0x00, 0x10, 0x00)
    out ++= Array.fill[Byte](6)(0)
    out += ((rate >> 12) & 0xff).toByte
    out += ((rate >> 4) & 0xff).toByte
    out += (((rate & 0xf) << 4) | ((ch - 1) << 1) | ((bits - 1) >> 4)).toByte
    out += ((((bits - 1) & 0xf) << 4) | ((totalSamples >> 32) & 0xf).toInt).toByte
    (3 to 0 by -1).foreach(s => out += ((totalSamples >> (8 * s)) & 0xff).toByte)
    out ++= Array.fill[Byte](16)(0)
    out.toArray
  }

  /** Frame header: fixed-blocksize strategy, block size from an 8-bit
    * header field (code 0b0110), rate + sample size from STREAMINFO,
    * frame number < 128 (1-byte UTF-8), CRC-8 written as 0 (the decoder
    * documents CRC skipping). */
  private def frameHeader(bw: BitWriter, blockSize: Int, chAsgn: Int,
                          frameNo: Int): Unit = {
    require(blockSize >= 1 && blockSize <= 256 && frameNo < 128)
    bw.bits(0x3ffe, 14) // sync
    bw.bit(0)           // reserved
    bw.bit(0)           // fixed-blocksize strategy
    bw.bits(6, 4)       // block size: 8-bit from header
    bw.bits(0, 4)       // sample rate: STREAMINFO
    bw.bits(chAsgn, 4)
    bw.bits(0, 3)       // sample size: STREAMINFO
    bw.bit(0)           // reserved
    bw.bits(frameNo, 8) // UTF-8 number, single byte
    bw.bits(blockSize - 1, 8)
    bw.bits(0, 8)       // CRC-8 (unverified by contract)
  }

  private def frameFooter(bw: BitWriter): Unit = {
    bw.align()
    bw.bits(0, 16) // CRC-16 (unverified by contract)
  }

  private def signed(bw: BitWriter, v: Long, n: Int): Unit =
    bw.bits(v & ((1L << n) - 1), n)

  private def riceResidual(bw: BitWriter, res: Seq[Long], param: Int): Unit = {
    bw.bits(0, 2)     // method 0: 4-bit Rice
    bw.bits(0, 4)     // partition order 0
    bw.bits(param, 4)
    res.foreach { v =>
      val u = (v << 1) ^ (v >> 63) // zigzag
      val q = (u >>> param).toInt
      (0 until q).foreach(_ => bw.bit(0))
      bw.bit(1)
      bw.bits(u & ((1L << param) - 1), param)
    }
  }

  private def subConstant(bw: BitWriter, v: Long, bps: Int): Unit = {
    bw.bit(0); bw.bits(0, 6); bw.bit(0)
    signed(bw, v, bps)
  }

  private def subVerbatim(bw: BitWriter, s: Seq[Long], bps: Int,
                          wasted: Int = 0): Unit = {
    bw.bit(0); bw.bits(1, 6)
    if (wasted == 0) bw.bit(0)
    else { bw.bit(1); (0 until wasted - 1).foreach(_ => bw.bit(0)); bw.bit(1) }
    s.foreach(v => signed(bw, v >> wasted, bps - wasted))
  }

  private def subFixed(bw: BitWriter, s: Seq[Long], order: Int, bps: Int,
                       param: Int): Unit = {
    bw.bit(0); bw.bits(8 + order, 6); bw.bit(0)
    s.take(order).foreach(v => signed(bw, v, bps))
    val res = (order until s.length).map { i =>
      val p = order match {
        case 0 => 0L
        case 1 => s(i - 1)
        case 2 => 2 * s(i - 1) - s(i - 2)
        case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
        case 4 => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
      }
      s(i) - p
    }
    riceResidual(bw, res, param)
  }

  private def subLpc(bw: BitWriter, s: Seq[Long], coefs: Seq[Long],
                     shift: Int, precision: Int, bps: Int,
                     param: Int): Unit = {
    val order = coefs.length
    bw.bit(0); bw.bits(0x20 | (order - 1), 6); bw.bit(0)
    s.take(order).foreach(v => signed(bw, v, bps))
    bw.bits(precision - 1, 4)
    signed(bw, shift, 5)
    coefs.foreach(c => signed(bw, c, precision))
    val res = (order until s.length).map { i =>
      val acc = coefs.indices.map(j => coefs(j) * s(i - 1 - j)).sum
      s(i) - (acc >> shift)
    }
    riceResidual(bw, res, param)
  }

  private def rmsOf(chans: Seq[Seq[Long]], bps: Int): Double = {
    val full = (1L << (bps - 1)).toDouble
    val sq = chans.flatMap(_.map(v => (v / full) * (v / full)))
    math.sqrt(sq.sum / sq.length)
  }

  // ---- decode pins -------------------------------------------------------

  test("CONSTANT subframe: exact RMS, layout from STREAMINFO") {
    val bw = new BitWriter
    bw.raw(streamInfo(1, 16000, 16, 64))
    frameHeader(bw, 64, 0, 0)
    subConstant(bw, 1000L, 16)
    frameFooter(bw)
    val got = FlacDecode.decodeFlac(bw.bytes)
    assert(got.contains(FlacSamples(1, 16000, 64, 1000.0 / 32768.0)))
  }

  test("VERBATIM subframe round-trips arbitrary samples") {
    val s = (0 until 96).map(i => ((i * 37) % 4001 - 2000).toLong)
    val bw = new BitWriter
    bw.raw(streamInfo(1, 44100, 16, 96))
    frameHeader(bw, 96, 0, 0)
    subVerbatim(bw, s, 16)
    frameFooter(bw)
    val got = FlacDecode.decodeFlac(bw.bytes).get
    assert(got.framesPerChan == 96)
    assert(math.abs(got.rms - rmsOf(Seq(s), 16)) < 1e-12)
  }

  test("FIXED predictors, every order 0-4, reconstruct exactly") {
    for (order <- 0 to 4) {
      val s = (0 until 128).map(i =>
        (50L * i - 3L * i * i / 4 + (i * 13 % 7) - 300))
      val bw = new BitWriter
      bw.raw(streamInfo(1, 8000, 16, 128))
      frameHeader(bw, 128, 0, 0)
      subFixed(bw, s, order, 16, param = 6)
      frameFooter(bw)
      val got = FlacDecode.decodeFlac(bw.bytes).get
      assert(math.abs(got.rms - rmsOf(Seq(s), 16)) < 1e-12,
        s"order $order RMS drifted")
    }
  }

  test("LPC subframe: quantized coefficients + shift, 64-bit accumulation") {
    val s = collection.mutable.ArrayBuffer[Long](100, -50)
    (2 until 160).foreach { i =>
      // generate a signal the predictor tracks loosely (residuals small
      // but nonzero — the Rice path does real work)
      s += ((3 * s(i - 1) - 2 * s(i - 2)) >> 1) + (i % 11) - 5
    }
    val bw = new BitWriter
    bw.raw(streamInfo(1, 22050, 16, 160))
    frameHeader(bw, 160, 0, 0)
    subLpc(bw, s.toSeq, coefs = Seq(3L, -2L), shift = 1, precision = 5,
      bps = 16, param = 4)
    frameFooter(bw)
    val got = FlacDecode.decodeFlac(bw.bytes).get
    assert(got.framesPerChan == 160)
    assert(math.abs(got.rms - rmsOf(Seq(s.toSeq), 16)) < 1e-12)
  }

  test("stereo decorrelation: left/side, right/side, mid/side all reconstruct") {
    val l = (0 until 64).map(i => (800L * math.sin(i * 0.3)).toLong)
    val r = (0 until 64).map(i => (600L * math.cos(i * 0.2)).toLong)
    val side = l.zip(r).map { case (a, b) => a - b }
    val mid = l.zip(r).map { case (a, b) => (a + b) >> 1 }
    val expect = rmsOf(Seq(l, r), 16)

    def stream(chAsgn: Int, sub0: (BitWriter) => Unit,
               sub1: (BitWriter) => Unit): Array[Byte] = {
      val bw = new BitWriter
      bw.raw(streamInfo(2, 48000, 16, 64))
      frameHeader(bw, 64, chAsgn, 0)
      sub0(bw); sub1(bw)
      frameFooter(bw)
      bw.bytes
    }
    // 8 = left/side (side carries bps+1), 9 = right/side, 10 = mid/side
    val ls = stream(8, subVerbatim(_, l, 16), subVerbatim(_, side, 17))
    val rs = stream(9, subVerbatim(_, side, 17), subVerbatim(_, r, 16))
    val ms = stream(10, subVerbatim(_, mid, 16), subVerbatim(_, side, 17))
    for ((name, bytes) <- Seq("left/side" -> ls, "right/side" -> rs,
                              "mid/side" -> ms)) {
      val got = FlacDecode.decodeFlac(bytes).get
      assert(math.abs(got.rms - expect) < 1e-12, s"$name RMS drifted")
    }
  }

  test("wasted bits shift back in; multiple frames accumulate") {
    val f1 = (0 until 32).map(i => (i * 8 - 128).toLong)  // multiples of 8
    val f2 = (0 until 32).map(i => (1024 - i * 4).toLong) // multiples of 4
    val bw = new BitWriter
    bw.raw(streamInfo(1, 8000, 16, 64))
    frameHeader(bw, 32, 0, 0)
    subVerbatim(bw, f1, 16, wasted = 3)
    frameFooter(bw)
    frameHeader(bw, 32, 0, 1)
    subVerbatim(bw, f2, 16, wasted = 2)
    frameFooter(bw)
    val got = FlacDecode.decodeFlac(bw.bytes).get
    assert(got.framesPerChan == 64)
    assert(math.abs(got.rms - rmsOf(Seq(f1 ++ f2), 16)) < 1e-12)
  }

  test("corrupt / truncated / oversized streams quarantine as None") {
    val bw = new BitWriter
    bw.raw(streamInfo(1, 16000, 16, 64))
    frameHeader(bw, 64, 0, 0)
    subConstant(bw, 1000L, 16)
    frameFooter(bw)
    val good = bw.bytes
    assert(FlacDecode.decodeFlac(good).isDefined)
    assert(FlacDecode.decodeFlac(good.dropRight(3)).isEmpty, "truncated")
    val badSync = good.clone()
    badSync(streamInfo(1, 16000, 16, 64).length) = 0x00 // break the sync code
    assert(FlacDecode.decodeFlac(badSync).isEmpty, "broken sync")
    assert(FlacDecode.decodeFlac(Array[Byte](1, 2, 3)).isEmpty, "not flac")
    // header-claimed sample count past the cap refuses BEFORE decoding
    assert(FlacDecode.decodeFlac(streamInfo(8, 192000, 16,
      1L << 30)).isEmpty, "zip-bomb claim")
  }

  test("MediaPipeline.decodeAudioSamples serves FLAC beside WAV") {
    val s = TestSpark.spark
    import s.implicits._
    val bw = new BitWriter
    bw.raw(streamInfo(1, 16000, 16, 64))
    frameHeader(bw, 64, 0, 0)
    subConstant(bw, 1000L, 16)
    frameFooter(bw)
    val rows = MediaPipeline.decodeAudioSamples(
      Seq(MediaFile(7L, "audio/flac", bw.bytes),
          MediaFile(8L, "audio/mp3", Array[Byte](0x49, 0x44, 0x33))).toDS())
      .collect()
    assert(rows.length == 1, "MP3 must still quarantine")
    assert(rows(0).doc_id == 7L && rows(0).n_frames_per_chan == 64L)
    assert(math.abs(rows(0).rms_amplitude - 1000.0 / 32768.0) < 1e-12)
  }
}
