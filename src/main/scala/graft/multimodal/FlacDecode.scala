package graft.multimodal

/** Decoded FLAC PCM facts: `framesPerChan` inter-channel sample frames,
  * RMS over all normalized samples (full-scale = 2^(bps−1), the
  * [[PixelDecode.decodeWavPcm]] convention). */
case class FlacSamples(channels: Int, sampleRate: Int,
                       framesPerChan: Long, rms: Double)

/** Pure-JVM FLAC payload decode (r16, VERDICT r15 item 8: "STREAMINFO +
  * fixed/LPC subframe decode is feasible without a codec dependency").
  * Built from the public xiph.org FLAC format spec (RFC 9639); reference
  * `main.go` has no media surface — this is engine-side multimodal
  * capability, like the PNG inflate path.
  *
  * Supported — the full lossless core every real encoder emits:
  *  - frame headers (both blocking strategies, all block-size and
  *    sample-size codes incl. the 8/16-bit get-from-header forms, the
  *    UTF-8-coded frame/sample number);
  *  - subframes CONSTANT, VERBATIM, FIXED (orders 0–4), LPC (orders
  *    1–32, signed quantized coefficients + shift, 64-bit accumulation);
  *  - Rice/Rice2 partitioned residuals incl. the escape-to-raw form and
  *    zigzag unfolding;
  *  - wasted-bits-per-sample shifting;
  *  - stereo decorrelation: left/side, right/side, mid/side (side
  *    channel carries the spec's +1 bit).
  *
  * Deliberate boundaries, all → None (quarantine, never crash):
  *  - CRC-8/CRC-16 are SKIPPED, not verified — this is a feature
  *    extractor, not a player; a corrupt stream that still parses
  *    structurally decodes to deterministic garbage exactly like a
  *    bit-flipped WAV would, and structural corruption returns None;
  *  - the zip-bomb discipline of the PNG path: total decoded samples
  *    are capped (header-claimed sizes bound every allocation BEFORE it
  *    happens), so a 1 KB payload cannot demand gigabytes.
  *
  * Determinism: integer arithmetic end-to-end until the final RMS —
  * bit-exact across JVMs (no codec library, no float DSP), the PNG/WAV
  * determinism class, NOT the ImageIO-JPEG class. */
object FlacDecode {

  /** Total decoded samples (frames × channels) cap — 2^24 samples ≈ 128
    * MiB of Long buffer upper bound per concurrent task, the PixelDecode
    * pixel-cap discipline. */
  private val MaxTotalSamples = 1L << 24

  /** Structural end-of-data / invalid-shape signal (control flow only —
    * mapped to None at the public boundary). */
  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  private final class BitReader(b: Array[Byte], startByte: Int) {
    private var pos = startByte.toLong * 8 // absolute bit position
    private val end = b.length.toLong * 8
    def bitsLeft: Long = end - pos
    def atByteBoundary: Boolean = (pos & 7) == 0
    def byteOffset: Int = (pos >> 3).toInt
    def readBit(): Int = {
      if (pos >= end) fail()
      val v = (b((pos >> 3).toInt) >> (7 - (pos & 7)).toInt) & 1
      pos += 1
      v
    }
    /** n ≤ 32 unsigned bits into a Long. */
    def readBits(n: Int): Long = {
      if (n < 0 || n > 32 || pos + n > end) fail()
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** n ≤ 32 bits, two's-complement signed. */
    def readSigned(n: Int): Long = {
      if (n == 0) return 0L
      val v = readBits(n)
      if ((v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    /** Unary: count of 0 bits before the terminating 1. */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        if (q > (1 << 20)) fail() // a runaway quotient is corruption
      }
      q
    }
    def alignByte(): Unit = { pos = (pos + 7) & ~7L }
    /** Skip the UTF-8-coded frame/sample number (1–7 bytes). */
    def skipUtf8Number(): Unit = {
      val first = readBits(8).toInt
      val cont =
        if ((first & 0x80) == 0) 0
        else if ((first & 0xe0) == 0xc0) 1
        else if ((first & 0xf0) == 0xe0) 2
        else if ((first & 0xf8) == 0xf0) 3
        else if ((first & 0xfc) == 0xf8) 4
        else if ((first & 0xfe) == 0xfc) 5
        else if (first == 0xfe) 6
        else fail()
      var i = 0
      while (i < cont) {
        if ((readBits(8) & 0xc0) != 0x80) fail()
        i += 1
      }
    }
  }

  /** Decode every audio frame of a FLAC payload to its PCM RMS. Returns
    * None for anything that is not a structurally valid FLAC stream this
    * decoder's boundaries cover. */
  def decodeFlac(b: Array[Byte]): Option[FlacSamples] = {
    val meta = AudioHeader.parse(b) match {
      case Some(m) if m.format == "flac" => m
      case _ => return None
    }
    try {
      // walk metadata blocks to the first audio frame
      var i = 4
      var last = false
      while (!last) {
        if (i + 4 > b.length) fail()
        last = (b(i) & 0x80) != 0
        val len = ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) |
          (b(i + 3) & 0xff)
        i += 4 + len
        if (i > b.length) fail()
      }
      val chans = meta.channels
      val spsBits = meta.bitsPerSample
      // header-claimed total bounds allocation up front (0 = unknown →
      // cap applies per-frame as we go)
      if (meta.durationSec.exists(d =>
            math.round(d * meta.sampleRate) * chans.toLong > MaxTotalSamples))
        return None

      val br = new BitReader(b, i)
      var sumSq = 0.0
      var nSamples = 0L
      var framesPerChan = 0L
      while (br.bitsLeft >= 32) {
        val (bs, samples) = decodeFrame(br, chans, spsBits)
        var c = 0
        while (c < chans) {
          val full = (1L << (spsBits - 1)).toDouble
          var t = 0
          while (t < bs) {
            val v = samples(c)(t) / full
            sumSq += v * v
            t += 1
          }
          c += 1
        }
        nSamples += bs.toLong * chans
        framesPerChan += bs
        if (nSamples > MaxTotalSamples) fail()
      }
      if (nSamples == 0) Some(FlacSamples(chans, meta.sampleRate, 0L, 0.0))
      else Some(FlacSamples(chans, meta.sampleRate, framesPerChan,
        math.sqrt(sumSq / nSamples)))
    } catch {
      case _: Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** One frame: header, per-channel subframes, decorrelation undo.
    * Returns (blockSize, channel-major samples). */
  private def decodeFrame(br: BitReader, chans: Int,
                          spsBits: Int): (Int, Array[Array[Long]]) = {
    if (!br.atByteBoundary) fail()
    val sync = br.readBits(14)
    if (sync != 0x3ffe) fail()
    if (br.readBit() != 0) fail() // reserved
    br.readBit()                  // blocking strategy — both fine
    val bsCode = br.readBits(4).toInt
    val srCode = br.readBits(4).toInt
    val chAsgn = br.readBits(4).toInt
    val ssCode = br.readBits(3).toInt
    if (br.readBit() != 0) fail() // reserved
    br.skipUtf8Number()
    val blockSize = bsCode match {
      case 0 => fail()
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => br.readBits(8).toInt + 1
      case 7 => br.readBits(16).toInt + 1
      case c => 256 << (c - 8)
    }
    srCode match { // value comes from STREAMINFO; header forms just skip
      case 12 => br.readBits(8)
      case 13 | 14 => br.readBits(16)
      case 15 => fail()
      case _ => ()
    }
    val bps = ssCode match {
      case 0 => spsBits
      case 1 => 8
      case 2 => 12
      case 3 => fail()
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
    }
    br.readBits(8) // CRC-8 — skipped, see object doc
    if (blockSize <= 0 || blockSize > 65536) fail()

    val (nSub, sideOf) = chAsgn match {
      case a if a <= 7 =>
        if (a + 1 != chans) fail()
        (chans, -1)
      case 8 | 9 | 10 =>
        if (chans != 2) fail()
        (2, if (chAsgn == 9) 0 else 1) // which subframe is the side
      case _ => fail()
    }
    val sub = Array.ofDim[Array[Long]](nSub)
    var c = 0
    while (c < nSub) {
      val extra = if (c == sideOf) 1 else 0 // side channel carries +1 bit
      sub(c) = decodeSubframe(br, blockSize, bps + extra)
      c += 1
    }
    br.alignByte()
    br.readBits(16) // CRC-16 — skipped

    // undo inter-channel decorrelation → (left, right) / passthrough
    val out = chAsgn match {
      case a if a <= 7 => sub
      case 8 => // left/side: right = left − side
        val l = sub(0); val s = sub(1)
        Array(l, Array.tabulate(blockSize)(t => l(t) - s(t)))
      case 9 => // right/side: left = right + side
        val s = sub(0); val r = sub(1)
        Array(Array.tabulate(blockSize)(t => r(t) + s(t)), r)
      case 10 => // mid/side
        val m = sub(0); val s = sub(1)
        val l = Array.ofDim[Long](blockSize)
        val r = Array.ofDim[Long](blockSize)
        var t = 0
        while (t < blockSize) {
          // spec reconstruction: mid was (l+r)>>1; shift mid left, OR in
          // side's low bit, then halve the sum/difference
          val mm = (m(t) << 1) | (s(t) & 1)
          l(t) = (mm + s(t)) >> 1
          r(t) = (mm - s(t)) >> 1
          t += 1
        }
        Array(l, r)
    }
    (blockSize, out)
  }

  private def decodeSubframe(br: BitReader, n: Int, bps: Int): Array[Long] = {
    if (br.readBit() != 0) fail() // padding
    val tpe = br.readBits(6).toInt
    val wasted =
      if (br.readBit() == 1) br.readUnary() + 1
      else 0
    val eff = bps - wasted
    if (eff <= 0 || eff > 33) fail()
    val out: Array[Long] = tpe match {
      case 0 => // CONSTANT
        val v = br.readSigned(eff)
        Array.fill(n)(v)
      case 1 => // VERBATIM
        Array.fill(n)(br.readSigned(eff))
      case t if (t & 0x38) == 0x08 && (t & 0x07) <= 4 => // FIXED
        val order = t & 0x07
        decodeFixed(br, n, eff, order)
      case t if (t & 0x20) != 0 => // LPC
        val order = (t & 0x1f) + 1
        decodeLpc(br, n, eff, order)
      case _ => fail()
    }
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  private def decodeFixed(br: BitReader, n: Int, bps: Int,
                          order: Int): Array[Long] = {
    if (order > n) fail()
    val s = Array.ofDim[Long](n)
    var i = 0
    while (i < order) { s(i) = br.readSigned(bps); i += 1 }
    readResidual(br, n, order, s)
    while (i < n) {
      val p = order match {
        case 0 => 0L
        case 1 => s(i - 1)
        case 2 => 2 * s(i - 1) - s(i - 2)
        case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
        case 4 => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
      }
      s(i) += p
      i += 1
    }
    s
  }

  private def decodeLpc(br: BitReader, n: Int, bps: Int,
                        order: Int): Array[Long] = {
    if (order > n || order > 32) fail()
    val s = Array.ofDim[Long](n)
    var i = 0
    while (i < order) { s(i) = br.readSigned(bps); i += 1 }
    val precision = br.readBits(4).toInt + 1
    if (precision == 16) fail() // 0b1111 is invalid per spec
    val shift = br.readSigned(5).toInt
    if (shift < 0) fail()
    val coef = Array.ofDim[Long](order)
    var j = 0
    while (j < order) { coef(j) = br.readSigned(precision); j += 1 }
    readResidual(br, n, order, s)
    while (i < n) {
      var acc = 0L
      j = 0
      while (j < order) { acc += coef(j) * s(i - 1 - j); j += 1 }
      s(i) += (acc >> shift)
      i += 1
    }
    s
  }

  /** Partitioned Rice residual, written into s(order until n). */
  private def readResidual(br: BitReader, n: Int, order: Int,
                           s: Array[Long]): Unit = {
    val method = br.readBits(2).toInt
    val (paramBits, escape) = method match {
      case 0 => (4, 0xf)
      case 1 => (5, 0x1f)
      case _ => fail()
    }
    val partOrder = br.readBits(4).toInt
    val parts = 1 << partOrder
    if ((n & (parts - 1)) != 0 || (n >> partOrder) <= 0) fail()
    val perPart = n >> partOrder
    if (perPart <= order && partOrder == 0) fail()
    var i = order
    var p = 0
    while (p < parts) {
      val count = if (p == 0) perPart - order else perPart
      if (count < 0) fail()
      val param = br.readBits(paramBits).toInt
      if (param == escape) {
        val raw = br.readBits(5).toInt
        var k = 0
        while (k < count) {
          s(i) = if (raw == 0) 0L else br.readSigned(raw)
          i += 1; k += 1
        }
      } else {
        var k = 0
        while (k < count) {
          val q = br.readUnary().toLong
          val r = br.readBits(param)
          val u = (q << param) | r
          s(i) = (u >> 1) ^ -(u & 1L) // zigzag unfold
          i += 1; k += 1
        }
      }
      p += 1
    }
    if (i != n) fail()
  }
}
