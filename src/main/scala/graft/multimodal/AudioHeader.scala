package graft.multimodal

/** Parsed audio-container header facts — what a training-data lake wants
  * to know about an audio payload WITHOUT decoding samples (sample-rate /
  * channel filters, duration budgeting, corrupt-file quarantine).
  * `durationSec` is the container-declared estimate (exact for WAV PCM,
  * exact for FLAC when the STREAMINFO total-samples field is populated,
  * first-frame-extrapolated for MP3 CBR; None when the container doesn't
  * say). */
case class AudioMeta(format: String, channels: Int, sampleRate: Int,
                     bitsPerSample: Int, durationSec: Option[Double])

/** Pure-JVM magic-dispatch header parsing for the three dominant audio
  * containers, from the public specs (the audio sibling of [[ImageHeader]];
  * same contract: first ~KB of the file, None for anything unparseable):
  *
  *  - WAV (RIFF, Microsoft/IBM spec): `RIFF` + u32le size + `WAVE`, then a
  *    chunk stream; the `fmt ` chunk carries format tag, channel count,
  *    sample rate, byte rate and bits-per-sample (all little-endian); the
  *    `data` chunk's size over the byte rate is the exact PCM duration.
  *  - FLAC (xiph.org spec): `fLaC` signature, then metadata blocks; the
  *    STREAMINFO block (type 0, MUST be first) packs sample rate (20 bits),
  *    channels−1 (3 bits), bits-per-sample−1 (5 bits) and total samples
  *    (36 bits) big-endian starting at byte 10 of the block payload.
  *  - MP3 (ISO 11172-3 / 13818-3): an optional ID3v2 tag (`ID3` + 6-byte
  *    header + syncsafe u28 size) precedes the first frame; a frame header
  *    is 4 bytes starting with an 11-bit sync (0xFFE), then MPEG version,
  *    layer, bitrate index and sample-rate index — enough for rate,
  *    channel mode and a CBR duration extrapolation from the payload size.
  */
object AudioHeader {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16le(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    u16le(b, i).toLong | (u16le(b, i + 2).toLong << 16)
  private def u16be(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u32be(b: Array[Byte], i: Int): Long =
    (u16be(b, i).toLong << 16) | u16be(b, i + 2)

  private def tag(b: Array[Byte], i: Int): String =
    if (i + 4 <= b.length) new String(b, i, 4, "US-ASCII") else ""

  /** Magic-dispatch: WAV, FLAC or MP3 header facts, None otherwise. */
  def parse(bytes: Array[Byte]): Option[AudioMeta] =
    if (tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE") parseWav(bytes)
    else if (tag(bytes, 0) == "fLaC") parseFlac(bytes)
    else parseMp3(bytes) // sync-word / ID3 dispatch happens inside

  /** WAV: chunk-walk to `fmt ` (and `data` for the exact duration).
    * Chunks are word-aligned: an odd-sized chunk carries a pad byte. */
  private def parseWav(b: Array[Byte]): Option[AudioMeta] = {
    var i = 12
    var meta: Option[(Int, Int, Long, Int)] = None // ch, rate, byteRate, bits
    var dataSize: Option[Long] = None
    while (i + 8 <= b.length && (meta.isEmpty || dataSize.isEmpty)) {
      val id = tag(b, i)
      val sz = u32le(b, i + 4)
      if (id == "fmt " && sz >= 16 && i + 8 + 16 <= b.length) {
        val ch = u16le(b, i + 10)
        val rate = u32le(b, i + 12)
        val byteRate = u32le(b, i + 16)
        val bits = u16le(b, i + 22)
        if (ch == 0 || rate <= 0 || rate > Int.MaxValue) return None
        meta = Some((ch, rate.toInt, byteRate, bits))
      } else if (id == "data") {
        dataSize = Some(sz)
      }
      i += 8 + sz.toInt + (sz.toInt & 1) // word alignment pad
      if (sz > Int.MaxValue) return None
    }
    meta.map { case (ch, rate, byteRate, bits) =>
      val dur = dataSize.filter(_ => byteRate > 0)
        .map(_.toDouble / byteRate.toDouble)
      AudioMeta("wav", ch, rate, bits, dur)
    }
  }

  /** FLAC: STREAMINFO-first invariant (spec: "the STREAMINFO block MUST
    * be the first metadata block"). Bit-packed fields start at payload
    * byte 10 (after min/max blocksize u16 + min/max framesize u24). */
  private def parseFlac(b: Array[Byte]): Option[AudioMeta] = {
    // sig(4) + block header(4) + STREAMINFO payload(34) = 42 bytes
    if (b.length < 42) return None
    val blockType = u8(b, 4) & 0x7f
    val blockLen = ((u8(b, 5) << 16) | u16be(b, 6)).toLong
    if (blockType != 0 || blockLen != 34L) return None
    val p = 8 // payload start
    // bytes p+10..p+17: rate(20) | ch-1(3) | bits-1(5) | totalSamples(36)
    val rate = (u8(b, p + 10) << 12) | (u8(b, p + 11) << 4) |
               (u8(b, p + 12) >> 4)
    val ch = ((u8(b, p + 12) >> 1) & 0x07) + 1
    val bits = (((u8(b, p + 12) & 0x01) << 4) | (u8(b, p + 13) >> 4)) + 1
    val totalSamples = ((u8(b, p + 13) & 0x0f).toLong << 32) |
                       u32be(b, p + 14)
    if (rate == 0) return None // spec: 0 is invalid in STREAMINFO
    val dur = if (totalSamples > 0) Some(totalSamples.toDouble / rate) else None
    Some(AudioMeta("flac", ch, rate, bits, dur))
  }

  // MPEG1 Layer III bitrate table (kbit/s, index 1-14) and sample rates.
  private val Mp3BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3RateV1 = Array(44100, 48000, 32000)
  private val Mp3RateV2 = Array(22050, 24000, 16000)
  private val Mp3RateV25 = Array(11025, 12000, 8000)

  /** MP3: skip a leading ID3v2 tag, then read the first frame header.
    * Duration = payload bytes / CBR byte rate — right for CBR files,
    * a first-frame extrapolation for VBR (the header carries no total). */
  private def parseMp3(b: Array[Byte]): Option[AudioMeta] = {
    var i = 0
    if (tag(b, 0).startsWith("ID3") && b.length >= 10) {
      // syncsafe u28: 4 × 7-bit groups, high bit of each byte zero
      val sz = (u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9)
      i = 10 + sz
    }
    if (i + 4 > b.length) return None
    val h = ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
             (u8(b, i + 2) << 8) | u8(b, i + 3))
    if ((h & 0xffe00000L) != 0xffe00000L) return None // 11-bit sync
    val versionBits = ((h >> 19) & 0x3).toInt // 0=v2.5, 2=v2, 3=v1
    val layerBits = ((h >> 17) & 0x3).toInt   // 1=III, 2=II, 3=I
    val bitrateIdx = ((h >> 12) & 0xf).toInt
    val rateIdx = ((h >> 10) & 0x3).toInt
    val channelMode = ((h >> 6) & 0x3).toInt  // 3 = mono
    if (versionBits == 1 || layerBits == 0 || rateIdx == 3 ||
        bitrateIdx == 0 || bitrateIdx == 15) return None
    val rate = versionBits match {
      case 3 => Mp3RateV1(rateIdx)
      case 2 => Mp3RateV2(rateIdx)
      case _ => Mp3RateV25(rateIdx)
    }
    // Bitrate table is version/layer-specific; V1-L3 covers the common
    // case and the others stay None-duration rather than guessing.
    val dur =
      if (versionBits == 3 && layerBits == 1)
        Some((b.length - i).toDouble * 8.0 /
             (Mp3BitrateV1L3(bitrateIdx) * 1000.0))
      else None
    val ch = if (channelMode == 3) 1 else 2
    Some(AudioMeta("mp3", ch, rate, 16, dur))
  }
}
