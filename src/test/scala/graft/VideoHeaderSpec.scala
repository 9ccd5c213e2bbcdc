package graft

import graft.multimodal.{MediaFile, MediaPipeline, VideoHeader}
import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF (MP4) header parsing (r16) — the video sibling of the
  * image/audio probes, against hand-built spec-conformant boxes. Pins:
  * box walking (incl. 64-bit largesize), mvhd v0/v1 duration math, tkhd
  * v0/v1 16.16 presentation size, stsd codec fourcc, the unknown-duration
  * sentinel, non-BMFF refusal, and the pipeline probe stage. */
class VideoHeaderSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  // ---- box builders (ISO/IEC 14496-12 wire format) -------------------
  private def u32(v: Long): Array[Byte] = Array(
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def u64(v: Long): Array[Byte] = u32(v >> 32) ++ u32(v & 0xffffffffL)
  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val p = payload.flatten.toArray
    u32(8L + p.length) ++ tpe.getBytes("US-ASCII") ++ p
  }
  /** Same box forced through the size==1 largesize encoding. */
  private def bigBox(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val p = payload.flatten.toArray
    u32(1L) ++ tpe.getBytes("US-ASCII") ++ u64(16L + p.length) ++ p
  }

  private def ftyp(brand: String) =
    box("ftyp", brand.getBytes("US-ASCII"), u32(0), brand.getBytes("US-ASCII"))
  private def mvhdV0(timescale: Long, duration: Long) =
    box("mvhd", u32(0), u32(0), u32(0), u32(timescale), u32(duration),
      Array.fill[Byte](80)(0))
  private def mvhdV1(timescale: Long, duration: Long) =
    box("mvhd", Array[Byte](1, 0, 0, 0), u64(0), u64(0), u32(timescale),
      u64(duration), Array.fill[Byte](80)(0))
  private def tkhdV0(w: Int, h: Int) =
    box("tkhd", u32(0), u32(0), u32(0), u32(1), u32(0), u32(0),
      u64(0), u64(0),                             // reserved8 + layer/alt/vol/res
      Array.fill[Byte](36)(0),                    // matrix
      u32(w.toLong << 16), u32(h.toLong << 16))
  private def tkhdV1(w: Int, h: Int) =
    box("tkhd", Array[Byte](1, 0, 0, 0), u64(0), u64(0), u32(1), u32(0),
      u64(0), u64(0), u64(0),
      Array.fill[Byte](36)(0),
      u32(w.toLong << 16), u32(h.toLong << 16))
  private def stsd(codec: String) =
    box("stsd", u32(0), u32(1), box(codec, Array.fill[Byte](8)(0)))
  private def videoTrak(w: Int, h: Int, codec: String,
                        v1: Boolean = false) =
    box("trak", if (v1) tkhdV1(w, h) else tkhdV0(w, h),
      box("mdia", box("minf", box("stbl", stsd(codec)))))
  private def soundTrak() = box("trak", tkhdV0(0, 0),
    box("mdia", box("minf", box("stbl", stsd("mp4a")))))

  test("mvhd v0 + tkhd v0: brand, duration, size, codec, track count") {
    val mp4 = ftyp("isom") ++
      box("moov", mvhdV0(600, 1500), videoTrak(320, 240, "avc1"),
        soundTrak()) ++
      box("mdat", Array.fill[Byte](32)(7))
    val m = VideoHeader.parse(mp4).get
    assert(m.format == "mp4" && m.majorBrand == "isom")
    assert(m.nTracks == 2)
    assert(m.width == 320 && m.height == 240)
    assert(m.durationSec.contains(2.5)) // 1500 / 600
    assert(m.videoCodec.contains("avc1"))
  }

  test("mvhd v1 + tkhd v1 + 64-bit moov largesize parse identically") {
    val mp4 = ftyp("mp42") ++
      bigBox("moov", mvhdV1(90000, 450000),
        videoTrak(1920, 1080, "hvc1", v1 = true))
    val m = VideoHeader.parse(mp4).get
    assert(m.majorBrand == "mp42" && m.nTracks == 1)
    assert(m.width == 1920 && m.height == 1080)
    assert(m.durationSec.contains(5.0)) // 450000 / 90000
    assert(m.videoCodec.contains("hvc1"))
  }

  test("unknown-duration sentinel and sound-only movies degrade, not fail") {
    val noDur = ftyp("isom") ++
      box("moov", mvhdV0(600, 0xffffffffL), soundTrak())
    val m = VideoHeader.parse(noDur).get
    assert(m.durationSec.isEmpty, "all-ones duration is the unknown sentinel")
    assert(m.width == 0 && m.height == 0 && m.videoCodec.isEmpty)
    assert(m.nTracks == 1)
  }

  test("non-BMFF payloads refuse: text, truncated, and sibling formats") {
    assert(VideoHeader.parse("hello world, not a movie".getBytes).isEmpty)
    assert(VideoHeader.parse(Array[Byte](0, 0)).isEmpty)
    // a real WAV must not parse as video (magic dispatch stays clean)
    val wav = "RIFF".getBytes ++ u32(36).reverse ++ "WAVE".getBytes ++
      Array.fill[Byte](36)(0)
    assert(VideoHeader.parse(wav).isEmpty)
    // truncated mid-box: the ftyp survives but there is no moov
    val cut = (ftyp("isom") ++ box("moov", mvhdV0(600, 600))).take(20)
    assert(VideoHeader.parse(cut).isEmpty)
  }

  test("pipeline probe stage: mp4 payloads yield typed rows, others drop") {
    import s.implicits._
    val mp4 = ftyp("isom") ++
      box("moov", mvhdV0(1000, 2000), videoTrak(640, 480, "mp4v"))
    val media = Seq(
      MediaFile(1L, "video/mp4", mp4),
      MediaFile(2L, "text/plain", "not media".getBytes)).toDS()
    val rows = MediaPipeline.probeVideoHeaders(media).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.doc_id == 1L && r.format == "mp4" && r.major_brand == "isom")
    assert(r.width == 640 && r.height == 480)
    assert(r.duration_sec.contains(2.0) && r.video_codec.contains("mp4v"))
  }
}
