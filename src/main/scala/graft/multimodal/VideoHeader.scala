package graft.multimodal

/** Parsed video-container facts — what a training-data lake wants to know
  * about a video payload WITHOUT decoding frames (resolution/duration
  * filters, codec routing, corrupt-file quarantine). `durationSec` is the
  * movie-header duration over its timescale (None when the timescale is
  * 0 or the duration is the "unknown" all-ones sentinel); `width`/`height`
  * are the first video track's presentation size (0 when no track
  * declares one); `videoCodec` is the first video sample-description
  * fourcc (e.g. `avc1`, `hvc1`, `mp4v`), None when no stsd is found. */
case class VideoMeta(format: String, majorBrand: String, nTracks: Int,
                     width: Int, height: Int, durationSec: Option[Double],
                     videoCodec: Option[String])

/** Pure-JVM ISO base-media (MP4/MOV, ISO/IEC 14496-12) box parsing — the
  * video sibling of [[ImageHeader]]/[[AudioHeader]], from the public spec
  * only. A file is a sequence of boxes: u32be size + 4-char type; size 1
  * means a u64be largesize follows, size 0 means "to end of file";
  * container boxes (`moov`, `trak`, `mdia`, `minf`, `stbl`) nest boxes
  * directly. Facts read:
  *  - `ftyp`: major brand (isom/mp42/qt  ...) — the container dialect;
  *  - `moov/mvhd`: timescale + duration (version 0 = u32 fields at
  *    offsets 12/16 past the box header's version/flags; version 1 = u64
  *    duration at 20 after two u64 times) → duration in seconds;
  *  - `moov/trak/tkhd`: track count; width/height as 16.16 fixed point
  *    at the END of the box (after the 36-byte matrix) — nonzero marks
  *    the video track;
  *  - `moov/trak/mdia/minf/stbl/stsd`: the first sample-description
  *    fourcc of the track that declared dimensions = the codec id.
  * Contract identical to the siblings: pure function of the payload,
  * None for anything that does not parse as ISO-BMFF, never throws. */
object VideoHeader {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16be(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u32be(b: Array[Byte], i: Int): Long =
    (u16be(b, i).toLong << 16) | u16be(b, i + 2)
  private def u64be(b: Array[Byte], i: Int): Long =
    (u32be(b, i) << 32) | u32be(b, i + 4)
  private def tag(b: Array[Byte], i: Int): String =
    if (i + 4 <= b.length) new String(b, i, 4, "US-ASCII") else ""

  /** One box: (type, payloadStart, payloadEnd). */
  private case class Box(tpe: String, start: Int, end: Int)

  /** Walk the boxes in b[from, until): never reads past `until`, stops on
    * a malformed size (0 means to-end-of-range per spec). */
  private def boxes(b: Array[Byte], from: Int, until: Int): List[Box] = {
    var i = from
    val out = scala.collection.mutable.ListBuffer.empty[Box]
    while (i + 8 <= until) {
      val sz32 = u32be(b, i)
      val tpe = tag(b, i + 4)
      val (payload, end) =
        if (sz32 == 1L) {
          if (i + 16 > until) return out.toList
          val sz = u64be(b, i + 8)
          if (sz < 16 || sz > (until - i).toLong) return out.toList
          (i + 16, i + sz.toInt)
        } else if (sz32 == 0L) (i + 8, until)
        else {
          if (sz32 < 8 || sz32 > (until - i).toLong) return out.toList
          (i + 8, i + sz32.toInt)
        }
      out += Box(tpe, payload, end)
      i = end
    }
    out.toList
  }

  private def find(bs: List[Box], tpe: String): Option[Box] =
    bs.find(_.tpe == tpe)

  /** MP4/MOV facts, None for anything that is not ISO-BMFF. */
  def parse(bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes.length < 12) return None
    val top = boxes(bytes, 0, bytes.length)
    val ftyp = find(top, "ftyp").getOrElse(return None)
    val brand = tag(bytes, ftyp.start)
    if (!brand.forall(c => c >= ' ' && c < 127)) return None
    val moov = find(top, "moov").getOrElse(return None)
    val inMoov = boxes(bytes, moov.start, moov.end)

    val duration = find(inMoov, "mvhd").flatMap { m =>
      // A truncated/short mvhd (e.g. an 8-byte empty box) must quarantine,
      // not read sibling bytes as duration: bound every fixed-offset read
      // by the box's own payload. v1 needs 32 bytes (ver/flags + two u64
      // times + u32 timescale + u64 duration), v0 needs 20.
      if (m.end - m.start < 1) None
      else {
        val v = u8(bytes, m.start)
        val need = if (v == 1) 32 else 20
        if (m.end - m.start < need) None
        else {
          val (ts, dur) =
            if (v == 1) (u32be(bytes, m.start + 20), u64be(bytes, m.start + 24))
            else (u32be(bytes, m.start + 12), u32be(bytes, m.start + 16))
          // all-ones duration is the spec's "unknown" sentinel
          val unknown = if (v == 1) -1L else 0xffffffffL
          if (ts > 0 && dur != unknown) Some(dur.toDouble / ts.toDouble)
          else None
        }
      }
    }

    val traks = inMoov.filter(_.tpe == "trak")
    // first track with nonzero tkhd presentation size = the video track
    val video = traks.flatMap { t =>
      val inTrak = boxes(bytes, t.start, t.end)
      find(inTrak, "tkhd").flatMap { h =>
        // empty tkhd payload: skip this track rather than read a sibling's
        // bytes as the version
        if (h.end - h.start < 1) None
        else {
        val v = u8(bytes, h.start)
        // v0: ver/flags(4) c(4) m(4) id(4) res(4) dur(4) res(8) layer(2)
        //     alt(2) vol(2) res(2) matrix(36) w(4) h(4)  -> w at +76
        // v1: the three u32 times/duration become u64    -> w at +88
        val wOff = h.start + (if (v == 1) 88 else 76)
        if (wOff + 8 > h.end) None
        else {
          val w = (u32be(bytes, wOff) >> 16).toInt    // 16.16 fixed point
          val hh = (u32be(bytes, wOff + 4) >> 16).toInt
          if (w > 0 && hh > 0) Some((w, hh, inTrak)) else None
        }
        }
      }
    }.headOption

    val codec = video.flatMap { case (_, _, inTrak) =>
      for {
        mdia <- find(inTrak, "mdia")
        minf <- find(boxes(bytes, mdia.start, mdia.end), "minf")
        stbl <- find(boxes(bytes, minf.start, minf.end), "stbl")
        stsd <- find(boxes(bytes, stbl.start, stbl.end), "stsd")
        // stsd: ver/flags(4) entry_count(4), then the first entry is an
        // ordinary box whose TYPE is the codec fourcc
        entry <- boxes(bytes, stsd.start + 8, stsd.end).headOption
      } yield entry.tpe
    }

    Some(VideoMeta("mp4", brand, traks.size,
      video.map(_._1).getOrElse(0), video.map(_._2).getOrElse(0),
      duration, codec))
  }
}
