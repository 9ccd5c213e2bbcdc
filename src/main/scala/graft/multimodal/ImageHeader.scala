package graft.multimodal

/** Parsed image-container header facts — everything a training-data lake
  * wants to know about an image WITHOUT decoding pixels (shape filters,
  * resolution buckets, corrupt-file quarantine). */
case class ImageMeta(format: String, width: Int, height: Int, bitDepth: Int,
                     nComponents: Int)

/** Pure-JVM magic-dispatch header parsing for the two dominant image
  * containers, from the public specs:
  *
  *  - PNG (W3C/ISO 15948 / RFC 2083): 8-byte signature
  *    `89 50 4E 47 0D 0A 1A 0A`, then the IHDR chunk MUST be first —
  *    width/height as big-endian u32 at offsets 16/20, bit depth at 24,
  *    color type at 25 (component count follows from color type).
  *  - JPEG (ITU T.81 / JFIF): `FF D8` SOI, then a marker stream; the
  *    frame header (SOFn, n ∈ 0-15 minus C4/C8/CC which are DHT/JPG/DAC)
  *    carries sample precision (u8), height (u16 BE), width (u16 BE),
  *    component count (u8). Markers may be preceded by fill `FF` bytes;
  *    RSTn/SOI/EOI/TEM are standalone (no length field); every other
  *    segment has a big-endian u16 length that includes the length bytes.
  *
  * Only the first ~KB of a file is needed in practice (PNG: 26 bytes;
  * JPEG: SOF usually lands within the first few hundred bytes unless huge
  * APPn/EXIF blobs precede it — callers that sliced the head simply get
  * None for those and can re-probe with a bigger slice). Anything
  * unparseable returns None — corrupt files quarantine instead of
  * crashing an executor.
  */
object ImageHeader {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u32(b: Array[Byte], i: Int): Long =
    (u16(b, i).toLong << 16) | u16(b, i + 2)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Magic-dispatch: PNG or JPEG header facts, None for anything else
    * (incl. truncated or corrupt headers). */
  def parse(bytes: Array[Byte]): Option[ImageMeta] =
    if (bytes.length >= 2 && u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8)
      parseJpeg(bytes)
    else if (bytes.length >= 8 && bytes.take(8).sameElements(PngSig))
      parsePng(bytes)
    else None

  /** PNG: signature + IHDR-first invariant (spec §5.6 "Chunk ordering"). */
  private def parsePng(b: Array[Byte]): Option[ImageMeta] = {
    // signature(8) + length(4) + "IHDR"(4) + 13-byte payload = 29 bytes
    if (b.length < 26 + 3) return None
    val ihdrLen = u32(b, 8)
    val ihdrTag = new String(b.slice(12, 16), "US-ASCII")
    if (ihdrLen != 13L || ihdrTag != "IHDR") return None
    val w = u32(b, 16)
    val h = u32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    val depth = u8(b, 24)
    val comps = u8(b, 25) match { // color type → samples per pixel
      case 0 => 1 // greyscale
      case 2 => 3 // truecolour
      case 3 => 1 // indexed (palette)
      case 4 => 2 // greyscale + alpha
      case 6 => 4 // truecolour + alpha
      case _ => return None
    }
    Some(ImageMeta("png", w.toInt, h.toInt, depth, comps))
  }

  /** JPEG: walk the marker stream to the first SOFn frame header. */
  private def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
    var i = 2 // past SOI
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xff) return None // desynced marker stream
      var j = i
      while (j < b.length && u8(b, j) == 0xff) j += 1 // skip fill bytes
      if (j >= b.length) return None
      val marker = u8(b, j)
      marker match {
        case m if (m >= 0xd0 && m <= 0xd9) || m == 0x01 =>
          i = j + 1 // standalone: RSTn / SOI / EOI / TEM — no length
        case 0xda => return None // SOS before any SOF: no frame header
        case m if (m >= 0xc0 && m <= 0xcf) &&
                  m != 0xc4 && m != 0xc8 && m != 0xcc =>
          // SOFn: len(2) precision(1) height(2) width(2) nComponents(1)
          if (j + 8 >= b.length) return None
          val depth = u8(b, j + 3)
          val h = u16(b, j + 4)
          val w = u16(b, j + 6)
          val comps = u8(b, j + 8)
          if (w == 0 || h == 0 || comps == 0) return None
          return Some(ImageMeta("jpeg", w, h, depth, comps))
        case _ =>
          if (j + 2 >= b.length) return None
          i = j + 1 + u16(b, j + 1) // length includes its own 2 bytes
      }
    }
    None
  }
}
