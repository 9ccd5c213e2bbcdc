package graft

import graft.multimodal.PixelDecode
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Fuzz properties for the REAL payload decoders (r14): a corrupt or
  * adversarial payload must QUARANTINE (return None), never throw — a
  * decoder exception at 100 TB kills an executor task mid-scan, so
  * total-function behavior over arbitrary bytes is a correctness
  * property, not a nicety. Three input families: pure noise, noise
  * wearing a valid magic header, and truncations/bit-flips of a valid
  * container.
  */
object MediaDecodeProps extends Properties("MediaDecode") {

  private val noise: Gen[Array[Byte]] =
    Gen.chooseNum(0, 512).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
        .map(_.toArray))

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private val RiffSig =
    "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 0, 0) ++
      "WAVE".getBytes("US-ASCII")

  /** A small VALID png (2×2 grey, filter 0) built inline — the mutation
    * target. zlib via Deflater, real chunk CRCs. */
  private val validPng: Array[Byte] = {
    val raw = Array[Byte](0, 10, 20, 0, 30, 40) // 2 rows: filter + 2 px
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
    defl.end()
    def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
      val out = collection.mutable.ArrayBuffer[Byte]()
      (3 to 0 by -1).foreach(s =>
        out += ((payload.length >> (8 * s)) & 0xff).toByte)
      val body = tag.getBytes("US-ASCII") ++ payload
      out ++= body
      val crc = new java.util.zip.CRC32(); crc.update(body)
      (3 to 0 by -1).foreach(s =>
        out += ((crc.getValue >> (8 * s)) & 0xff).toByte)
      out.toArray
    }
    val ihdr = Array[Byte](0, 0, 0, 2, 0, 0, 0, 2, 8, 0, 0, 0, 0)
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", bos.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  property("decodePng never throws on noise") = forAll(noise) { b =>
    PixelDecode.decodePng(b).forall(_.width >= 0); true
  }

  property("decodePng never throws on magic-prefixed noise") =
    forAll(noise) { b =>
      PixelDecode.decodePng(PngSig ++ b).forall(_.width >= 0); true
    }

  property("decodePng survives truncation at every length") = {
    // any prefix either quarantines or (once the full IDAT is present —
    // IEND carries no pixel data) decodes to EXACTLY the full result;
    // nothing may throw
    val full = PixelDecode.decodePng(validPng)
    full.exists(p => p.width == 2 && p.height == 2 && p.meanLuma == 25.0) &&
      (0 until validPng.length).forall { n =>
        val got = PixelDecode.decodePng(validPng.take(n))
        got.isEmpty || got == full
      }
  }

  property("decodePng never throws on single-byte corruption") = {
    // flip each byte of the valid container in turn: decode must return
    // (Some with a sane shape, or None) — never escape an exception.
    // The IHDR flips are the regression pin for the Int-overflow buffer
    // sizing bug this suite originally caught.
    validPng.indices.forall { i =>
      val m = validPng.clone()
      m(i) = (m(i) ^ 0x55).toByte
      PixelDecode.decodePng(m).forall(p => p.width > 0 && p.height > 0)
    }
  }

  property("decodeWavPcm never throws on noise / magic-prefixed noise") =
    forAll(noise) { b =>
      PixelDecode.decodeWavPcm(b).forall(_.channels >= 0)
      PixelDecode.decodeWavPcm(RiffSig ++ b).forall(_.channels >= 0)
      true
    }
}
