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

  /** A small VALID JPEG (8×8 grey gradient) written by the JDK's own
    * encoder — the mutation target for the r15 decodeJpeg path. */
  private val validJpeg: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = (x * 16 + y * 16) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }
  private val JpegSig = Array(0xff, 0xd8).map(_.toByte)

  property("decodeJpeg never throws on noise / magic-prefixed noise") =
    forAll(noise) { b =>
      PixelDecode.decodeJpeg(b).forall(_.width >= 0)
      PixelDecode.decodeJpeg(JpegSig ++ b).forall(_.width >= 0)
      true
    }

  property("decodeJpeg survives truncation at every length") = {
    // the JDK reader must be contained: any prefix quarantines or decodes
    // to a sane shape — never escapes IIOException/IndexOutOfBounds
    PixelDecode.decodeJpeg(validJpeg)
      .exists(p => p.width == 8 && p.height == 8) &&
      (0 until validJpeg.length).forall { n =>
        PixelDecode.decodeJpeg(validJpeg.take(n))
          .forall(p => p.width > 0 && p.height > 0)
      }
  }

  property("decodeJpeg never throws on single-byte corruption") =
    validJpeg.indices.forall { i =>
      val m = validJpeg.clone()
      m(i) = (m(i) ^ 0x55).toByte
      PixelDecode.decodeJpeg(m).forall(p => p.width > 0 && p.height > 0)
    }

  /** A small VALID FLAC (mono, one CONSTANT-subframe frame) — layout
    * mirrors FlacDecodeSpec's encoder; the mutation target for the r16
    * decodeFlac path. */
  private val validFlac: Array[Byte] = {
    val out = collection.mutable.ArrayBuffer[Byte]()
    out ++= "fLaC".getBytes("US-ASCII")
    out ++= Array[Byte](0x80.toByte, 0x00, 0x00, 34)
    out ++= Array[Byte](0x10, 0x00, 0x10, 0x00)
    out ++= Array.fill[Byte](6)(0)
    val rate = 16000
    out += ((rate >> 12) & 0xff).toByte
    out += ((rate >> 4) & 0xff).toByte
    out += (((rate & 0xf) << 4) | (0 << 1) | 0).toByte // mono, bits 16
    out += (((16 - 1) & 0xf) << 4).toByte
    out ++= Array[Byte](0, 0, 0, 64) // 64 total samples
    out ++= Array.fill[Byte](16)(0)
    // frame: sync(14) res(1) strat(1) | bs=6 sr=0 | ch=0 ss=0 res |
    // frameNo 0 | bs-1=63 | crc8 0 | subframe CONSTANT header
    // (pad 0, type 000000, wasted 0 → 0x00) | 16-bit value 1000 |
    // already byte-aligned | crc16 0
    out ++= Array(0xff, 0xf8, 0x60, 0x00, 0x00, 0x3f, 0x00).map(_.toByte)
    out += 0x00.toByte
    out += ((1000 >> 8) & 0xff).toByte
    out += (1000 & 0xff).toByte
    out ++= Array[Byte](0, 0) // crc16
    out.toArray
  }

  private val FlacSig = "fLaC".getBytes("US-ASCII")

  property("decodeFlac never throws on noise / magic-prefixed noise") =
    forAll(noise) { b =>
      graft.multimodal.FlacDecode.decodeFlac(b).forall(_.channels >= 0)
      graft.multimodal.FlacDecode.decodeFlac(FlacSig ++ b)
        .forall(_.channels >= 0)
      true
    }

  property("decodeFlac survives truncation at every length") = {
    graft.multimodal.FlacDecode.decodeFlac(validFlac)
      .exists(f => f.channels == 1 && f.framesPerChan == 64) &&
      (0 until validFlac.length).forall { n =>
        graft.multimodal.FlacDecode.decodeFlac(validFlac.take(n))
          .forall(f => f.channels >= 1)
      }
  }

  property("decodeFlac never throws on single-byte corruption") =
    validFlac.indices.forall { i =>
      val m = validFlac.clone()
      m(i) = (m(i) ^ 0x55).toByte
      graft.multimodal.FlacDecode.decodeFlac(m).forall(_.channels >= 1)
    }
}
