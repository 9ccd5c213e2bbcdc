package graft

import graft.multimodal.VideoHeader
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Fuzz properties for the ISO-BMFF parser (r16), same contract as
  * MediaDecodeProps: a corrupt or adversarial payload must return None
  * (or degraded-but-sane facts), NEVER throw — a parser exception at
  * 100 TB kills an executor task mid-scan. Families: pure noise, noise
  * wearing a valid ftyp, truncations and bit-flips of a valid movie,
  * and adversarial box sizes (0, 1-with-short-largesize, huge). */
object VideoHeaderProps extends Properties("VideoHeader") {

  private def u32(v: Long): Array[Byte] = Array(
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val p = payload.flatten.toArray
    u32(8L + p.length) ++ tpe.getBytes("US-ASCII") ++ p
  }

  private val validMp4: Array[Byte] =
    box("ftyp", "isom".getBytes, u32(0), "isom".getBytes) ++
      box("moov",
        box("mvhd", u32(0), u32(0), u32(0), u32(600), u32(1200),
          Array.fill[Byte](80)(0)),
        box("trak",
          box("tkhd", u32(0), u32(0), u32(0), u32(1), u32(0), u32(0),
            Array.fill[Byte](16)(0), Array.fill[Byte](36)(0),
            u32(320L << 16), u32(240L << 16)),
          box("mdia", box("minf", box("stbl",
            box("stsd", u32(0), u32(1),
              box("avc1", Array.fill[Byte](8)(0)))))))) ++
      box("mdat", Array.fill[Byte](24)(5))

  private val noise: Gen[Array[Byte]] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  property("arbitrary bytes never throw") = forAll(noise) { b =>
    VideoHeader.parse(b); true
  }

  property("a valid ftyp magic followed by noise never throws") =
    forAll(noise) { b =>
      VideoHeader.parse(box("ftyp", "isom".getBytes, u32(0)) ++ b); true
    }

  property("truncations of a valid movie never throw") =
    forAll(Gen.chooseNum(0, validMp4.length)) { n =>
      VideoHeader.parse(validMp4.take(n)); true
    }

  property("single-byte corruptions never throw; sane facts when parsed") =
    forAll(Gen.chooseNum(0, validMp4.length - 1),
           Gen.chooseNum(-128, 127).map(_.toByte)) { (i, v) =>
      val mut = validMp4.clone(); mut(i) = v
      VideoHeader.parse(mut).forall { m =>
        m.nTracks >= 0 && m.width >= 0 && m.height >= 0 &&
          m.durationSec.forall(d => !d.isNaN)
      }
    }

  property("adversarial box sizes (0 / short-largesize / huge) never throw") =
    forAll(Gen.oneOf(0L, 1L, 7L, 0x7fffffffL, 0xffffffffL), noise) {
      (sz, b) =>
        val payload = "ftyp".getBytes ++ b
        VideoHeader.parse(u32(sz) ++ payload)
        VideoHeader.parse(validMp4 ++ u32(sz) ++ "free".getBytes ++ b)
        true
    }

  // r17 (advisor item): short mvhd/tkhd boxes — including the size-8
  // empty-payload form, at EOF and mid-file — must quarantine the FIELD
  // (duration None / track skipped), never throw, and never read a
  // sibling box's bytes as duration.
  property("short mvhd/tkhd boxes quarantine the field, never throw") =
    forAll(Gen.chooseNum(0, 19), Gen.oneOf(true, false)) { (plen, atEof) =>
      val shortMvhd = box("mvhd", Array.fill[Byte](plen)(3))
      val moovKids =
        if (atEof) Array(shortMvhd)
        else Array(shortMvhd, box("free", Array.fill[Byte](32)(-1)))
      val f = box("ftyp", "isom".getBytes, u32(0)) ++
        box("moov", moovKids.toIndexedSeq: _*)
      val m = VideoHeader.parse(f)
      val shortTkhd = box("ftyp", "isom".getBytes, u32(0)) ++
        box("moov", box("trak", box("tkhd")),
          box("trak", box("tkhd", Array.fill[Byte](plen)(7))))
      val t = VideoHeader.parse(shortTkhd)
      m.forall(_.durationSec.isEmpty) &&
        t.forall(v => v.width == 0 && v.height == 0 && v.nTracks == 2)
    }

  property("a v1 mvhd shorter than 32 bytes quarantines duration") = {
    // version byte 1 but only 24 payload bytes: the u64 duration read
    // would cross into the next box without the r17 guard
    val v1short = box("mvhd", Array[Byte](1, 0, 0, 0),
      Array.fill[Byte](20)(2))
    val f = box("ftyp", "isom".getBytes, u32(0)) ++
      box("moov", v1short, box("free", Array.fill[Byte](40)(-1)))
    forAll(Gen.const(0)) { _ =>
      VideoHeader.parse(f).exists(_.durationSec.isEmpty)
    }
  }

  property("the valid movie parses to its exact facts") = {
    val m = VideoHeader.parse(validMp4).get
    forAll(Gen.const(0)) { _ =>
      m.majorBrand == "isom" && m.nTracks == 1 && m.width == 320 &&
        m.height == 240 && m.durationSec.contains(2.0) &&
        m.videoCodec.contains("avc1")
    }
  }
}
