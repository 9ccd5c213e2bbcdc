package graft

import graft.multimodal._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing is real even though the codec is stubbed:
  * these tests pin the schema, the batch shape, the partitioning, and the
  * determinism of the decode → sample → featurize pipeline.
  */
class MediaPipelineSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private def media = MediaPipeline.asMedia(
    Tables.documents(s, TestSpark.Sf0001).limit(50))

  test("asMedia carries payloads losslessly into the binary model") {
    val m = media.collect()
    assert(m.length == 50)
    assert(m.forall(_.media_type == "text/plain"))
    val docs = Tables.documents(s, TestSpark.Sf0001).limit(50)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(m.forall(f => new String(f.bytes, "UTF-8") == docs(f.doc_id)))
  }

  test("decodeFrames emits one frame per 64-byte stride, min one") {
    val frames = MediaPipeline.decodeFrames(media, parallelism = 8)
    val perDoc = frames.groupByKey(_.doc_id).count().collect().toMap
    val expect = media.collect()
      .map(m => m.doc_id -> math.max(m.bytes.length / MediaPipeline.FrameBytes, 1))
      .toMap
    assert(perDoc.view.mapValues(_.toInt).toMap == expect)
  }

  test("decode runs at the requested parallelism, not the input layout") {
    val frames = MediaPipeline.decodeFrames(media.coalesce(1), parallelism = 8)
    assert(frames.rdd.getNumPartitions == 8)
  }

  test("decode is deterministic: same bytes, same frames") {
    val a = MediaPipeline.decodeFrames(media, 4).collect()
      .sortBy(f => (f.doc_id, f.frame_idx))
    val b = MediaPipeline.decodeFrames(media, 7).collect()
      .sortBy(f => (f.doc_id, f.frame_idx))
    assert(a.toSeq == b.toSeq)
  }

  test("frame sampling keeps every 4th frame") {
    val frames = MediaPipeline.decodeFrames(media, 4)
    val kept = MediaPipeline.sampleFrames(frames, 4).collect()
    assert(kept.nonEmpty && kept.forall(_.frame_idx % 4 == 0))
  }

  // ---- real header decode (r10 verdict item 2) -----------------------

  /** Minimal spec-correct PNG: signature + IHDR(w, h, depth, colorType). */
  private def pngBytes(w: Int, h: Int, depth: Int, colorType: Int): Array[Byte] = {
    val out = collection.mutable.ArrayBuffer[Byte]()
    out ++= Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def u32(v: Long): Unit = (3 to 0 by -1).foreach(s => out += ((v >> (8 * s)) & 0xff).toByte)
    u32(13L)                       // IHDR length
    out ++= "IHDR".getBytes("US-ASCII")
    u32(w.toLong); u32(h.toLong)
    out += depth.toByte; out += colorType.toByte
    out ++= Array[Byte](0, 0, 0)   // compression, filter, interlace
    u32(0L)                        // (wrong) CRC — header parse ignores it
    out.toArray
  }

  /** Minimal spec-correct JPEG: SOI, APP0 (JFIF), a fill byte, DQT stub,
    * a standalone TEM marker, then SOFn with the real dimensions. */
  private def jpegBytes(w: Int, h: Int, sof: Int, comps: Int): Array[Byte] = {
    val out = collection.mutable.ArrayBuffer[Byte]()
    def m(b: Int): Unit = { out += 0xff.toByte; out += b.toByte }
    def u16(v: Int): Unit = { out += ((v >> 8) & 0xff).toByte; out += (v & 0xff).toByte }
    m(0xd8)                        // SOI
    m(0xe0); u16(16); out ++= "JFIF".getBytes("US-ASCII"); out += 0
    out ++= Array[Byte](1, 1, 0); u16(72); u16(72); out += 0; out += 0
    out += 0xff.toByte             // fill byte before next marker
    m(0xdb); u16(4); out ++= Array[Byte](0, 42) // DQT stub segment
    m(0x01)                        // TEM: standalone, no length
    m(sof); u16(8 + 3 * comps); out += 8.toByte; u16(h); u16(w); out += comps.toByte
    (0 until comps).foreach(c => out ++= Array[Byte](c.toByte, 0x11, 0))
    out.toArray
  }

  test("ImageHeader parses PNG IHDR: dimensions, bit depth, components by color type") {
    assert(ImageHeader.parse(pngBytes(640, 480, 8, 6))
      .contains(ImageMeta("png", 640, 480, 8, 4)))
    assert(ImageHeader.parse(pngBytes(1, 99999, 16, 0))
      .contains(ImageMeta("png", 1, 99999, 16, 1)))
    assert(ImageHeader.parse(pngBytes(32, 32, 8, 3))
      .contains(ImageMeta("png", 32, 32, 8, 1)))
    // truncated signature / corrupt color type → quarantine, not crash
    assert(ImageHeader.parse(pngBytes(640, 480, 8, 6).take(12)).isEmpty)
    assert(ImageHeader.parse(pngBytes(640, 480, 8, 9)).isEmpty)
  }

  test("ImageHeader walks the JPEG marker stream to SOFn past fills and standalones") {
    assert(ImageHeader.parse(jpegBytes(222, 333, 0xc0, 3))
      .contains(ImageMeta("jpeg", 222, 333, 8, 3)))
    // progressive (SOF2), greyscale single component
    assert(ImageHeader.parse(jpegBytes(4096, 1, 0xc2, 1))
      .contains(ImageMeta("jpeg", 4096, 1, 8, 1)))
    // DHT (C4) must NOT be taken for a frame header: a stream that ends
    // after DHT has no SOF
    val noSof = jpegBytes(9, 9, 0xc4, 1)
    assert(ImageHeader.parse(noSof).isEmpty)
    // text payloads are not JPEGs
    assert(ImageHeader.parse("plain text bytes".getBytes("UTF-8")).isEmpty)
  }

  test("decodeFrames uses true header dimensions for image payloads, stub for the rest") {
    val mixed = Seq(
      MediaFile(1, "image/png", pngBytes(640, 480, 8, 2)),
      MediaFile(2, "image/jpeg", jpegBytes(222, 333, 0xc0, 3)),
      MediaFile(3, "text/plain", ("word " * 40).getBytes("UTF-8"))).toDS()
    val frames = MediaPipeline.decodeFrames(mixed, parallelism = 2)
      .collect().groupBy(_.doc_id)
    assert(frames(1).toSeq == Seq(DecodedFrame(1, 0, 640, 480, frames(1)(0).mean_luma)))
    assert(frames(2).map(f => (f.width, f.height)).toSeq == Seq((222, 333)))
    assert(frames(3).length == (("word " * 40).length / MediaPipeline.FrameBytes))
    assert(frames(3).forall(f => f.width != 640 && f.width >= 64)) // stub dims
  }

  test("probeHeaders yields typed metadata rows for parseable payloads only") {
    val mixed = Seq(
      MediaFile(1, "image/png", pngBytes(800, 600, 16, 4)),
      MediaFile(2, "image/jpeg", jpegBytes(1024, 768, 0xc1, 3)),
      MediaFile(3, "text/plain", "not an image at all".getBytes("UTF-8"))).toDS()
    val got = MediaPipeline.probeHeaders(mixed).collect().sortBy(_.doc_id).toSeq
    assert(got == Seq(
      ImageMetaRow(1, "png", 800, 600, 16, 2),
      ImageMetaRow(2, "jpeg", 1024, 768, 8, 3)))
  }

  test("featurize yields a fixed-width unit-mass histogram per file") {
    val frames = MediaPipeline.decodeFrames(media, 4)
    val feats = MediaPipeline.featurize(media, frames, resizeTo = 224).collect()
    assert(feats.length == 50)
    assert(feats.forall(_.feature.length == 8))
    assert(feats.forall(f => math.abs(f.feature.sum - 1f) < 1e-5))
    assert(feats.forall(f => f.width == 224 && f.height == 224))
    assert(feats.forall(_.media_type == "text/plain"))
  }
}
