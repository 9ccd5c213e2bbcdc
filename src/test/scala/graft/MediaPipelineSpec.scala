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
