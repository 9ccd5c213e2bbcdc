package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media file as an opaque binary column plus typed metadata — the
  * multimodal data model: image/audio/video payloads travel through the
  * engine as `BinaryType` with their semantics in typed side columns,
  * exactly like a 100 TB training-data lake stores them (parquet binary +
  * metadata columns, decoded only at the consuming stage).
  */
case class MediaFile(doc_id: Long, media_type: String, bytes: Array[Byte])

/** One decoded "frame": fixed-shape per-frame features. */
case class DecodedFrame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
                        mean_luma: Double)

/** Per-file fixed-width feature row (the embedding-ish output a training
  * pipeline would hand to the next stage). */
case class MediaFeatures(doc_id: Long, media_type: String, n_frames: Int,
                         width: Int, height: Int, feature: Array[Float])

/** Multimodal decode/feature pipeline over opaque binary columns.
  *
  * The Spark-side plumbing is real: typed `Dataset` stages with case-class
  * encoders, `mapPartitions` for the decode stage (the Scala analog of
  * `mapInPandas` — one iterator per partition so a real codec would be
  * loaded once per task, not once per row), hash repartitioning by doc so
  * decode parallelism is independent of source file layout, and a
  * `groupByKey.mapGroups` featurize stage.
  *
  * The byte-level DECODE IS A STUB: this environment has no image/audio
  * codecs, so `decodeStub` derives deterministic fake dimensions/luma from
  * the bytes. Every value is a pure function of the payload, so the
  * pipeline is testable end-to-end; swap `decodeStub` for a real codec
  * call to productionize.
  */
object MediaPipeline {

  val FrameBytes = 64 // stub "frame" = one 64-byte stride of the payload

  /** Lift any (doc_id, text) frame into the binary media model. In
    * production this is `spark.read.format("binaryFile")` or a parquet
    * binary column; here the documents fixture stands in as media bytes.
    */
  def asMedia(docs: DataFrame): Dataset[MediaFile] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id").cast("long"),
                lit("text/plain").as("media_type"),
                col("text").cast("binary").as("bytes"))
      .as[MediaFile]
  }

  /** ==== STUB ==== deterministic fake of a codec's per-frame decode.
    * Real impl: hand `bytes` to an image/video library, emit true frames.
    * The fake derives width/height from a byte hash and mean luma from the
    * frame's actual bytes, so outputs are stable, content-dependent, and
    * assertable in tests.
    */
  private[multimodal] def decodeStub(m: MediaFile, frameIdx: Int): DecodedFrame = {
    val start = frameIdx * FrameBytes
    val frame = m.bytes.slice(start, math.min(start + FrameBytes, m.bytes.length))
    val h = java.util.Arrays.hashCode(m.bytes)
    val width = 64 + math.floorMod(h, 193)          // fake, content-derived
    val height = 64 + math.floorMod(h >> 8, 129)    // fake, content-derived
    val luma = if (frame.isEmpty) 0.0
               else frame.map(b => (b & 0xff).toDouble).sum / frame.length
    DecodedFrame(m.doc_id, frameIdx, width, height, luma)
  }

  /** Decode stage: one partition = one batch; `mapPartitions` keeps the
    * (stubbed) codec call off the per-row path, mirroring `mapInPandas`
    * batch shape. `parallelism` controls the repartition so decode scales
    * with executors, not with however few input files there were.
    */
  def decodeFrames(media: Dataset[MediaFile], parallelism: Int): Dataset[DecodedFrame] = {
    val s = media.sparkSession
    import s.implicits._
    media.repartition(parallelism, col("doc_id"))
      .mapPartitions { batch =>
        // a real codec would be initialized HERE, once per partition
        batch.flatMap { m =>
          val nFrames = math.max(m.bytes.length / FrameBytes, 1)
          (0 until nFrames).iterator.map(i => decodeStub(m, i))
        }
      }
  }

  /** Frame-sample: keep every `stride`-th frame (cheap narrow filter —
    * runs before any shuffle so dropped frames never move). */
  def sampleFrames(frames: Dataset[DecodedFrame], stride: Int): Dataset[DecodedFrame] =
    frames.filter(f => f.frame_idx % stride == 0)

  /** Featurize: fixed-width per-file vector (8 luma-histogram bins) +
    * resize target dims. One shuffle by doc_id. */
  def featurize(media: Dataset[MediaFile], frames: Dataset[DecodedFrame],
                resizeTo: Int): Dataset[MediaFeatures] = {
    val s = media.sparkSession
    import s.implicits._
    // Column select, NOT a typed .map: the lambda form would force full
    // deserialization of every row — including the payload bytes — just
    // to read two scalar fields; the select prunes `bytes` at the scan.
    val types = media.select(col("doc_id"), col("media_type"))
    frames.groupByKey(_.doc_id)
      .mapGroups { (id, it) =>
        val fs = it.toArray.sortBy(_.frame_idx)
        val bins = new Array[Float](8)
        fs.foreach(f => bins(math.min((f.mean_luma / 32).toInt, 7)) += 1f)
        val n = fs.length.max(1)
        MediaFeatures(id, "", fs.length, resizeTo, resizeTo,
                      bins.map(_ / n))
      }
      .drop("media_type")
      .join(types, "doc_id")
      .as[MediaFeatures]
  }
}
