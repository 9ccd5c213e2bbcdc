package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition,
  PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Micro-batch STREAMING read for the V2 events connector — the
  * `readStream` face of the same directory the batch scan reads,
  * completing the connector triad (batch read / batch write / stream
  * read). The streaming unit is the FILE, exactly like Spark's built-in
  * FileStreamSource: each micro-batch is the set of data files that
  * appeared since the last committed offset.
  *
  * Offset model: a file is identified by (modificationTime, name); the
  * offset is the high-watermark pair of the newest file included so far.
  * `latestOffset` lists the directory and advances the watermark;
  * `planInputPartitions(start, end)` re-lists and takes exactly the
  * files in (start, end] — deterministic for a given listing because the
  * (mtime, name) order is total. Restart replays from the checkpointed
  * offset pair with no duplicate files.
  *
  * Residual (shared with every watermark-on-mtime design, documented
  * rather than hidden): a file that lands with a modification time AT OR
  * BELOW an already-committed watermark (clock skew, copied-in old
  * files) is skipped. Producers must write files with fresh mtimes — the
  * natural behavior of every writer including [[EventsV2BatchWrite]].
  * Pushed filters and column pruning apply per micro-batch exactly as in
  * the batch scan (same reader factory).
  */
class EventsV2MicroBatchStream(path: String, required: StructType,
                               pushed: Array[Filter],
                               checkpointLocation: String)
    extends MicroBatchStream {

  private def hadoopConf =
    SparkSession.active.sparkContext.hadoopConfiguration

  /** Sorted (mtime, name, fullPath) listing of current data files. */
  private def listing(): Array[(Long, String, String)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) return Array.empty
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile &&
          !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
      else Array(fs.getFileStatus(p))
    files.map(s => (s.getModificationTime, s.getPath.getName,
      s.getPath.toString)).sortBy(t => (t._1, t._2))
  }

  override def initialOffset(): Offset = EventsV2Offset(Long.MinValue, "")

  override def latestOffset(): Offset = {
    val l = listing()
    if (l.isEmpty) initialOffset()
    else EventsV2Offset(l.last._1, l.last._2)
  }

  override def deserializeOffset(json: String): Offset =
    EventsV2Offset.fromJson(json)

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EventsV2Offset]
    val e = end.asInstanceOf[EventsV2Offset]
    val ord = Ordering.Tuple2[Long, String]
    listing()
      .filter { case (mt, name, _) =>
        ord.gt((mt, name), (s.mtime, s.name)) &&
          ord.lteq((mt, name), (e.mtime, e.name))
      }
      .map(t => EventsV2Partition(t._3): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventsV2ReaderFactory(required.fieldNames, pushed,
      HadoopConfCarrier.capture(hadoopConf))

  override def commit(end: Offset): Unit = () // files are immutable; no-op

  override def stop(): Unit = ()
}

/** (mtime, name) high-watermark offset, JSON-serialized for the
  * checkpoint log. */
case class EventsV2Offset(mtime: Long, name: String) extends Offset {
  override def json(): String =
    s"""{"mtime":$mtime,"name":${graft.queue.Json.encode(name)}}"""
}

object EventsV2Offset {
  private val Re = """\{"mtime":(-?\d+),"name":"(.*)"\}""".r
  def fromJson(j: String): EventsV2Offset = j match {
    case Re(mt, n) =>
      // the name passed through Json.encode: unescape the two escapes a
      // file name can realistically carry (quotes/backslashes)
      EventsV2Offset(mt.toLong,
        n.replace("\\\"", "\"").replace("\\\\", "\\"))
    case _ => throw new IllegalArgumentException(s"bad offset json: $j")
  }
}
