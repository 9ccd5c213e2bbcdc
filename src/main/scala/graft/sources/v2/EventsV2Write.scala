package graft.sources.v2

import java.io.{BufferedWriter, OutputStreamWriter}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructType, TimestampType}

/** Batch WRITE path of the V2 connector — the connector-level commit
  * protocol (the file-source twin of SnapshotLake's manifest commit):
  *
  *  - every task writes to a STAGED file under `_temp/<jobId>/`, a
  *    directory no reader lists (the [[EventsV2Scan]] planner skips
  *    `_`-prefixed entries) — a crashed or speculative task leaves only
  *    invisible garbage;
  *  - task `commit()` reports the staged path; task `abort()` deletes it;
  *  - job `commit(messages)` renames exactly the REPORTED files into the
  *    table directory (a speculative duplicate that lost the race is
  *    never in `messages`, so it never lands) and drops the staging dir;
  *  - job `abort()` removes the whole staging dir — the table is
  *    byte-identical to before the job;
  *  - `overwrite` maps to [[SupportsTruncate]]: job commit snapshots the
  *    existing data files, renames EVERY staged file in, and only then
  *    deletes the snapshot — a commit that fails mid-rename leaves the
  *    old generation fully intact (plus some UUID-named new files as
  *    collectable garbage); data loss requires the delete loop itself to
  *    fail, which starts only after all renames succeeded. (Atomic
  *    swap proper needs a manifest — that's [[graft.ops.SnapshotLake]]'s
  *    contract, not a directory listing's.)
  *
  * Rows encode with [[graft.queue.Json]] (sorted keys, Go-marshal
  * rendering — the wire format of `/root/reference/main.go:267-276`) and
  * timestamps with the reader's micros format, so write → read is
  * loss-free (EventsV2Spec pins the round trip).
  */
class EventsV2WriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new EventsV2BatchWrite(path, schema, doTruncate)
  }
}

case class StagedFile(path: String) extends WriterCommitMessage

class EventsV2BatchWrite(path: String, schema: StructType,
                         truncate: Boolean) extends BatchWrite {
  private val jobId = UUID.randomUUID().toString
  private def stagingDir = new Path(path, s"_temp/$jobId")
  private def driverConf: Configuration =
    org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new EventsV2WriterFactory(path, jobId, schema,
      HadoopConfCarrier.capture(driverConf))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(driverConf)
    // truncate order (ADVICE r11): snapshot the OLD generation first,
    // rename ALL staged files in, and only then delete the snapshot —
    // a rename failure mid-loop leaves the old data fully intact (plus
    // some UUID-named new files as collectable garbage), never a
    // half-truncated table. The snapshot is taken before any rename so
    // the delete loop can never touch a just-landed new file.
    val root = new Path(path)
    val oldGeneration: Array[Path] =
      if (truncate && fs.exists(root))
        fs.listStatus(root).collect {
          case s if s.isFile && !s.getPath.getName.startsWith("_") &&
                    !s.getPath.getName.startsWith(".") => s.getPath
        }
      else Array.empty
    messages.foreach { case StagedFile(p) =>
      val src = new Path(p)
      // staged names carry the job UUID, so a collision with an existing
      // data file is impossible across applications/retries — but the
      // rename result is still CHECKED: an unchecked false return (dest
      // exists, src vanished, FS quirk) would silently drop committed
      // rows and then delete them with the staging dir
      if (!fs.rename(src, new Path(path, src.getName)))
        throw new java.io.IOException(
          s"commit rename failed: $src -> $path/${src.getName}")
    }
    // every staged file is in place — the truncate may begin
    oldGeneration.foreach(fs.delete(_, false))
    // ONLY this job's staging dir — deleting or even inspecting the
    // shared _temp parent races a concurrent job's staging writes
    fs.delete(stagingDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(driverConf)
    fs.delete(stagingDir, true) // table untouched
  }
}

class EventsV2WriterFactory(path: String, jobId: String, schema: StructType,
                            hadoopConf: Array[(String, String)])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new EventsV2DataWriter(path, jobId, schema, partitionId, taskId,
      HadoopConfCarrier.restore(hadoopConf))
}

class EventsV2DataWriter(path: String, jobId: String, schema: StructType,
                         partitionId: Int, taskId: Long, conf: Configuration)
    extends DataWriter[InternalRow] {
  // the job UUID IS part of the landed file name: task ids restart at 0
  // in every Spark application, so `part-<pid>-<tid>` alone collides
  // across append jobs (lost or overwritten data at commit rename)
  private val staged =
    new Path(path, s"_temp/$jobId/part-$partitionId-$taskId-$jobId.json")
  private val fs = staged.getFileSystem(conf)
  private val out = new BufferedWriter(
    new OutputStreamWriter(fs.create(staged, true), "UTF-8"))

  override def write(row: InternalRow): Unit = {
    val m = schema.fields.zipWithIndex.flatMap { case (f, i) =>
      if (row.isNullAt(i)) None
      else Some(f.name -> (f.dataType match {
        case LongType => row.getLong(i)
        case DoubleType => row.getDouble(i)
        case StringType => row.getUTF8String(i).toString
        case TimestampType =>
          val micros = row.getLong(i)
          java.time.Instant
            .ofEpochSecond(Math.floorDiv(micros, 1000000L),
              Math.floorMod(micros, 1000000L) * 1000L)
            .atOffset(java.time.ZoneOffset.UTC)
            .format(EventsV2.TsParser)
        case other => throw new IllegalArgumentException(
          s"unsupported write type: $other")
      }))
    }.toMap[String, Any]
    out.write(graft.queue.Json.encode(m))
    out.newLine()
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    StagedFile(staged.toString)
  }
  override def abort(): Unit = {
    out.close()
    fs.delete(staged, false)
  }
  override def close(): Unit = ()
}
