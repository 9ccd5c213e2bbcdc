package graft.sources.v2

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType,
  StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the engine's JSON-lines event format (the
  * wire format of `/root/reference/main.go:267-276` payload items,
  * FIXTURES.md `events` schema) — the `org.apache.spark.sql.connector`
  * surface of the engine, complementing the text+`from_json` reader in
  * [[graft.sources.EventJsonSource]].
  *
  * What a V2 connector buys over the from_json form, and what this one
  * actually implements:
  *
  *  - **Column pruning at the SOURCE** (`SupportsPushDownRequiredColumns`):
  *    a `select(event_type)` MATERIALIZES only the `event_type` value per
  *    line — unrequested schema fields are type-VALIDATED (so a line's
  *    validity is projection-invariant: count() and collect() agree on
  *    any projection) but their values are discarded, and string payloads
  *    (the big schemaless props object) skip without materializing.
  *    Non-schema fields skip entirely. With from_json, pruning stops at
  *    the parsed struct; the full line is still tokenized into every
  *    field AND every value materializes.
  *  - **Filter pushdown** (`SupportsPushDownFilters`): comparisons on the
  *    typed event columns evaluate inside the partition reader, before
  *    any row reaches Spark. Pushed filters are fully handled (Spark's
  *    re-evaluation Filter disappears from the plan); unsupported
  *    shapes stay residual. Null semantics match SQL: a null field fails
  *    every pushed comparison except IsNull.
  *  - **File-granular partitions**: one [[InputPartition]] per data file,
  *    so a directory of N files reads with N-way parallelism — the same
  *    split discipline as the built-in file sources (at 100 TB the unit
  *    of work is the file/split, never the directory).
  *
  * Corrupt lines are SKIPPED here (count them with the quarantine view of
  * EventJsonSource.readCorrupt — permissive-mode parsing is that reader's
  * contract); this connector is the valid-path fast reader.
  *
  * Usage: `spark.read.format("graft.sources.v2.EventsV2Provider")
  * .load(dir)` — EventsV2Spec pins row-equality with EventJsonSource
  * .readValid, the pruned parse, and both pushdown plan shapes.
  */
object EventsV2 {
  /** Data schema = EventJsonSource.schema minus the quarantine column. */
  val Schema: StructType = StructType(
    graft.sources.EventJsonSource.schema.fields.filter(_.name != "_corrupt"))

  private[v2] val TsParser =
    java.time.format.DateTimeFormatter.ofPattern(
      graft.sources.EventJsonSource.TsFormat)

  /** Parse an ISO micros timestamp to Spark's internal micros-since-epoch. */
  private[v2] def tsMicros(s: String): Long = {
    val odt = java.time.OffsetDateTime.parse(s, TsParser)
    val inst = odt.toInstant
    Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L),
      inst.getNano / 1000L)
  }

  /** Filter-literal → comparable double (numeric fields) or micros (ts). */
  private[v2] def litMicros(v: Any): Long = v match {
    // floorDiv, not /: integer division truncates toward zero, which
    // shifts PRE-EPOCH literals (negative getTime) forward a second
    case t: java.sql.Timestamp => Math.addExact(
      Math.multiplyExact(Math.floorDiv(t.getTime, 1000L), 1000000L),
      t.getNanos / 1000L)
    case i: java.time.Instant =>
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        i.getNano / 1000L)
    case other => throw new IllegalArgumentException(
      s"unsupported timestamp literal: $other")
  }

  private[v2] def fieldType(name: String): Option[DataType] =
    Schema.fields.find(_.name == name).map(_.dataType)

  /** The ONE data-file listing rule, shared by the batch scan and the
    * micro-batch stream (two copies of the hidden-file filter could
    * silently diverge the two faces' views of the same directory). */
  private[v2] def listDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                                p: Path): Array[org.apache.hadoop.fs
                                  .FileStatus] = {
    if (!fs.exists(p)) return Array.empty
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
    else Array(fs.getFileStatus(p))
  }

  /** Can the reader evaluate this filter exactly? */
  private[v2] def pushable(f: Filter): Boolean = f match {
    case EqualTo(a, _) => fieldType(a).isDefined
    case GreaterThan(a, _) => comparable(a)
    case GreaterThanOrEqual(a, _) => comparable(a)
    case LessThan(a, _) => comparable(a)
    case LessThanOrEqual(a, _) => comparable(a)
    case IsNotNull(a) => fieldType(a).isDefined
    case IsNull(a) => fieldType(a).isDefined
    case _ => false
  }
  private def comparable(a: String): Boolean = fieldType(a).exists {
    case LongType | DoubleType | TimestampType | StringType => true
    case _ => false
  }

  /** SQL-semantics evaluation of one pushed filter against a parsed event
    * (null field ⇒ false for every comparison, true only for IsNull). */
  private[v2] def eval(f: Filter, row: Map[String, Any]): Boolean = f match {
    case IsNotNull(a) => row.get(a).exists(_ != null)
    case IsNull(a) => !row.get(a).exists(_ != null)
    case EqualTo(a, v) => cmp(a, row, v).contains(0)
    case GreaterThan(a, v) => cmp(a, row, v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(a, row, v).exists(_ >= 0)
    case LessThan(a, v) => cmp(a, row, v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(a, row, v).exists(_ <= 0)
    case _ => true
  }

  private def cmp(a: String, row: Map[String, Any], lit: Any): Option[Int] =
    row.get(a).filter(_ != null).flatMap { v =>
      (fieldType(a), v) match {
        // UTF8String binary order, NOT java String.compareTo: Spark
        // compares strings as UTF-8 bytes, and the two orders diverge on
        // supplementary-plane characters (surrogates sort below U+FFFF
        // in UTF-16 but above in UTF-8)
        case (Some(StringType), s: String) =>
          Some(UTF8String.fromString(s)
            .compareTo(UTF8String.fromString(String.valueOf(lit))))
        case (Some(LongType), l: Long) =>
          Some(java.lang.Long.compare(l, lit.asInstanceOf[Number].longValue))
        case (Some(DoubleType), d: Double) =>
          Some(java.lang.Double.compare(d,
            lit.asInstanceOf[Number].doubleValue))
        case (Some(TimestampType), m: Long) =>
          Some(java.lang.Long.compare(m, litMicros(lit)))
        case _ => None
      }
    }
}

/** Entry point for `spark.read.format("graft.sources.v2.EventsV2Provider")`. */
class EventsV2Provider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventsV2.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new EventsV2Table(properties.get("path"))
  // the table serves its fixed canonical schema; advertising external-
  // metadata support would let a user .schema(...) silently rebind
  // columns positionally — reject it instead
  override def supportsExternalMetadata(): Boolean = false
}

class EventsV2Table(path: String) extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null, "graft-events-v2 requires .load(path)/.save(path)")
  override def name(): String = s"graft_events_v2($path)"
  override def schema(): StructType = EventsV2.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventsV2ScanBuilder(path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new EventsV2WriteBuilder(path, info.schema())
}

class EventsV2ScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var required: StructType = EventsV2.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition(EventsV2.pushable)
    pushed = ours
    residual // only the shapes we cannot evaluate go back to Spark
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the connector's field order; Spark may request any order
    required = StructType(EventsV2.Schema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new EventsV2Scan(path, required, pushed)
}

class EventsV2Scan(path: String, required: StructType,
                   pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-events-v2 path=$path, " +
      s"ReadFields: [${required.fieldNames.mkString(", ")}], " +
      s"PushedEventFilters: [${pushed.mkString(", ")}]"
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new EventsV2MicroBatchStream(path, required, pushed, checkpointLocation)

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // one partition per file: directory-of-N reads N-wide, like the
    // built-in file sources' split planning
    EventsV2.listDataFiles(fs, p).map(_.getPath.toString).sorted
      .map(f => EventsV2Partition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventsV2ReaderFactory(required.fieldNames, pushed,
      HadoopConfCarrier.capture(
        SparkSession.active.sparkContext.hadoopConfiguration))
}

case class EventsV2Partition(file: String) extends InputPartition

/** The session's Hadoop settings, shipped executor-side as plain pairs —
  * a bare `new Configuration()` on the executor would drop every
  * credential/filesystem setting the session carries (s3a keys, hdfs
  * nameservices), leaving the connector working only on unconfigured
  * local filesystems while PLANNING (driver-side) succeeded. */
object HadoopConfCarrier {
  def capture(conf: Configuration): Array[(String, String)] = {
    val it = conf.iterator()
    val buf = ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
    buf.toArray
  }
  def restore(pairs: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    pairs.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

class EventsV2ReaderFactory(fields: Array[String], pushed: Array[Filter],
                            hadoopConf: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new EventsV2Reader(p.asInstanceOf[EventsV2Partition].file, fields,
      pushed, HadoopConfCarrier.restore(hadoopConf))
}

/** Per-file reader: Jackson streaming parse of JSON lines. Only the
  * REQUIRED fields materialize (pruned fields are token-skipped); pushed
  * filters evaluate on the parsed map before a row is emitted; malformed
  * lines are skipped (the quarantine contract lives in EventJsonSource). */
class EventsV2Reader(file: String, fields: Array[String],
                     pushed: Array[Filter], conf: Configuration)
    extends PartitionReader[InternalRow] {
  import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

  // fields the FILTERS need but the projection does not must still parse
  private val needed: Set[String] =
    fields.toSet ++ pushed.flatMap(_.references)

  private val hPath = new Path(file)
  private val in = hPath.getFileSystem(conf).open(hPath)
  private val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
  private val jf = new JsonFactory()
  private var current: InternalRow = _

  private def parseLine(line: String): Option[Map[String, Any]] = {
    if (line.trim.isEmpty) return None
    val p = jf.createParser(line)
    try {
      if (p.nextToken() != JsonToken.START_OBJECT) return None
      val out = scala.collection.mutable.HashMap.empty[String, Any]
      while (p.nextToken() == JsonToken.FIELD_NAME) {
        val name = p.currentName()
        val tok = p.nextToken()
        EventsV2.fieldType(name) match {
          // not a schema field: never part of line validity, skip freely
          case None => p.skipChildren()
          // EVERY schema field type-validates, requested or not: line
          // validity must be projection-invariant (ADVICE r11 — a float
          // token in a long column must kill the line on a pruned read
          // exactly as on a full read, or count() and collect() disagree
          // on the same directory). The value is only RETAINED when the
          // projection/filters need it; validation cost for discarded
          // fields is the already-tokenized scalar coercion (strings
          // can't fail, so their payloads still skip untouched).
          case Some(dt) =>
            val want = needed.contains(name)
            val v = parseTyped(name, dt, tok, p, line, want)
            if (want) out(name) = v
        }
      }
      Some(out.toMap)
    } catch {
      case _: Exception => None // malformed → skip (see class doc)
    } finally p.close()
  }

  /** Parse-or-validate one schema field's value. Throws on any token/type
    * mismatch the from_json reader would quarantine (the throw is the
    * validation — parseLine's catch turns it into a skipped line). When
    * `want` is false the return value is discarded by the caller; string
    * object/array payloads then skip without the substring slice. */
  private def parseTyped(name: String, dt: DataType, tok: JsonToken,
                         p: com.fasterxml.jackson.core.JsonParser,
                         line: String, want: Boolean): Any = (dt, tok) match {
    case (_, JsonToken.VALUE_NULL) => null
    // exact-integer only: Jackson's getLongValue TRUNCATES float
    // tokens, which would admit rows the from_json reader
    // quarantines — a float where a long belongs is malformed.
    // getLongValue also throws on out-of-range ints, keeping the
    // overflow edge projection-invariant too.
    case (LongType, JsonToken.VALUE_NUMBER_INT) =>
      p.getLongValue
    case (DoubleType, JsonToken.VALUE_NUMBER_INT |
                      JsonToken.VALUE_NUMBER_FLOAT) =>
      p.getDoubleValue
    // a STRING column whose JSON value is an object/array (the
    // schemaless props payload) carries the RAW JSON text — the
    // from_json reader's StringType behavior; char offsets slice
    // it out of the line without materializing the tree
    case (StringType, JsonToken.START_OBJECT |
                      JsonToken.START_ARRAY) =>
      if (want) {
        val start = p.currentTokenLocation().getCharOffset.toInt
        p.skipChildren()
        val end = p.currentLocation().getCharOffset.toInt
        line.substring(start, end)
      } else { p.skipChildren(); null }
    case (StringType, _) => p.getText
    case (TimestampType, JsonToken.VALUE_STRING) =>
      EventsV2.tsMicros(p.getText)
    case _ => throw new IllegalArgumentException(
      s"type mismatch for $name: $tok")
  }

  private def toRow(m: Map[String, Any]): InternalRow = {
    val vals = fields.map { f =>
      (EventsV2.fieldType(f), m.getOrElse(f, null)) match {
        case (_, null) => null
        case (Some(StringType), s: String) => UTF8String.fromString(s)
        case (_, other) => other
      }
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  override def next(): Boolean = {
    while (lines.hasNext) {
      parseLine(lines.next()) match {
        case Some(m) if pushed.forall(EventsV2.eval(_, m)) =>
          current = toRow(m); return true
        case _ => // filtered or malformed: keep scanning
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
