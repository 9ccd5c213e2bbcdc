package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines source for the canonical event stream — the ingestion format
  * a streamsurfer producer actually emits (schemaless JSON maps,
  * `/root/reference/README.md:42-45`), read Spark-first: an EXPLICIT schema
  * (never runtime inference — at 100 TB an inference pass is a full extra
  * scan of the input) plus a PERMISSIVE corrupt-record channel so one bad
  * line quarantines instead of failing the job.
  *
  * The same schema works for `spark.readStream` (Structured Streaming file
  * source) unchanged — explicit schemas are mandatory there anyway.
  */
object EventJsonSource {

  /** Canonical event schema (FIXTURES.md `events`, minus the fixture's
    * nanosecond quirk: JSON carries ISO-8601 micros). `props` stays a raw
    * JSON string — the open-ended payload is parsed lazily by consumers
    * (`get_json_object` / `from_json`), not eagerly at the source. */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("_corrupt", StringType)))

  val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Read JSON-lines events. Malformed lines surface as rows whose
    * `_corrupt` column holds the raw line and all data columns are null.
    *
    * Implementation is text-source + `from_json` rather than
    * `spark.read.json`: Spark forbids queries that prune a raw JSON scan
    * down to only the corrupt-record column (the quarantine view does
    * exactly that), while the parsed form has no such restriction — and
    * the text source keeps the one-pass, no-inference property. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val parsed = spark.read.text(path)
      .select(col("value"), from_json(col("value"), schema, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt",
        "timestampFormat" -> TsFormat)).as("r"))
    // from_json returns a NULL STRUCT (not a struct with _corrupt set) for
    // empty lines and the literal `null` — those must quarantine too, not
    // slip through readValid as all-null events.
    val dataCols = schema.fieldNames.filter(_ != "_corrupt")
      .map(f => col(s"r.$f").as(f))
    parsed.select(scala.collection.immutable.ArraySeq.unsafeWrapArray(dataCols :+
      when(col("r").isNull, col("value")).otherwise(col("r._corrupt"))
        .as("_corrupt")): _*)
  }

  /** The valid-row view (corrupt channel dropped). */
  def readValid(spark: SparkSession, path: String): DataFrame =
    read(spark, path).filter(col("_corrupt").isNull).drop("_corrupt")

  /** The quarantine view: raw text of every rejected line. */
  def readCorrupt(spark: SparkSession, path: String): DataFrame =
    read(spark, path).filter(col("_corrupt").isNotNull).select(col("_corrupt"))

  /** Write an event frame as JSON lines in the same format `read` expects
    * (round-trip helper; also how a Spark job would hand events back to a
    * JSON-speaking consumer). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", TsFormat)
      .json(path)
}
