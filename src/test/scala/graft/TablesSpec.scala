package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the events-reader encoding normalization: the driver has shipped
  * `events.ts` as parquet TIMESTAMP(NANOS) in some fixture generations and
  * TIMESTAMP(MICROS, NTZ) in others (the r9→r10 regeneration switched,
  * silently breaking all 29 events-reading keys until Tables.events
  * branched on the surfaced type). Whatever the vintage on disk, every
  * query must see one canonical shape.
  */
class TablesSpec extends AnyFunSuite {

  test("events.ts surfaces as session-local TIMESTAMP regardless of fixture encoding") {
    val spark = TestSpark.spark
    val ev = Tables.events(spark, TestSpark.Sf0001)
    assert(ev.schema("ts").dataType == TimestampType,
      s"expected TimestampType, got ${ev.schema("ts").dataType}")
    assert(ev.filter(col("ts").isNull).count() == 0, "normalization nulled ts values")
  }

  test("normalized ts micros match the raw on-disk values") {
    val spark = TestSpark.spark
    val raw = spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
    // derive the expected micros from the raw column in its native form:
    // a Long column is nanos (divide); a timestamp flavor under the UTC
    // session converts value-identically via unix_micros after cast
    val expected = raw.schema("ts").dataType match {
      case LongType => raw.select(col("event_id"), expr("ts div 1000").as("us"))
      case _ => raw.select(col("event_id"),
        unix_micros(col("ts").cast(TimestampType)).as("us"))
    }
    val normalized = Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    assert(normalized.exceptAll(expected).isEmpty && expected.exceptAll(normalized).isEmpty,
      "normalized micros diverge from raw fixture values")
  }
}
