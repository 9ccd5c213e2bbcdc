package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Early-warning guard against driver fixture drift (the r9→r10 lesson:
  * a regenerated `events.parquet` changed its timestamp annotation and 29
  * keys failed with per-key cryptic cast errors — this spec turns the next
  * such drift into ONE failure naming the table and column).
  *
  * Assertions are deliberately tolerance-typed: exact column NAMES (a
  * rename breaks every query mentioning it), but dtype SETS where the
  * driver has legitimately varied encodings across vintages (timestamps:
  * nanos-surfaces-as-long vs micros; ints: 32 vs 64 bit).
  */
class FixtureSchemaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val integral: Set[DataType] = Set(IntegerType, LongType)
  // orders/lineitem timestamps have NO normalizing reader — a nanos
  // vintage (surfacing LongType) would break every date query, so it must
  // FAIL here; only events.ts has a reader branch that tolerates it
  private val temporal: Set[DataType] = Set(TimestampType, TimestampNTZType, DateType)
  private val temporalOrNanos: Set[DataType] = temporal + LongType

  /** table -> (column -> acceptable dtypes; empty set = any) */
  private val expected: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> integral, "r_name" -> Set(StringType)),
    "nation" -> Seq("n_nationkey" -> integral, "n_name" -> Set(StringType),
      "n_regionkey" -> integral),
    "customer" -> Seq("c_custkey" -> integral, "c_name" -> Set(StringType),
      "c_nationkey" -> integral, "c_mktsegment" -> Set(StringType)),
    "supplier" -> Seq("s_suppkey" -> integral, "s_name" -> Set(StringType),
      "s_nationkey" -> integral),
    "part" -> Seq("p_partkey" -> integral, "p_name" -> Set(StringType)),
    "orders" -> Seq("o_orderkey" -> integral, "o_custkey" -> integral,
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> temporal, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Seq("l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_linenumber" -> integral,
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> temporal),
    "events" -> Seq("event_id" -> integral, "ts" -> temporalOrNanos,
      "user_id" -> integral, "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Seq("doc_id" -> integral, "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> integral),
    "embeddings" -> Seq("vec_id" -> integral,
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false)),
      "label" -> integral),
  )

  expected.toSeq.sortBy(_._1).foreach { case (table, cols) =>
    test(s"$table fixture schema holds (names exact, dtypes in tolerated set)") {
      val schema = spark.read
        .parquet(s"${TestSpark.Sf0001}/$table.parquet").schema
      cols.foreach { case (name, accepted) =>
        assert(schema.fieldNames.contains(name),
          s"$table.$name MISSING — driver fixture drift? present: ${schema.fieldNames.mkString(", ")}")
        val dt = schema(name).dataType
        assert(accepted.isEmpty || accepted.contains(dt),
          s"$table.$name dtype drifted to $dt (tolerated: ${accepted.mkString(", ")}) — " +
          "check the reader assumptions (see Tables.events for the ts precedent)")
      }
    }
  }

  test("events.ts normalizes through Tables.events whatever the vintage") {
    assert(Tables.events(spark, TestSpark.Sf0001).schema("ts").dataType == TimestampType)
  }
}
