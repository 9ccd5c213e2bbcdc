package graft

import java.nio.file.{Files, Paths}
import java.util.Comparator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond parquet (SURVEY §2.B sources/sinks):
  * a lake user's other three interchange formats — ORC (columnar twin),
  * CSV and JSON-lines (interchange) — must round-trip the fixture schema
  * byte-for-byte and, for ORC, keep predicate pushdown working. Parquet
  * itself is exercised by Verify on every key.
  */
class FormatRoundTripSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  // Fixture dirs are tracked and removed in afterAll — Files
  // .createTempDirectory alone leaked a fixture-sized directory per test
  // per run (ADVICE r7).
  private val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[String]
  private def tmpDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toString
    tmpDirs += d
    d
  }

  override def afterAll(): Unit = {
    tmpDirs.foreach { d =>
      val p = Paths.get(d)
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => Files.deleteIfExists(f))
    }
    super.afterAll()
  }

  private def li: DataFrame =
    Tables.lineitem(spark, TestSpark.Sf0001)
      // TIMESTAMP_NTZ → TIMESTAMP (UTC session = micros identity): CSV and
      // JSON writers format NTZ without a zone and reparse it ambiguously;
      // pinning the zone makes all three formats round-trip identically.
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy(col("l_orderkey"), col("l_linenumber"),
               col("l_extendedprice"), col("l_partkey"), col("l_suppkey"))
      .collect().map(_.mkString("|")).toSeq

  test("ORC round-trips the lineitem schema and values exactly") {
    val dir = tmpDir("graft_orc")
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == li.schema, "ORC changed the schema")
    assert(canon(back) == canon(li))
  }

  test("ORC scans push filters down like parquet") {
    val dir = tmpDir("graft_orc_pd")
    li.write.mode("overwrite").orc(dir)
    val q = spark.read.orc(dir).filter(col("l_quantity") < 10.0)
      .select(col("l_orderkey"), col("l_quantity"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
           plan.contains("l_quantity"),
      s"no quantity pushdown in ORC scan:\n$plan")
  }

  test("CSV round-trips with an explicit schema (header, typed reparse)") {
    val dir = tmpDir("graft_csv")
    li.write.mode("overwrite").option("header", "true")
      // full micros so sub-second timestamps survive the text hop
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(dir)
    val back = spark.read.schema(li.schema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(dir)
    assert(canon(back) == canon(li))
  }

  test("JSON-lines round-trips with an explicit schema") {
    val dir = tmpDir("graft_json")
    li.write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(dir)
    val back = spark.read.schema(li.schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(dir)
    assert(canon(back) == canon(li))
  }
}
