package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL registration path: a session built with GraftExtensions can
  * call the custom expressions from plain SQL.
  *
  * Session juggling (clear → build with extensions → restore) lives in
  * TestSpark.extensionsSession / restoreSharedSession.
  */
class GraftExtensionsSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private lazy val spark: SparkSession = TestSpark.extensionsSession()

  override def afterAll(): Unit = {
    TestSpark.restoreSharedSession()
    super.afterAll()
  }

  test("go_ts is callable from SQL and trims like Go's .999 verb") {
    val rows = spark.sql(
      """SELECT go_ts(TIMESTAMP'2024-01-02 03:04:05.120') AS a,
               go_ts(TIMESTAMP'2024-01-02 03:04:05') AS b""").head()
    assert(rows.getString(0) == "2024-01-02T03:04:05.12Z")
    assert(rows.getString(1) == "2024-01-02T03:04:05Z")
  }

  test("md5_prefix60 is callable from SQL and matches the portable form") {
    val row = spark.sql(
      """SELECT md5_prefix60('hello') AS fast,
               CAST(conv(substr(md5('hello'), 1, 15), 16, 10) AS BIGINT)
                 AS portable""").head()
    assert(row.getLong(0) == row.getLong(1))
  }

  test("dot_f32 and word_shingles are callable from SQL") {
    val r = spark.sql(
      """SELECT dot_f32(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
                        array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d,
                word_shingles('a b c', 2) AS g""").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getSeq[String](1) == Seq("a b", "b c"))
  }

  test("nfc_normalize is callable from SQL and composes combining marks") {
    // 'e' + U+0301 composes to U+00E9; already-NFC input passes through
    val r = spark.sql(
      """SELECT nfc_normalize('café') AS composed,
               length(nfc_normalize('café')) AS n_composed,
               length('café') AS n_raw,
               nfc_normalize('plain ascii') AS untouched""").head()
    assert(r.getString(0) == "café")
    assert(r.getInt(1) == 4 && r.getInt(2) == 5)
    assert(r.getString(3) == "plain ascii")
  }

  test("registered functions carry usage docs") {
    val desc = spark.sql("DESCRIBE FUNCTION go_ts").collect()
      .map(_.getString(0)).mkString("\n")
    assert(desc.contains("go_ts"))
  }
}
