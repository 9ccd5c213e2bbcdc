package graft

import graft.sources.EventJsonSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventJsonSourceSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("fixture events round-trip losslessly through JSON lines") {
    val dir = tmpDir("evjson")
    val events = Tables.events(s, TestSpark.Sf0001)
    EventJsonSource.write(events, dir)
    val back = EventJsonSource.readValid(s, dir)
    assert(back.count() == events.count())
    // exact per-column equality via anti-joins in both directions
    val cols = events.columns.toSeq
    assert(back.select(cols.map(col): _*)
      .exceptAll(events.select(cols.map(col): _*)).count() == 0)
    assert(events.select(cols.map(col): _*)
      .exceptAll(back.select(cols.map(col): _*)).count() == 0)
  }

  test("malformed lines quarantine without poisoning valid rows") {
    val dir = tmpDir("evjson-bad")
    val good =
      """{"event_id":1,"ts":"2024-01-01T00:00:00.000000Z","user_id":7,"event_type":"signup","value":1.5,"props":"{}"}"""
    val bad = """{"event_id": 2, "ts": NOT_JSON"""
    // empty lines and literal `null` parse to a NULL struct, not a struct
    // with _corrupt set — they must still land in quarantine
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.json"),
      java.util.Arrays.asList(good, bad, "", "null"))
    assert(EventJsonSource.readValid(s, dir).count() == 1)
    val corrupt = EventJsonSource.readCorrupt(s, dir).collect().map(_.getString(0))
    assert(corrupt.sorted.toSeq == Seq("", bad, "null").sorted)
  }

  test("the source schema is explicit - no inference scan") {
    val dir = tmpDir("evjson-schema")
    EventJsonSource.write(Tables.events(s, TestSpark.Sf0001).limit(5), dir)
    val df = EventJsonSource.read(s, dir)
    assert(df.schema == EventJsonSource.schema)
  }
}
