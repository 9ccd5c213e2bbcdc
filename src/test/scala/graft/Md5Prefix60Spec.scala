package graft

import graft.expr.Md5Prefix60
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom digest must stay bit-identical to the portable SQL form it
  * replaces — that equivalence is what keeps every round-3 key
  * DuckDB-oracle-able. Exercised over real fixture text (interpreted +
  * codegen paths both run under a full query).
  */
class Md5Prefix60Spec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("digest equals conv(substr(md5,1,15),16,10) on fixture words") {
    val words = Tables.documents(s, TestSpark.Sf0001)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
    val mismatches = words.select(
        Md5Prefix60.h60(col("w")).as("fast"),
        conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("portable"))
      .filter(col("fast") =!= col("portable"))
      .count()
    assert(mismatches == 0)
  }

  test("digest is non-negative (60 bits in a signed long) and spread") {
    val d = Tables.documents(s, TestSpark.Sf0001)
      .select(Md5Prefix60.h60(col("text")).as("h"))
    assert(d.filter(col("h") < 0).count() == 0)
    // 500 distinct texts should hash to 500 distinct 60-bit values
    assert(d.distinct().count() == d.count())
  }

  test("interpreted eval agrees with the static helper") {
    import org.apache.spark.unsafe.types.UTF8String
    val v = graft.expr.Md5P60.digest60(UTF8String.fromString("hello"))
    // md5("hello") = 5d41402abc4b2a76...; first 15 hex chars as a long
    assert(v == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
  }
}
