package graft

import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions (GoTimestampFormat, Md5Prefix60, DotProduct,
  * WordShingles, NfcNormalize) claim codegen'd hot paths — this suite proves the
  * generated Java actually compiles and runs by disabling Spark's silent
  * interpreted fallback for every key that uses them. A doGenCode bug
  * would otherwise demote the expression to interpreted eval without
  * failing anything (only slowly).
  */
class CodegenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val keys = Seq("q_expr_go_ts", "q_doc_fingerprint",
    "q_dedup_simhash", "q_dedup_ngram", "q_dedup_minhash", "q_dedup_embed",
    "q_ann_ivf", "q_similarity_topk", "q_split_sample", "q_text_normalize")

  test("custom-expression keys run under CODEGEN_ONLY with fallback off") {
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      keys.foreach { k =>
        SparkEntry.queries(k)(spark, TestSpark.Sf0001)
          .write.format("noop").mode("overwrite").save()
      }
    } finally {
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }
}
