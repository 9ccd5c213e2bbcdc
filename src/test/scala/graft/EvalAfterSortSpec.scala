package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The EvalAfterSort optimizer rule (r16): computed projections hoist
  * above a global sort — evaluated once post-exchange instead of twice
  * (range-sample pass + real pass) with the computed columns shuffled.
  * Pins: the optimized plan shape, result equality (values AND order)
  * against an un-extended session, and every refusal condition —
  * computed sort key, nondeterministic projection, width-reducing
  * non-expensive projection, attribute-only projection. */
class EvalAfterSortSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val ext: SparkSession = TestSpark.extensionsSession()

  override def afterAll(): Unit = TestSpark.restoreSharedSession()

  /** True if the OPTIMIZED plan has a computed Project ABOVE the Sort. */
  private def hoisted(df: DataFrame): Boolean = {
    val plan = df.queryExecution.optimizedPlan
    plan.collectFirst { case p @ Project(_, _: Sort) => p }.isDefined &&
      plan.collectFirst { case Sort(_, _, p: Project, _)
        if p.projectList.exists(e =>
          !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions
            .AttributeReference]) => () }.isEmpty
  }

  private def lineitem = Tables.lineitem(ext, TestSpark.Sf0001)

  test("wide math projection under orderBy hoists; results identical incl. order") {
    def shape(s: SparkSession): DataFrame =
      Tables.lineitem(s, TestSpark.Sf0001).select(
        col("l_orderkey"), col("l_linenumber"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        round(log(col("l_extendedprice")), 4).as("ln_price"),
        floor(col("l_discount") * 100).as("disc_pct"),
        ceil(col("l_tax") * 100).as("tax_pct"),
        round(sqrt(col("l_quantity")), 4).as("sqrt_qty"),
        (col("l_orderkey") % 7).as("okey_mod7"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
    val df = shape(ext)
    assert(hoisted(df), s"not hoisted:\n${df.queryExecution.optimizedPlan}")
    val got = df.collect().map(_.toSeq).toSeq
    val want = shape(TestSpark.spark).collect().map(_.toSeq).toSeq
    assert(got == want, "values or ORDER diverged from the plain session")
  }

  test("json parse hoists via the expensive whitelist despite narrower output") {
    val sch = StructType(Seq(StructField("k", StringType)))
    val df = Tables.events(ext, TestSpark.Sf0001)
      .select(col("event_id"),
        from_json(col("props"), sch).getField("k").as("k_str"))
      .orderBy(col("event_id"))
    assert(hoisted(df),
      s"JsonToStructs must hoist:\n${df.queryExecution.optimizedPlan}")
  }

  test("ordering by a COMPUTED alias refuses the hoist") {
    val df = lineitem.select(
        col("l_orderkey"),
        pow(col("l_quantity"), 2).as("qty_sq"))
      .orderBy(col("qty_sq"))
    assert(!hoisted(df),
      s"computed sort key cannot hoist:\n${df.queryExecution.optimizedPlan}")
    // and it still computes the right answer
    assert(df.limit(1).collect().nonEmpty)
  }

  test("nondeterministic projections refuse the hoist") {
    val df = lineitem.select(
        col("l_orderkey"),
        (rand(7) + col("l_quantity")).as("r"),
        pow(col("l_quantity"), 2).as("qty_sq"))
      .orderBy(col("l_orderkey"))
    assert(!hoisted(df),
      s"rand() must not move across the sort:\n${df.queryExecution.optimizedPlan}")
  }

  test("width-reducing non-expensive projection refuses (would shuffle the wide input)") {
    val df = Tables.documents(ext, TestSpark.Sf0001)
      .select(col("doc_id"), substring(col("text"), 1, 2).as("t2"))
      .orderBy(col("doc_id"))
    assert(!hoisted(df),
      s"substr(text) is cheaper to shuffle than text:\n${df.queryExecution.optimizedPlan}")
  }

  test("the engine session (no extensions) is untouched; extension via SQL works") {
    // DDL path: the rule applies to spark.sql queries on the ext session
    Tables.lineitem(ext, TestSpark.Sf0001).createOrReplaceTempView("eas_li")
    try {
      val df = ext.sql(
        """SELECT l_orderkey, l_linenumber,
                  round(ln(l_extendedprice), 4) AS ln_price,
                  power(l_quantity, 2) AS qty_sq
           FROM eas_li ORDER BY l_orderkey, l_linenumber""")
      assert(hoisted(df),
        s"SQL shape must hoist too:\n${df.queryExecution.optimizedPlan}")
    } finally ext.catalog.dropTempView("eas_li")
  }

  test("the reshaped keys' SQL twins hoist on the user path (r17, verdict item 9)") {
    // The r16 perf pass hand-carried the sort-first/project-after shape in
    // the DSL keys; this pins that a SQL user typing the PARITY TWIN of
    // each reshaped key gets the same hoisted plan through spark.sql under
    // GraftExtensions — the rule on the path users take, not only its
    // unit shapes. Values must equal the DSL key's run in the same session
    // (order included — every twin carries ORDER BY).
    Tables.lineitem(ext, TestSpark.Sf0001).createOrReplaceTempView("lineitem")
    Tables.events(ext, TestSpark.Sf0001).createOrReplaceTempView("events")
    try {
      val twins: Seq[(String, String)] = Seq(
        "q_math_funcs" -> SparkEntry.oracleSql("q_math_funcs"),
        "q_cast_types" -> SqlDialectTwins.twins("q_cast_types"),
        "q_json_funcs" -> SqlDialectTwins.twins("q_json_funcs"),
        "q_expr_go_ts" ->
          "SELECT event_id, go_ts(ts) AS go_ts FROM events ORDER BY event_id")
      twins.foreach { case (key, sql) =>
        val viaSql = ext.sql(sql)
        assert(hoisted(viaSql),
          s"$key SQL twin did not hoist:\n${viaSql.queryExecution.optimizedPlan}")
        val viaDsl = SparkEntry.queries(key)(ext, TestSpark.Sf0001)
        assert(viaSql.collect().map(_.toSeq).toSeq ==
               viaDsl.collect().map(_.toSeq).toSeq,
          s"$key SQL twin diverged from the DSL key")
      }
    } finally {
      ext.catalog.dropTempView("lineitem")
      ext.catalog.dropTempView("events")
    }
  }
}
