package graft.ops

import graft.Tables
import graft.expr.GoTimestampFormat
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** SURVEY.md §2.B "UDF / UDAF / custom expression surface".
  *
  * This pack deliberately demonstrates the extension ladder (task spec:
  * native Expression > UDF > anything else):
  *  - q_expr_go_ts: custom Catalyst `UnaryExpression` WITH codegen — stays
  *    inside whole-stage codegen, the preferred extension point.
  *  - q_udaf_geomean: typed `Aggregator` registered via `udaf` — partial
  *    aggregation (map-side combine) still applies, so it scales like any
  *    built-in agg.
  *  - q_udf_scalar: a black-box Scala UDF — correct but codegen-opaque;
  *    kept ONLY because the contract demands the surface. The same logic
  *    exists as built-in expressions in Ingestion.q_event_size; at 100 TB
  *    you use that form.
  */
object UdfOps extends QueryPack {

  /** Geometric mean as a typed Aggregator: sum-of-logs + count buffer.
    * Partial-aggregable: reduce/merge are associative-commutative. */
  private class GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1L)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0L) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Registered scalar UDF: UTF-8 byte size of (event_type, props) —
    // the q_event_size logic as a black-box function.
    "q_udf_scalar" -> { (s, d) =>
      val evSize = udf { (et: String, props: String) =>
        def len(x: String) = if (x == null) 0L else x.getBytes("UTF-8").length.toLong
        len(et) + len(props)
      }
      Tables.events(s, d)
        .select(col("event_id"), evSize(col("event_type"), col("props")).as("sz"))
        .orderBy(col("event_id"))
    },

    // Typed custom aggregate: geometric mean of extendedprice per flag.
    "q_udaf_geomean" -> { (s, d) =>
      val geomean = udaf(new GeoMean)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(geomean(col("l_extendedprice")), 4).as("geo_price"),
             count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // Custom Catalyst expression (codegen): Go `.999` timestamp format.
    // Sorted on the raw (event_id, ts) BEFORE formatting (the
    // q_math_funcs discipline, r16): formatting under the Sort runs the
    // expression in the range-sample pass too and shuffles strings.
    "q_expr_go_ts" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("ts"))
        .orderBy(col("event_id"))
        .select(col("event_id"),
                GraftShim.column(
                  GoTimestampFormat(GraftShim.expression(col("ts"))))
                  .as("go_ts"))
    }
  )

  def oracles: Map[String, String] = Map(
    "q_udf_scalar" -> """
      SELECT event_id, strlen(event_type) + strlen(props) AS sz
      FROM events ORDER BY event_id""",

    // exp(avg(ln(x))) — associative float reorder stays within 1e-11
    // relative, far inside the round-4 window.
    "q_udaf_geomean" -> """
      SELECT l_returnflag, round(exp(avg(ln(l_extendedprice))), 4) AS geo_price,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // Go .999 trimming: drop trailing zeros of the millis field, and the
    // dot itself when millis == 000.
    "q_expr_go_ts" -> """
      SELECT event_id,
        strftime(ts, '%Y-%m-%dT%H:%M:%S') ||
        CASE WHEN strftime(ts, '%g') = '000' THEN ''
             ELSE '.' || rtrim(strftime(ts, '%g'), '0') END || 'Z' AS go_ts
      FROM events ORDER BY event_id"""
  )
}
