package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType, StructField, StructType}

/** SURVEY.md §2.B "Scalar function families": string / date / math / json /
  * array / map families + the generator (explode) path. All built-in
  * codegen'd expressions — every column here stays inside whole-stage
  * codegen (no UDFs), so the families cost one fused projection pass over
  * the scan at any scale.
  *
  * Determinism: transcendental outputs (ln/log10) are rounded to 4 decimals;
  * every other function is exact bit-for-bit across Spark and DuckDB.
  * Integer-typed outputs are cast explicitly on the oracle side (DuckDB
  * defaults year()/len()/floor() to BIGINT/DOUBLE where Spark has INT/LONG).
  */
object ScalarFuncs extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_funcs" -> { (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_up"),
          lower(col("c_name")).as("name_lo"),
          substring(col("c_name"), 10, 9).as("digits"),
          ltrim(substring(col("c_name"), 10, 9), "0").as("digits_trim"),
          concat(col("c_mktsegment"), lit(":"), col("c_name")).as("tagged"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("key_pad"),
          replace(col("c_name"), lit("Customer#"), lit("C-")).as("name_repl"),
          regexp_extract(col("c_name"), "([0-9]+)$", 1).as("name_num"),
          col("c_name").like("%42%").as("has42"),
          length(col("c_name")).as("name_len"),
          element_at(split(col("c_name"), "#"), 2).as("after_hash"))
        .orderBy(col("c_custkey"))
    },

    // Regex function family over document text: global replace, match
    // counting, extraction, boolean match. Patterns stay in the
    // RE2 ∩ java.util.regex common subset (no backreferences, no
    // lookaround) so DuckDB computes identical results; DuckDB's
    // regexp_replace needs the explicit 'g' flag to match Spark's
    // replace-all default.
    "q_regex_funcs" -> { (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          regexp_replace(substring(col("text"), 1, 40), "[aeiou]", "*")
            .as("head_devoweled"),
          size(expr("regexp_extract_all(text, 'data', 0)")).as("n_data"),
          regexp_extract(col("text"), "[a-z]{9,}", 0).as("first_long_word"),
          col("text").rlike("(ing|tion) ").as("has_suffix"))
        .orderBy(col("doc_id"))
    },

    "q_date_funcs" -> { (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_add(col("o_orderdate").cast("date"), 30).as("d30"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_98"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey"))
    },

    // Sort FIRST on the narrow inputs, evaluate the math AFTER the
    // shuffle (r16, the r15 watch item): a Sort ABOVE a wide computed
    // projection evaluates it twice (the range-partitioner sample pass +
    // the real pass) and shuffles the 12 computed columns; sorting the 6
    // raw inputs and projecting on top evaluates every expression once,
    // post-exchange, and row order is untouched (Project preserves it).
    // Measured 3.3 → 0.83 s at sf0.1 — the same rows, same order.
    "q_math_funcs" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("r2"),
          floor(col("l_discount") * 100).as("disc_pct"),
          ceil(col("l_tax") * 100).as("tax_pct"),
          round(abs(col("l_discount") - 0.05), 4).as("abs_mid"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          round(log(col("l_extendedprice")), 4).as("ln_price"),
          round(log10(col("l_extendedprice")), 4).as("log10_price"),
          round(sqrt(col("l_quantity")), 4).as("sqrt_qty"),
          (col("l_orderkey") % 7).as("okey_mod7"),
          signum(col("l_discount") - 0.05).cast("int").as("disc_sign"))
    },

    // ONE string-schema from_json parse feeds k_str/k_int/no_missing
    // (r7 verdict: the prior shape ran get_json_object 3x + from_json 1x
    // — four parses per row, the slowest key in the clean bench). The
    // struct is projected in its own step so exactly one StringType
    // JsonToStructs survives in the plan whether or not codegen
    // subexpression elimination kicks in; JacksonParser reads the numeric
    // token as its raw text for the StringType field, matching
    // json_extract_string. k_struct comes from a SECOND, IntegerType-
    // schema parse — a deliberate 2-parse trade so the key still covers
    // Jackson's typed numeric coercion (the fixture's k is always an
    // integer literal, so typed parse ≡ the oracle's CAST).
    "q_json_funcs" -> { (s, d) =>
      val sch = StructType(Seq(
        StructField("k", StringType), StructField("missing", StringType)))
      val schTyped = StructType(Seq(StructField("k", IntegerType)))
      // sort the raw (event_id, props) FIRST, parse after the exchange —
      // the q_math_funcs discipline (r16): parsing under the Sort runs
      // Jackson twice (range-sample pass + real pass)
      Tables.events(s, d)
        .select(col("event_id"), col("props"))
        .orderBy(col("event_id"))
        .select(col("event_id"), from_json(col("props"), sch).as("j"),
                from_json(col("props"), schTyped).as("jt"))
        .select(
          col("event_id"),
          col("j.k").as("k_str"),
          col("j.k").cast("int").as("k_int"),
          col("jt.k").as("k_struct"),
          col("j.missing").isNull.as("no_missing"))
    },

    "q_array_funcs" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val sq: (Column, Column) => Column =
        (acc, x) => acc + x.cast("double") * x.cast("double")
      e.select(
          col("vec_id"),
          size(col("embedding")).as("n_dims"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
          round(array_max(col("embedding")).cast("double"), 4).as("max_val"),
          size(filter(col("embedding"), _ > 0)).as("n_pos"),
          array_contains(transform(col("embedding"), _ > lit(0.2f)), true).as("has_big"),
          round(sqrt(aggregate(col("embedding"), lit(0.0), sq)), 4).as("l2"),
          round(aggregate(slice(col("embedding"), 1, 8), lit(0.0),
                          (acc, x) => acc + x.cast("double")), 4).as("head8_sum"))
        .orderBy(col("vec_id"))
    },

    // Same single-parse discipline as q_json_funcs: hoist the MapType
    // parse into its own projection so the three downstream uses share
    // one JsonToStructs instead of relying on codegen subexpression
    // elimination to dedupe three copies.
    "q_map_funcs" -> { (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          from_json(col("props"), MapType(StringType, StringType)).as("m"))
        .select(
          col("event_id"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("keys_csv"),
          element_at(col("m"), "k").as("k_val"),
          size(map_keys(col("m"))).as("n_keys"))
        .orderBy(col("event_id"))
    },

    // Bitwise family — scalar ops (&, |, xor, shifts, popcount) fused into
    // one projection, then the bit-reduction aggregates (bit_and/or/xor)
    // per event type. The aggregate trio is mergeable (map-side partial →
    // final), so the shuffle carries one 3-long row per (partition, type).
    "q_bitwise_funcs" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
                col("event_id").bitwiseAND(lit(255L)).as("low8"),
                shiftleft(col("user_id"), 3).bitwiseOR(lit(5L)).as("tag"),
                col("event_id").bitwiseXOR(col("user_id")).as("mix"),
                bit_count(col("event_id")).as("nbits"))
        .groupBy(col("event_type"))
        .agg(bit_and(col("low8")).as("and_low8"),
             bit_or(col("tag")).as("or_tag"),
             bit_xor(col("mix")).as("xor_mix"),
             sum(col("nbits")).as("sum_bits"),
             count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // Calendar/interval arithmetic family: month addition (with end-of-
    // month clamping), last_day, quarter / ISO week, Monday-based weekday,
    // and day subtraction. Complements q_date_funcs (trunc/extract/format/
    // epoch); all closed-form projections, no shuffle.
    "q_interval_arith" -> { (s, d) =>
      val dd = col("o_orderdate").cast("date")
      Tables.orders(s, d)
        .select(col("o_orderkey"), dd.as("d"),
                add_months(dd, 2).as("plus2m"),
                last_day(dd).as("eom"),
                quarter(dd).as("qtr"),
                weekofyear(dd).as("iso_wk"),
                weekday(dd).as("wd"),
                date_sub(dd, 90).as("minus90d"))
        .orderBy(col("o_orderkey"))
    },

    // Error-safe expression surface (ANSI mode's escape hatches): under
    // Spark 4's default ANSI semantics a bad cast or a divide-by-zero
    // THROWS, so robust pipelines over dirty data use the try_* family —
    // failures become NULLs that flow through downstream aggregation
    // instead of killing the job. DuckDB twins: TRY_CAST, and DuckDB's
    // own division, which yields NULL on zero divisors. (try_add/
    // try_multiply overflow has no NULL-returning DuckDB twin — DuckDB
    // errors on integer overflow — so overflow stays out of the oracle-
    // matched surface.)
    //
    // SCALE NOTE (measured): Spark's TRY string→int cast returns its NULL
    // by CATCHING a per-row exception, ~7 µs per FAILING row (an
    // always-failing 150k-row column benched 6× the same table's 8-func
    // date projection). try_cast is priced for occasionally-dirty data —
    // the dirty column here fails 1% of rows, the realistic shape; a
    // mostly-invalid column wants a regex pre-filter, not try_cast
    // (SCALE.md "error-safe expressions").
    "q_try_funcs" -> { (s, d) =>
      val dirty = when(col("o_orderkey") % 100 === 0, col("o_orderstatus"))
        .otherwise((col("o_orderkey") % 50).cast("string"))
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          substring(col("o_orderpriority"), 1, 1).try_cast("int")
            .as("prio_num"),
          dirty.try_cast("int").as("dirty_int"),
          round(try_divide(col("o_totalprice"),
            (col("o_orderkey") % 3).cast("double")), 4).as("div3"))
        .orderBy(col("o_orderkey"))
    },

    // Calendar-spine gap detection: generate the full day range between
    // the first and last order date (`sequence` + explode — the date-spine
    // idiom), anti-join the days that have orders, return the days with
    // none. The spine is O(calendar days) regardless of fact size — it
    // explodes from a 1-row min/max aggregate (broadcast-sized by
    // construction); the fact side contributes one `groupBy(day)` shuffle
    // of pre-aggregated partials. The anti-join broadcasts whichever side
    // is smaller at runtime (AQE) — at 100 TB that's still the spine.
    "q_date_spine" -> { (s, d) =>
      val days = Tables.orders(s, d)
        .select(col("o_orderdate").cast("date").as("day"))
      val bounds = days.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val spine = bounds.select(
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY")))
          .as("day"))
      spine.join(days.distinct(), Seq("day"), "left_anti")
        .orderBy(col("day"))
    },

    // Generator path: posexplode of the first 4 embedding dims (GenerateExec).
    "q_explode" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 4)))
        .select(col("vec_id"), col("pos"),
                round(col("col").cast("double"), 4).as("val"))
        .orderBy(col("vec_id"), col("pos"))
    }
  )

  def oracles: Map[String, String] = Map(
    "q_string_funcs" -> """
      SELECT c_custkey,
        upper(c_mktsegment) AS seg_up,
        lower(c_name) AS name_lo,
        substr(c_name, 10, 9) AS digits,
        ltrim(substr(c_name, 10, 9), '0') AS digits_trim,
        concat(c_mktsegment, ':', c_name) AS tagged,
        lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
        replace(c_name, 'Customer#', 'C-') AS name_repl,
        regexp_extract(c_name, '([0-9]+)$', 1) AS name_num,
        c_name LIKE '%42%' AS has42,
        CAST(length(c_name) AS INT) AS name_len,
        string_split(c_name, '#')[2] AS after_hash
      FROM customer ORDER BY c_custkey""",

    "q_regex_funcs" -> """
      SELECT doc_id,
        regexp_replace(substr(text, 1, 40), '[aeiou]', '*', 'g')
          AS head_devoweled,
        CAST(len(regexp_extract_all(text, 'data')) AS INT) AS n_data,
        regexp_extract(text, '[a-z]{9,}', 0) AS first_long_word,
        regexp_matches(text, '(ing|tion) ') AS has_suffix
      FROM documents ORDER BY doc_id""",

    "q_date_funcs" -> """
      SELECT o_orderkey,
        date_trunc('month', o_orderdate) AS month_start,
        CAST(year(o_orderdate) AS INT) AS yr,
        CAST(month(o_orderdate) AS INT) AS mo,
        CAST(day(o_orderdate) AS INT) AS dom,
        CAST(o_orderdate AS DATE) + 30 AS d30,
        CAST(DATE '1998-01-01' - CAST(o_orderdate AS DATE) AS INT) AS days_to_98,
        strftime(o_orderdate, '%Y-%m') AS ym,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      FROM orders ORDER BY o_orderkey""",

    "q_math_funcs" -> """
      SELECT l_orderkey, l_linenumber,
        round(l_extendedprice, 2) AS r2,
        CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
        CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct,
        round(abs(l_discount - 0.05), 4) AS abs_mid,
        pow(l_quantity, 2) AS qty_sq,
        round(ln(l_extendedprice), 4) AS ln_price,
        round(log10(l_extendedprice), 4) AS log10_price,
        round(sqrt(l_quantity), 4) AS sqrt_qty,
        l_orderkey % 7 AS okey_mod7,
        CAST(sign(l_discount - 0.05) AS INT) AS disc_sign
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q_json_funcs" -> """
      SELECT event_id,
        json_extract_string(props, '$.k') AS k_str,
        CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        CAST(json_extract_string(props, '$.k') AS INT) AS k_struct,
        json_extract_string(props, '$.missing') IS NULL AS no_missing
      FROM events ORDER BY event_id""",

    "q_array_funcs" -> """
      SELECT vec_id,
        CAST(len(embedding) AS INT) AS n_dims,
        round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
        round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 4) AS max_val,
        CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        list_contains(list_transform(embedding, x -> x > CAST(0.2 AS FLOAT)), true) AS has_big,
        round(sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)), 4) AS l2,
        round(list_reduce(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)), (a, b) -> a + b), 4) AS head8_sum
      FROM embeddings ORDER BY vec_id""",

    "q_map_funcs" -> """
      SELECT event_id,
        array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
        json_extract_string(props, '$.k') AS k_val,
        CAST(len(json_keys(props)) AS INT) AS n_keys
      FROM events ORDER BY event_id""",

    "q_bitwise_funcs" -> """
      SELECT event_type,
        bit_and(event_id & 255) AS and_low8,
        bit_or((user_id << 3) | 5) AS or_tag,
        bit_xor(xor(event_id, user_id)) AS xor_mix,
        CAST(sum(bit_count(event_id)) AS BIGINT) AS sum_bits,
        count(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_try_funcs" -> """
      SELECT o_orderkey,
        try_cast(substr(o_orderpriority, 1, 1) AS INT) AS prio_num,
        try_cast(CASE WHEN o_orderkey % 100 = 0 THEN o_orderstatus
                      ELSE CAST(o_orderkey % 50 AS VARCHAR) END AS INT)
          AS dirty_int,
        round(o_totalprice / nullif(CAST(o_orderkey % 3 AS DOUBLE), 0.0), 4) AS div3
      FROM orders ORDER BY o_orderkey""",

    "q_interval_arith" -> """
      SELECT o_orderkey,
        CAST(o_orderdate AS DATE) AS d,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
        last_day(CAST(o_orderdate AS DATE)) AS eom,
        CAST(quarter(o_orderdate) AS INT) AS qtr,
        CAST(weekofyear(o_orderdate) AS INT) AS iso_wk,
        CAST(isodow(o_orderdate) - 1 AS INT) AS wd,
        CAST(o_orderdate AS DATE) - 90 AS minus90d
      FROM orders ORDER BY o_orderkey""",

    "q_date_spine" -> """
      WITH days AS (
        SELECT CAST(o_orderdate AS DATE) AS day FROM orders
      ), bounds AS (
        SELECT min(day) AS lo, max(day) AS hi FROM days
      ), spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
          AS day
        FROM bounds
      )
      SELECT s.day FROM spine s
      WHERE NOT EXISTS (SELECT 1 FROM days d WHERE d.day = s.day)
      ORDER BY s.day""",

    "q_explode" -> """
      SELECT vec_id, CAST(t.r AS INT) AS pos,
        round(CAST(embedding[CAST(t.r AS INT) + 1] AS DOUBLE), 4) AS val
      FROM embeddings, range(4) t(r)
      ORDER BY vec_id, pos"""
  )
}
