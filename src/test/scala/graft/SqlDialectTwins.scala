package graft

/** Spark-dialect SQL twins for the contract keys whose DuckDB oracle SQL
  * is NOT valid Spark SQL — each entry is the oracle rewritten construct-
  * for-construct into Spark dialect (string_split->split, unnest->explode,
  * strlen->length, list_filter->filter, DOUBLE[]->ARRAY<DOUBLE>,
  * time_bucket->epoch flooring, regex flags->default-global, ...), keeping
  * the oracle's structure, constants, and column names. The engine's
  * registered extension functions (md5_prefix60, word_shingles) stand in
  * for the oracle's inline md5-hex-prefix / list_transform shingle idioms —
  * which also pins their SQL registration. SqlDialectTwinSpec asserts each
  * twin row-for-row against the DSL; SqlParityContractSpec pins this map's
  * key set to SqlParityKeys.dialectTwins.
  *
  * The minhash/simhash fragments are GENERATED from the same NumPerms/
  * permA/permB/PermP vals the DSL and the DuckDB oracle both use (TextOps
  * is the single source of truth for the 128 constants).
  */
object SqlDialectTwins {

  // ---- generated fragments (shared constants with the DSL/oracle) ----

  /** Spark twin of the oracle's 60-bit md5-prefix digest. */
  private def h60(col: String): String =
    s"md5_prefix60($col)"

  private def minhashSigMins: String =
    (0 until graft.ops.TextOps.NumPerms).map { j =>
      s"min((${graft.ops.TextOps.permA(j)} * h32 + ${graft.ops.TextOps.permB(j)}) % ${graft.ops.TextOps.PermP}) AS m$j"
    }.mkString(",\n          ")

  private def minhashBandRows: String =
    (0 until graft.ops.TextOps.NumBands).map { b =>
      s"SELECT doc_id, $b AS band, m${4 * b} AS v0, m${4 * b + 1} AS v1, " +
        s"m${4 * b + 2} AS v2, m${4 * b + 3} AS v3 FROM sigs"
    }.mkString("\n        UNION ALL ")

  /** Spark-dialect minhash pairs CTE body (parallel to TextOps.minhashPairsSql). */
  private def minhashPairsSparkSql: String = s"""
      WITH sh AS (
        SELECT DISTINCT doc_id, ${h60("s")} AS h
        FROM (
          SELECT doc_id, explode(word_shingles(text, 3)) AS s
          FROM documents WHERE size(split(text, ' ')) >= 3
        )
      ), sh32 AS (
        SELECT doc_id, h, h % 4294967296 AS h32 FROM sh
      ), sigs AS (
        SELECT doc_id,
          $minhashSigMins
        FROM sh32 GROUP BY doc_id
      ), bands AS (
        $minhashBandRows
      ), cand AS (
        SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.v0 = y.v0 AND x.v1 = y.v1
         AND x.v2 = y.v2 AND x.v3 = y.v3 AND x.doc_id < y.doc_id
      ), sizes AS (
        SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
      ), inter AS (
        SELECT c.d1, c.d2, count(*) AS n_inter
        FROM cand c
        JOIN sh s1 ON s1.doc_id = c.d1
        JOIN sh s2 ON s2.doc_id = c.d2 AND s2.h = s1.h
        GROUP BY c.d1, c.d2
      )
      SELECT d1, d2, jaccard FROM (
        SELECT c.d1, c.d2,
          round(CAST(coalesce(i.n_inter, 0) AS DOUBLE) /
                (z1.n + z2.n - coalesce(i.n_inter, 0)), 4) AS jaccard
        FROM cand c
        LEFT JOIN inter i ON i.d1 = c.d1 AND i.d2 = c.d2
        JOIN sizes z1 ON z1.doc_id = c.d1
        JOIN sizes z2 ON z2.doc_id = c.d2
      ) WHERE jaccard >= 0.5"""

  private def simhashBitSums: String =
    (0 until 60).map { i =>
      s"sum(CASE WHEN (shiftright(h, $i) & 1) = 1 THEN 1 ELSE -1 END) AS b$i"
    }.mkString(", ")

  private def simhashRecombine: String =
    (0 until 60).map { i =>
      s"(CASE WHEN b$i > 0 THEN ${1L << i}L ELSE 0L END)"
    }.mkString(" + ")

  /** Shared greedy size-batching recursive CTE (the reference's 1024-byte
    * pre-insert-flush state machine): q_batch_assignment and
    * q_batch_payload differ only in their final SELECT over `st`. */
  private def batchStateCte: String = """
    WITH RECURSIVE ev AS (
      SELECT event_id, user_id, length(event_type) + length(props) AS sz,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), st MAX RECURSION LEVEL 1000 AS (
      SELECT user_id, rn, event_id, sz,
             CAST(0 AS BIGINT) AS batch_id, CAST(0 AS BIGINT) AS cum_before,
             CAST(sz AS BIGINT) AS cur_after
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.rn, e.event_id, e.sz,
        CASE WHEN s.cur_after + e.sz >= 1024 AND s.cur_after > 0
             THEN s.batch_id + 1 ELSE s.batch_id END,
        CASE WHEN s.cur_after + e.sz >= 1024 AND s.cur_after > 0
             THEN 0 ELSE s.cur_after END,
        CASE WHEN s.cur_after + e.sz >= 1024 AND s.cur_after > 0
             THEN 0 ELSE s.cur_after END + e.sz
      FROM st s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1
    )"""

  /** q_event_size and q_udf_scalar share one projection: the DSLs differ
    * (codegen'd expression vs registered Scala UDF) but the SQL surface is
    * the same size computation. */
  private def eventSizeSql: String = """
      SELECT event_id, length(event_type) + length(props) AS sz
      FROM events ORDER BY event_id"""

  /** Spark-dialect q_bpe_merges twin, unrolled from the same
    * [[graft.ops.PipelineOps.BpeMerges]] constant as the DSL and the
    * DuckDB oracle. */
  private def bpeTwinSparkSql: String = {
    val n = graft.ops.PipelineOps.BpeMerges
    def block(i: Int) = s"""
      p$i AS (
        SELECT lhs, rhs, cnt FROM (
          SELECT p.lhs AS lhs, p.rhs AS rhs, count(*) AS cnt
          FROM (
            SELECT explode(zip_with(
              slice(toks, 1, greatest(size(toks) - 1, 0)),
              slice(toks, 2, greatest(size(toks) - 1, 0)),
              (a, b) -> named_struct('lhs', a, 'rhs', b))) AS p
            FROM (SELECT split(substring(s, 2, length(s) - 2), '\\\\]\\\\[')
                    AS toks FROM docs${i - 1}))
          GROUP BY 1, 2)
        ORDER BY cnt DESC, lhs, rhs LIMIT 1),
      docs$i AS (
        SELECT doc_id,
          replace(s, concat('[', p$i.lhs, '][', p$i.rhs, ']'),
                     concat('[', p$i.lhs, '+', p$i.rhs, ']')) AS s
        FROM docs${i - 1}, p$i)"""
    val selects = (1 to n).map(i =>
      s"SELECT $i AS merge_idx, lhs, rhs, cnt FROM p$i")
      .mkString("\n        UNION ALL ")
    s"""
      WITH docs0 AS (
        SELECT doc_id, concat('[', replace(text, ' ', ']['), ']') AS s
        FROM documents),${(1 to n).map(block).mkString(",")}
      SELECT * FROM (
        $selects)
      ORDER BY merge_idx"""
  }

  val twins: Map[String, String] = Map(

    // ---- no-DuckDB-oracle family (the DSL<->Spark-SQL twin still exists:
    // HLL registers are a max over hashed values, order- and
    // partitioning-independent, so the estimate is deterministic for a
    // given value set and rsd on both entry paths) ----
    "q_agg_approx_distinct" -> """
      SELECT event_type,
             approx_count_distinct(user_id, 0.02) AS approx_users,
             count(1) AS n
      FROM events GROUP BY event_type ORDER BY event_type""",

    // ---- strlen family ----
    "q_event_size" -> eventSizeSql,

    "q_send_path" -> """
      SELECT event_id, user_id, length(event_type) + length(props) AS payload_bytes,
             1 AS n_items
      FROM events ORDER BY event_id""",

    "q_udf_scalar" -> eventSizeSql,

    "q_batch_assignment" -> (batchStateCte + """
      SELECT event_id, user_id, batch_id, cum_before, sz FROM st
      ORDER BY event_id"""),

    "q_batch_payload" -> (batchStateCte + """
      SELECT user_id, batch_id, count(*) AS n_items,
             CAST(sum(sz) AS BIGINT) AS payload_bytes
      FROM st GROUP BY user_id, batch_id ORDER BY user_id, batch_id"""),

    // ---- text family ----
    "q_text_stats" -> """
      SELECT lang, source, count(*) AS n_docs,
        round(avg(n_chars), 4) AS avg_chars,
        round(avg(size(split(text, ' '))), 4) AS avg_tokens
      FROM documents GROUP BY lang, source ORDER BY lang, source""",

    "q_token_count" -> """
      SELECT lang,
        CAST(sum(size(split(text, ' '))) AS BIGINT) AS ws_tokens,
        CAST(sum(size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)))
          AS BIGINT) AS re_tokens,
        round(CAST(sum(length(text)) AS DOUBLE) /
          sum(size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))), 4)
          AS chars_per_token
      FROM documents GROUP BY lang ORDER BY lang""",

    "q_text_tokenize" -> """
      SELECT w AS word, count(*) AS n
      FROM (SELECT explode(split(text, ' ')) AS w FROM documents)
      GROUP BY w ORDER BY n DESC, word LIMIT 20""",

    "q_tfidf" -> """
      WITH toks AS (
        SELECT doc_id, explode(split(text, ' ')) AS word
        FROM documents),
      tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
      dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
      df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT t.doc_id, t.word,
          round((t.tf / CAST(d.dl AS DOUBLE)) *
                ln(n.n_docs / CAST(f.df AS DOUBLE)), 4) AS tfidf
        FROM tf t JOIN dl d USING (doc_id) JOIN df f USING (word), n)
      SELECT doc_id, CAST(rn AS INT) AS rn, word, tfidf FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC, word) AS rn
        FROM scored)
      WHERE rn <= 3
      ORDER BY doc_id, rn""",

    "q_unigram_lm" -> """
      WITH toks AS (
        SELECT doc_id, explode(split(text, ' ')) AS word
        FROM documents),
      tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
      vocab AS (SELECT word, count(*) AS cnt FROM toks GROUP BY 1),
      tot AS (SELECT count(*) AS total FROM toks)
      SELECT t.doc_id, CAST(sum(t.tf) AS BIGINT) AS n_tokens,
        round(sum(t.tf * ln(v.cnt / CAST(tot.total AS DOUBLE)))
          / sum(t.tf), 4) AS avg_logp
      FROM tf t JOIN vocab v USING (word), tot
      GROUP BY t.doc_id ORDER BY t.doc_id""",

    "q_lang_id" -> """
      WITH w AS (
        SELECT doc_id, lang, explode(split(text, ' ')) AS word
        FROM documents),
      profile AS (
        SELECT p_lang, word FROM (
          SELECT lang AS p_lang, word, count(*) AS n,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY count(*) DESC, word) AS rn
          FROM w GROUP BY lang, word) WHERE rn <= 20),
      pred AS (
        SELECT doc_id, lang, p_lang FROM (
          SELECT dw.doc_id, dw.lang, p.p_lang, count(*) AS score,
                 row_number() OVER (PARTITION BY dw.doc_id
                   ORDER BY count(*) DESC, p.p_lang) AS rn
          FROM (SELECT DISTINCT doc_id, lang, word FROM w) dw
          JOIN profile p ON dw.word = p.word
          GROUP BY dw.doc_id, dw.lang, p.p_lang) WHERE rn = 1)
      SELECT lang, p_lang AS pred_lang, count(*) AS n_docs
      FROM pred GROUP BY lang, p_lang ORDER BY lang, pred_lang""",

    "q_quality_score" -> """
      WITH w AS (
        SELECT doc_id, explode(split(text, ' ')) AS word FROM documents),
      stop AS (
        SELECT word FROM w GROUP BY word
        ORDER BY count(*) DESC, word LIMIT 10),
      per_doc AS (
        SELECT w.doc_id, count(*) AS n_tokens,
               count(DISTINCT w.word) AS n_distinct,
               count(s.word) AS n_stop
        FROM w LEFT JOIN stop s ON w.word = s.word
        GROUP BY w.doc_id)
      SELECT doc_id, n_tokens, distinct_ratio, stop_ratio, avg_word_len,
        CAST((q_int + 5) div 10 AS DOUBLE) / 10000.0 AS quality
      FROM (
        SELECT d.doc_id, p.n_tokens,
          round(CAST(p.n_distinct AS DOUBLE) / p.n_tokens, 4) AS distinct_ratio,
          round(CAST(p.n_stop AS DOUBLE) / p.n_tokens, 4) AS stop_ratio,
          round(CAST(length(d.text) - p.n_tokens + 1 AS DOUBLE) / p.n_tokens, 4)
            AS avg_word_len,
          4 * CAST(round(round(CAST(p.n_distinct AS DOUBLE) / p.n_tokens, 4)
                * 10000) AS BIGINT)
            + 3 * (10000 - CAST(round(round(CAST(p.n_stop AS DOUBLE)
                / p.n_tokens, 4) * 10000) AS BIGINT))
            + 3 * least(p.n_tokens, 100) * 100 AS q_int
        FROM documents d JOIN per_doc p ON d.doc_id = p.doc_id)
      ORDER BY doc_id""",

    "q_bm25" -> """
      WITH hits AS (
        SELECT doc_id,
          CAST(size(filter(split(text, ' '),
                               x -> x = 'spark')) AS INT) AS tf,
          CAST(size(split(text, ' ')) AS INT) AS dl
        FROM documents),
      corpus AS (
        SELECT count(*) AS n_docs,
               avg(size(split(text, ' '))) AS avgdl
        FROM documents),
      dft AS (SELECT count(*) AS df_t FROM hits WHERE tf > 0)
      SELECT h.doc_id, h.tf, h.dl,
        round(ln(1.0 + (c.n_docs - d.df_t + 0.5) / (d.df_t + 0.5)) *
              (h.tf * CAST(2.2 AS DOUBLE)) /
              (h.tf + CAST(1.2 AS DOUBLE) *
                (CAST(0.25 AS DOUBLE) +
                 CAST(0.75 AS DOUBLE) * h.dl / c.avgdl)), 4) AS bm25
      FROM hits h, corpus c, dft d
      WHERE h.tf > 0
      ORDER BY bm25 DESC, doc_id""",

    "q_text_search" -> """
      SELECT doc_id, tf, n_tokens FROM (
        SELECT doc_id,
          CAST(size(filter(split(text, ' '), x -> x = 'spark')) AS INT) AS tf,
          CAST(size(split(text, ' ')) AS INT) AS n_tokens
        FROM documents)
      WHERE tf > 0
      ORDER BY tf DESC, doc_id""",

    "q_regex_funcs" -> """
      SELECT doc_id,
        regexp_replace(substr(text, 1, 40), '[aeiou]', '*')
          AS head_devoweled,
        CAST(size(regexp_extract_all(text, 'data', 0)) AS INT) AS n_data,
        regexp_extract(text, '[a-z]{9,}', 0) AS first_long_word,
        text RLIKE '(ing|tion) ' AS has_suffix
      FROM documents ORDER BY doc_id""",

    "q_fuzzy_match" -> """
      WITH words AS (
        SELECT w AS word, count(*) AS n_occ
        FROM (SELECT explode(split(text, ' ')) AS w FROM documents)
        GROUP BY w
      ), probes AS (
        SELECT DISTINCT substr(word, 1, length(word) - 1) AS probe FROM words
        WHERE length(word) - 1 >= 3
      )
      SELECT p.probe, w.word, levenshtein(p.probe, w.word) AS dist, w.n_occ
      FROM probes p JOIN words w
        ON substr(p.probe, 1, 1) = substr(w.word, 1, 1)
       AND abs(length(p.probe) - length(w.word)) <= 1
       AND levenshtein(p.probe, w.word) <= 1
      ORDER BY probe, word""",

    // ---- date/time family ----
    "q_date_funcs" -> """
      SELECT o_orderkey,
        date_trunc('month', o_orderdate) AS month_start,
        CAST(year(o_orderdate) AS INT) AS yr,
        CAST(month(o_orderdate) AS INT) AS mo,
        CAST(day(o_orderdate) AS INT) AS dom,
        date_add(CAST(o_orderdate AS DATE), 30) AS d30,
        CAST(datediff(DATE '1998-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_to_98,
        date_format(o_orderdate, 'yyyy-MM') AS ym,
        CAST(unix_timestamp(o_orderdate) AS BIGINT) AS epoch_s
      FROM orders ORDER BY o_orderkey""",

    "q_retention" -> """
      WITH activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events),
      cohort AS (
        SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id)
      SELECT c.cohort_day,
             CAST(datediff(a.day, c.cohort_day) AS INT) AS day_offset,
             count(DISTINCT a.user_id) AS n_users
      FROM activity a JOIN cohort c USING (user_id)
      GROUP BY 1, 2
      ORDER BY cohort_day, day_offset""",

    "q_sliding_window" -> """
      SELECT timestamp_seconds(CAST(floor(unix_timestamp(ts) / 900) * 900 AS BIGINT))
               - CAST(t.r AS INT) * INTERVAL '15' MINUTE AS win_start,
             count(*) AS n
      FROM events LATERAL VIEW explode(sequence(0, 3)) t AS r
      GROUP BY 1 ORDER BY win_start""",

    "q_stream_agg_chain" -> """
      WITH sub AS (
        SELECT timestamp_seconds(CAST(floor(unix_timestamp(ts) / 900) * 900 AS BIGINT)) AS w15,
               count(*) AS n15
        FROM events GROUP BY 1)
      SELECT date_trunc('hour', w15) AS win_start,
        round(avg(n15), 4) AS avg_n15,
        max(n15) AS max_n15,
        CAST(sum(n15) AS BIGINT) AS sum_n
      FROM sub GROUP BY 1 ORDER BY win_start""",

    "q_interpolate" -> """
      WITH s AS (
        SELECT timestamp_seconds(CAST(floor(unix_timestamp(ts) / 3600) * 3600 AS BIGINT)) AS h,
               sum(CAST(value AS DECIMAL(18,2))) AS v
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      spine AS (
        SELECT explode(sequence((SELECT min(h) FROM s),
                                (SELECT max(h) FROM s),
                                INTERVAL '1' HOUR)) AS h),
      j AS (SELECT spine.h, s.v FROM spine LEFT JOIN s USING (h)),
      m AS (
        SELECT h, v,
          last_value(CAST(v AS DOUBLE), true) OVER wp AS pv,
          last_value(CASE WHEN v IS NOT NULL THEN h END, true)
            OVER wp AS ph,
          first_value(CAST(v AS DOUBLE), true) OVER wn AS nv,
          first_value(CASE WHEN v IS NOT NULL THEN h END, true)
            OVER wn AS nh
        FROM j WINDOW
          wp AS (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wn AS (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT h AS win_h, (v IS NULL) AS is_gap,
        round(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
          ELSE pv + (nv - pv) * (unix_timestamp(h) - unix_timestamp(ph))
                 / (unix_timestamp(nh) - unix_timestamp(ph)) END, 4) AS v_filled
      FROM m ORDER BY win_h""",

    // ---- misc scalar families ----
    "q_bitwise_funcs" -> """
      SELECT event_type,
        bit_and(event_id & 255) AS and_low8,
        bit_or(shiftleft(user_id, 3) | 5) AS or_tag,
        bit_xor(event_id ^ user_id) AS xor_mix,
        CAST(sum(bit_count(event_id)) AS BIGINT) AS sum_bits,
        count(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_corpus_mix" -> """
      SELECT source, count(*) AS n_kept,
             CAST(sum(n_chars) AS BIGINT) AS kept_chars
      FROM documents
      WHERE md5_prefix60(text) % 100 <
        CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 75
                    WHEN 'src2' THEN 50 ELSE 25 END
      GROUP BY source ORDER BY source""",

    "q_explode" -> """
      SELECT vec_id, CAST(t.r AS INT) AS pos,
        round(CAST(element_at(embedding, CAST(t.r AS INT) + 1) AS DOUBLE), 4) AS val
      FROM embeddings LATERAL VIEW explode(sequence(0, 3)) t AS r
      ORDER BY vec_id, pos""",

    "q_agg_collect" -> """
      SELECT c_mktsegment,
        array_join(transform(array_sort(collect_set(c_nationkey)),
                             x -> CAST(x AS STRING)), ',') AS nations,
        count(*) AS n
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q_map_funcs" -> """
      SELECT event_id,
        array_join(array_sort(json_object_keys(props)), ',') AS keys_csv,
        get_json_object(props, '$.k') AS k_val,
        CAST(size(json_object_keys(props)) AS INT) AS n_keys
      FROM events ORDER BY event_id""",

    "q_json_funcs" -> """
      SELECT event_id,
        get_json_object(props, '$.k') AS k_str,
        CAST(get_json_object(props, '$.k') AS INT) AS k_int,
        CAST(get_json_object(props, '$.k') AS INT) AS k_struct,
        get_json_object(props, '$.missing') IS NULL AS no_missing
      FROM events ORDER BY event_id""",

    "q_multimodal_meta" -> """
      SELECT doc_id, 'text/plain' AS media_type,
        CAST(octet_length(text) AS BIGINT) AS n_bytes,
        upper(hex(encode(substr(text, 1, 4), 'UTF-8'))) AS magic_hex,
        base64(encode(substr(text, 1, 6), 'UTF-8')) AS head_b64,
        CAST(octet_length(text) div 64 AS BIGINT) AS n_frames
      FROM documents ORDER BY doc_id""",

    "q_cast_types" -> """
      SELECT l_orderkey, l_linenumber,
        CAST(l_quantity AS INT) AS qty_int,
        CAST(CAST(l_quantity AS INT) AS STRING) AS qty_str,
        round(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) + CAST(1.5 AS DECIMAL(12,2)) AS DOUBLE), 4) AS price_plus,
        date_format(CAST(l_shipdate AS DATE), 'yyyy-MM-dd') AS ship_date,
        CAST(l_shipdate AS STRING) AS ship_str,
        CAST(CAST(l_shipdate AS STRING) AS TIMESTAMP) AS ship_rt,
        CAST(CAST(l_orderkey AS STRING) AS BIGINT) AS okey_rt
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q_try_funcs" -> """
      SELECT o_orderkey,
        try_cast(substr(o_orderpriority, 1, 1) AS INT) AS prio_num,
        try_cast(CASE WHEN o_orderkey % 100 = 0 THEN o_orderstatus
                      ELSE CAST(o_orderkey % 50 AS STRING) END AS INT)
          AS dirty_int,
        round(o_totalprice / nullif(CAST(o_orderkey % 3 AS DOUBLE), 0.0), 4) AS div3
      FROM orders ORDER BY o_orderkey""",

    "q_pii_scrub" -> """
      WITH dirty AS (
        SELECT c_custkey, lower(
          c_name || ' contact user' || CAST(c_custkey AS STRING)
          || '@example.com'
          || CASE WHEN c_custkey % 3 <> 0
               THEN ' or 555-' ||
                 lpad(CAST((c_custkey * 7) % 10000 AS STRING), 4, '0')
               ELSE '' END
          || CASE WHEN c_custkey % 5 = 0
               THEN ' cc admin' || CAST(c_custkey AS STRING) || '@corp.net'
               ELSE '' END
          || ' via https://ex.com/' || c_mktsegment) AS raw
        FROM customer)
      SELECT c_custkey,
        CAST(size(regexp_extract_all(raw, '[a-z0-9.#]+@[a-z0-9.]+', 0)) AS INT)
          AS n_emails,
        CAST(size(regexp_extract_all(raw, '555-[0-9]{4}', 0)) AS INT)
          AS n_phones,
        CAST(size(regexp_extract_all(raw, 'https://[a-z0-9./]+', 0)) AS INT)
          AS n_urls,
        regexp_replace(regexp_replace(regexp_replace(raw,
          '[a-z0-9.#]+@[a-z0-9.]+', '<EMAIL>'),
          '555-[0-9]{4}', '<PHONE>'),
          'https://[a-z0-9./]+', '<URL>') AS scrubbed
      FROM dirty ORDER BY c_custkey""",

    "q_table_checksum" -> """
      WITH r AS (
        SELECT l_returnflag, md5_prefix60(concat_ws('|', l_orderkey, l_partkey, l_suppkey, l_linenumber, CAST(CAST(l_quantity AS DECIMAL(18,2)) AS STRING), CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS STRING), l_returnflag, l_linestatus, unix_micros(CAST(l_shipdate AS TIMESTAMP)))) AS rh
        FROM lineitem)
      SELECT l_returnflag, count(*) AS n_rows, bit_xor(rh) AS xor_h,
             min(rh) AS min_h, max(rh) AS max_h
      FROM r GROUP BY l_returnflag ORDER BY l_returnflag""",

    // ---- embeddings family ----
    "q_array_funcs" -> """
      SELECT vec_id,
        CAST(size(embedding) AS INT) AS n_dims,
        round(CAST(element_at(embedding, 1) AS DOUBLE), 4) AS first_val,
        round(CAST(array_max(embedding) AS DOUBLE), 4) AS max_val,
        CAST(size(filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        array_contains(transform(embedding, x -> x > CAST(0.2 AS FLOAT)), true) AS has_big,
        round(sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (a, b) -> a + b)), 4) AS l2,
        round(aggregate(transform(slice(embedding, 1, 8), x -> CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (a, b) -> a + b), 4) AS head8_sum
      FROM embeddings ORDER BY vec_id""",

    "q_similarity_topk" -> """
      WITH probes AS (
        SELECT vec_id AS probe_id, CAST(embedding AS ARRAY<DOUBLE>) AS pe
        FROM embeddings WHERE vec_id < 5),
      pairs AS (
        SELECT p.probe_id, e.vec_id,
          round(aggregate(zip_with(p.pe, CAST(e.embedding AS ARRAY<DOUBLE>), (x, y) -> x * y), CAST(0 AS DOUBLE), (a, b) -> a + b) /
            (sqrt(aggregate(zip_with(p.pe, p.pe, (x, y) -> x * y), CAST(0 AS DOUBLE), (a, b) -> a + b)) *
             sqrt(aggregate(zip_with(CAST(e.embedding AS ARRAY<DOUBLE>), CAST(e.embedding AS ARRAY<DOUBLE>), (x, y) -> x * y), CAST(0 AS DOUBLE), (a, b) -> a + b))), 4) AS cos
        FROM embeddings e JOIN probes p ON e.vec_id <> p.probe_id)
      SELECT probe_id, CAST(rn AS INT) AS rn, vec_id, cos FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                    ORDER BY cos DESC, vec_id) AS rn
        FROM pairs) WHERE rn <= 5
      ORDER BY probe_id, rn""",

    "q_embed_quantize" -> """
      WITH q AS (
        SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS e,
          array_max(transform(CAST(embedding AS ARRAY<DOUBLE>),
                              x -> abs(x))) AS maxabs
        FROM embeddings),
      s AS (
        SELECT vec_id, e, maxabs / 127.0 AS scale,
          transform(e, x -> round(x / (maxabs / 127.0))) AS qd
        FROM q WHERE maxabs > 0),
      d AS (
        SELECT vec_id, e, scale, qd,
          transform(qd, x -> x * scale) AS dq
        FROM s)
      SELECT vec_id,
        CAST(aggregate(qd, CAST(0 AS DOUBLE), (a, b) -> a + b) AS BIGINT) AS sum_q,
        round(scale, 6) AS scale_r,
        round(sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), CAST(0 AS DOUBLE), (a, b) -> a + b)
          - 2.0 * aggregate(zip_with(e, dq, (x, y) -> x * y), CAST(0 AS DOUBLE), (a, b) -> a + b)
          + aggregate(zip_with(dq, dq, (x, y) -> x * y), CAST(0 AS DOUBLE), (a, b) -> a + b)), 6) AS l2_err
      FROM d ORDER BY vec_id""",

    "q_dedup_embed" -> """
      WITH e AS (
        SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v,
          (CASE WHEN element_at(embedding, 1) >= 0 THEN 1 ELSE 0 END)
          + (CASE WHEN element_at(embedding, 2) >= 0 THEN 2 ELSE 0 END)
          + (CASE WHEN element_at(embedding, 3) >= 0 THEN 4 ELSE 0 END)
          + (CASE WHEN element_at(embedding, 4) >= 0 THEN 8 ELSE 0 END) AS bkt
        FROM embeddings),
      pairs AS (
        SELECT x.vec_id AS v1, y.vec_id AS v2,
          round(aggregate(zip_with(x.v, y.v, (p, q) -> p * q), CAST(0 AS DOUBLE), (a, b) -> a + b) /
            (sqrt(aggregate(zip_with(x.v, x.v, (p, q) -> p * q), CAST(0 AS DOUBLE), (a, b) -> a + b)) *
             sqrt(aggregate(zip_with(y.v, y.v, (p, q) -> p * q), CAST(0 AS DOUBLE), (a, b) -> a + b))), 4) AS cos
        FROM e x JOIN e y ON x.bkt = y.bkt AND x.vec_id < y.vec_id)
      SELECT v1, v2, cos FROM pairs WHERE cos >= 0.35 ORDER BY v1, v2""",

    "q_ann_ivf" -> graft.ops.PipelineOps.annIvfSql(duck = false),

    // ---- fingerprint / ngram / contamination ----
    "q_doc_fingerprint" -> s"""
      WITH pos AS (
        SELECT doc_id, text,
               explode(sequence(1, greatest(length(text) - 4, 1))) AS pos
        FROM documents),
      g AS (
        SELECT doc_id, pos, ${h60("substr(text, pos, 5)")} AS h FROM pos),
      fp AS (
        SELECT DISTINCT doc_id,
          min(h) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp
        FROM g)
      SELECT doc_id, count(*) AS n_fp, bit_xor(fp) AS fp_xor,
             min(fp) AS fp_min
      FROM fp GROUP BY doc_id ORDER BY doc_id""",

    "q_dedup_ngram" -> s"""
      WITH g AS (
        SELECT DISTINCT doc_id, ${h60("gs")} AS g
        FROM (
          SELECT doc_id, explode(word_shingles(text, 2)) AS gs
          FROM documents)),
      sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
      rare AS (
        SELECT g.doc_id, g.g FROM g
        JOIN (SELECT g FROM g GROUP BY g HAVING count(*) <= 20) r
          ON g.g = r.g),
      cand AS (
        SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
        FROM rare x JOIN rare y ON x.g = y.g AND x.doc_id < y.doc_id),
      inter AS (
        SELECT c.d1, c.d2, count(*) AS n_inter
        FROM cand c
        JOIN g g1 ON g1.doc_id = c.d1
        JOIN g g2 ON g2.doc_id = c.d2 AND g2.g = g1.g
        GROUP BY c.d1, c.d2)
      SELECT i.d1, i.d2,
        round(CAST(i.n_inter AS DOUBLE) / (s1.n + s2.n - i.n_inter), 4)
          AS jaccard
      FROM inter i
      JOIN sizes s1 ON s1.doc_id = i.d1
      JOIN sizes s2 ON s2.doc_id = i.d2
      WHERE round(CAST(i.n_inter AS DOUBLE) / (s1.n + s2.n - i.n_inter), 4)
        >= 0.4
      ORDER BY i.d1, i.d2""",

    "q_eval_contamination" -> s"""
      WITH grams AS (
        SELECT DISTINCT doc_id, ${h60("gs")} AS g FROM (
          SELECT doc_id, explode(word_shingles(text, 8)) AS gs
          FROM documents WHERE size(split(text, ' ')) >= 8)
      ), eval_g AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0
      ), train AS (
        SELECT doc_id, g FROM grams WHERE doc_id % 20 <> 0
      ), tot AS (
        SELECT doc_id, count(*) AS n_grams FROM train GROUP BY doc_id
      ), hit AS (
        SELECT t.doc_id, count(*) AS n_hit
        FROM train t JOIN eval_g e USING (g) GROUP BY t.doc_id
      )
      SELECT doc_id, n_grams,
        round(CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE), 4)
          AS contamination
      FROM tot JOIN hit USING (doc_id)
      WHERE round(CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE), 4) >= 0.5
      ORDER BY doc_id""",

    // ---- simhash (generated bit fan-out) ----
    "q_dedup_simhash" -> s"""
      WITH w AS (
        SELECT doc_id, explode(split(text, ' ')) AS word
        FROM documents),
      h AS (SELECT DISTINCT doc_id, ${h60("word")} AS h FROM w),
      b AS (SELECT doc_id, $simhashBitSums FROM h GROUP BY doc_id),
      s AS (SELECT doc_id, $simhashRecombine AS sim FROM b),
      bd AS (
        SELECT doc_id, sim, t.j AS bj, shiftright(sim, 15 * t.j) & 32767 AS bv
        FROM s LATERAL VIEW explode(sequence(0, 3)) t AS j),
      cand AS (
        SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
               x.sim AS s1, y.sim AS s2
        FROM bd x JOIN bd y
          ON x.bj = y.bj AND x.bv = y.bv AND x.doc_id < y.doc_id)
      SELECT d1, d2, CAST(bit_count(s1 ^ s2) AS BIGINT) AS hamming
      FROM cand WHERE bit_count(s1 ^ s2) <= 3
      ORDER BY d1, d2""",

    // ---- minhash family (generated from shared constants) ----
    "q_dedup_minhash" -> (minhashPairsSparkSql + "\n      ORDER BY d1, d2"),

    // same TextOps.minhashRecallSql source as the DuckDB oracle (only the
    // shingle CTE differs: word_shingles vs list_transform/unnest)
    "q_dedup_recall" -> graft.ops.TextOps.minhashRecallSql(duck = false),

    "q_seq_pack" -> """
      WITH RECURSIVE dv AS (
        SELECT lang, doc_id,
               CAST(size(split(text, ' ')) AS BIGINT) AS tok,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents
      ), st MAX RECURSION LEVEL 1000 AS (
        SELECT lang, rn, doc_id, tok,
               CAST(0 AS BIGINT) AS pack_id, tok AS cur_after
        FROM dv WHERE rn = 1
        UNION ALL
        SELECT d.lang, d.rn, d.doc_id, d.tok,
          CASE WHEN s.cur_after + d.tok > 512 AND s.cur_after > 0
               THEN s.pack_id + 1 ELSE s.pack_id END,
          CASE WHEN s.cur_after + d.tok > 512 AND s.cur_after > 0
               THEN 0 ELSE s.cur_after END + d.tok
        FROM st s JOIN dv d ON d.lang = s.lang AND d.rn = s.rn + 1
      )
      SELECT lang, pack_id, count(*) AS n_docs,
             CAST(sum(tok) AS BIGINT) AS sum_tokens
      FROM st GROUP BY lang, pack_id ORDER BY lang, pack_id""",

    // date_diff('day', a, b) -> datediff(b, a)
    "q_gaps_islands" -> """
      WITH act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      n AS (
        SELECT user_id, day,
               datediff(day, DATE '2024-01-01') AS dn
        FROM act),
      g AS (
        SELECT user_id, day, dn,
               dn - row_number() OVER (PARTITION BY user_id ORDER BY dn)
                 AS grp
        FROM n)
      SELECT user_id, min(day) AS streak_start, max(day) AS streak_end,
             CAST(count(*) AS INT) AS streak_days
      FROM g GROUP BY user_id, grp
      ORDER BY user_id, streak_start""",

    // unnest(range(...)) -> explode(sequence(...)); string_split ->
    // split (regex-escaped); list_slice -> slice; array_to_string ->
    // array_join; DuckDB's float `/` + rounding CAST -> explicit floor
    "q_dedup_passage" -> """
      WITH words AS (
        SELECT doc_id, split(text, ' ') AS ws FROM documents),
      idx AS (
        SELECT doc_id, ws,
          explode(sequence(0, CAST(floor(size(ws)/10) AS INT) - 1)) AS i
        FROM words WHERE size(ws) >= 10),
      chunks AS (
        SELECT doc_id, CAST(i * 10 AS BIGINT) AS pos,
          md5(array_join(slice(ws, i*10 + 1, 10), ' ')) AS passage_hash
        FROM idx)
      SELECT doc_id, pos, passage_hash, n_copies FROM (
        SELECT doc_id, pos, passage_hash,
          count(*) OVER (PARTITION BY passage_hash) AS n_copies,
          row_number() OVER (PARTITION BY passage_hash
                             ORDER BY doc_id, pos) AS rk
        FROM chunks)
      WHERE rk > 1 ORDER BY doc_id, pos""",

    // 1-based toks[j] lateral-unnest pair walk -> explode(zip_with(
    // slice, slice)) adjacent-pair structs (Spark [] is 0-based, and
    // sequence(1, 0) would descend — the slice/zip form is total);
    // string_split -> split with the ][ separator regex-escaped;
    // generated from the same BpeMerges constant as the DSL + oracle.
    "q_bpe_merges" -> bpeTwinSparkSql,

    // unnest(string_split(...)) -> explode(split(...))
    "q_word_entropy" -> """
      WITH toks AS (
        SELECT doc_id, explode(split(text, ' ')) AS word
        FROM documents),
      tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
      h AS (
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl,
               CAST(count(*) AS BIGINT) AS n_types,
               sum(CAST(round(tf * ln(tf), 6) AS DECIMAL(28,6))) AS st
        FROM tf GROUP BY 1)
      SELECT doc_id, dl, n_types,
             round(ln(dl) - CAST(st AS DOUBLE) / dl, 4) AS entropy
      FROM h ORDER BY doc_id""",

    // date_diff 3-arg -> datediff; everything else portable
    "q_rolling_corr" -> """
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS dn,
               count(*) AS x,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DECIMAL(19,0)) AS y
        FROM orders GROUP BY 1, 2),
      sums AS (
        SELECT day,
          count(*) OVER w AS n,
          sum(x) OVER w AS sx,
          sum(y) OVER w AS sy,
          sum(CAST(x AS DECIMAL(10,0)) * y) OVER w AS sxy,
          sum(x * x) OVER w AS sxx,
          sum(y * y) OVER w AS syy
        FROM daily
        WINDOW w AS (ORDER BY dn RANGE BETWEEN 13 PRECEDING AND CURRENT ROW))
      SELECT day, CAST(n AS INT) AS n_days,
        round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
              (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
               sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
                    CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) AS corr14
      FROM sums
      WHERE n >= 8
        AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
            CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
            CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      ORDER BY day""",

    // count(DISTINCT) over a window (no Spark SQL form) ->
    // size(collect_set()) over the same frame; date_diff -> datediff
    "q_window_count_distinct" -> """
      WITH act AS (
        SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
        FROM events),
      n AS (
        SELECT event_type, day, user_id,
               datediff(day, DATE '2024-01-01') AS dn
        FROM act),
      wn AS (
        SELECT event_type, day,
               CAST(size(collect_set(user_id) OVER (
                 PARTITION BY event_type ORDER BY dn
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) AS BIGINT) AS u7
        FROM n)
      SELECT event_type, day, count(*) AS u1, max(u7) AS u7
      FROM wn GROUP BY event_type, day
      ORDER BY event_type, day""",

    // md5-hex-prefix digest -> registered md5_prefix60
    "q_weighted_sample" -> s"""
      WITH k AS (
        SELECT doc_id, lang, n_chars,
          round(ln(CAST(${h60("text")} + 1 AS DOUBLE) /
                   CAST(1152921504606846976 AS DOUBLE)) / n_chars, 10) AS pri
        FROM documents)
      SELECT doc_id, lang, n_chars, pri
      FROM k ORDER BY pri DESC, doc_id LIMIT 25""",

    // unnest(list_transform(range ...)) 5-gram build -> word_shingles(5)
    "q_containment" -> s"""
      WITH g AS (
        SELECT DISTINCT doc_id, ${h60("gs")} AS g FROM (
          SELECT doc_id, explode(word_shingles(text, 5)) AS gs
          FROM documents WHERE size(split(text, ' ')) >= 5)
      ), sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
      rare AS (
        SELECT g.doc_id, g.g FROM g
        JOIN (SELECT g FROM g GROUP BY g HAVING count(*) <= 20) r
          ON g.g = r.g),
      cand AS (
        SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
        FROM rare x JOIN rare y ON x.g = y.g AND x.doc_id < y.doc_id),
      inter AS (
        SELECT c.d1, c.d2, count(*) AS ov
        FROM cand c
        JOIN g g1 ON g1.doc_id = c.d1
        JOIN g g2 ON g2.doc_id = c.d2 AND g2.g = g1.g
        GROUP BY c.d1, c.d2)
      SELECT i.d1, i.d2,
        round(CAST(i.ov AS DOUBLE) / s1.n, 4) AS c12,
        round(CAST(i.ov AS DOUBLE) / s2.n, 4) AS c21
      FROM inter i
      JOIN sizes s1 ON s1.doc_id = i.d1
      JOIN sizes s2 ON s2.doc_id = i.d2
      WHERE greatest(round(CAST(i.ov AS DOUBLE) / s1.n, 4),
                     round(CAST(i.ov AS DOUBLE) / s2.n, 4)) >= 0.6
      ORDER BY i.d1, i.d2""",

    // range table fn -> explode(sequence); md5-prefix -> md5_prefix60;
    // the Poisson CASE text is generated from the same Analytics.PoisCdf
    "q_bootstrap_ci" -> s"""
      WITH h AS (
        SELECT md5_prefix60(CAST(o_orderkey AS STRING)) % 4294967296 AS h32,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      reps AS (
        SELECT h32, cents, b FROM h
        LATERAL VIEW explode(sequence(0, 31)) t AS b),
      uu AS (
        SELECT b, cents,
          CAST((h32 * (b * 2 + 3) + b * 2654435761) % 2147483647 + 1
               AS DOUBLE) / CAST(2147483647 AS DOUBLE) AS u
        FROM reps),
      ww AS (
        SELECT b, cents, ${graft.ops.Analytics.poisCaseSql} AS w FROM uu),
      agg AS (
        SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
               sum(CAST(w * cents AS DECIMAL(19,0))) AS s
        FROM ww GROUP BY b),
      stats AS (
        SELECT CAST(b AS INT) AS b, n_eff,
               round(CAST(s AS DOUBLE) / CAST(n_eff AS DOUBLE), 6)
                 AS mean_price
        FROM agg WHERE n_eff > 0)
      SELECT b, n_eff, mean_price,
             CAST(row_number() OVER (ORDER BY mean_price, b) AS INT) AS rk
      FROM stats ORDER BY b""",

    // nested minhash-pairs CTE + the same wedge-close tail as the oracle
    "q_triangle_count" -> s"""
      WITH pairs AS (
        $minhashPairsSparkSql
      ), tri AS (
        SELECT e1.d1 AS a, e1.d2 AS b, e2.d2 AS c
        FROM pairs e1
        JOIN pairs e2 ON e2.d1 = e1.d2
        JOIN pairs e3 ON e3.d1 = e1.d1 AND e3.d2 = e2.d2
      ), m AS (
        SELECT a AS doc_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      )
      SELECT doc_id, count(*) AS n_triangles
      FROM m GROUP BY doc_id ORDER BY doc_id""",

    // Spark spells IGNORE NULLS after the call parens (DuckDB: inside)
    "q_attribution" -> """
      WITH t AS (
        SELECT event_type, value,
          last(CASE WHEN event_type <> 'purchase' THEN event_type END)
            IGNORE NULLS OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        FROM events)
      SELECT coalesce(touch, 'direct') AS touch_type,
             count(*) AS n_purchases,
             round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4)
               AS total_value
      FROM t WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY touch_type""",

    // string_split->split+explode, strlen->length, md5-prefix -> the
    // registered md5_prefix60 extension function
    "q_feature_hash" -> s"""
      WITH toks AS (
        SELECT lang, doc_id, explode(split(text, ' ')) AS w
        FROM documents)
      SELECT lang, ${h60("w")} % 64 AS bucket,
             count(*) AS n_tokens, count(DISTINCT doc_id) AS n_docs
      FROM toks WHERE length(w) > 0
      GROUP BY 1, 2 ORDER BY lang, bucket""",

    "q_kfold" -> s"""
      WITH f AS (
        SELECT CAST(${h60("CAST(doc_id AS STRING)")} % 5 AS INT) AS fold,
               n_chars, lang
        FROM documents),
      agg AS (
        SELECT fold, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars,
               count(DISTINCT lang) AS n_langs
        FROM f GROUP BY fold)
      SELECT fold, n_docs, n_chars, n_langs,
             round(CAST(n_docs AS DOUBLE) /
                   CAST(sum(n_docs) OVER () AS DOUBLE), 4) AS share
      FROM agg ORDER BY fold""",

    // oracle text verbatim against the harness's plain-name views (the
    // DSL entry reads _lj-suffixed views, so the strings differ only in
    // table names)
    "q_lateral_join" -> """
      SELECT n.n_name, t.c_name, t.c_acctbal
      FROM nation n,
      LATERAL (SELECT c_name, c_acctbal FROM customer c
               WHERE c.c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""",

    // epoch_us() -> unix_micros()
    "q_time_weighted_avg" -> """
      WITH dt AS (
        SELECT user_id, value,
          unix_micros(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id))
            - unix_micros(ts) AS dt
        FROM events)
      SELECT user_id, count(*) AS n_intervals,
        CAST(sum(dt) AS BIGINT) AS span_us,
        round(CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * dt
                            AS DECIMAL(38,2))) AS DOUBLE) /
              CAST(sum(dt) AS DOUBLE), 4) AS twap
      FROM dt WHERE dt IS NOT NULL AND dt > 0
      GROUP BY user_id ORDER BY user_id""",

    // unnest(range) -> explode(sequence); DuckDB 1-based list index
    // w[i] -> element_at(w, i) (also 1-based); string_split -> split
    "q_ngram_lm" -> """
      WITH words AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
      st AS (
        SELECT doc_id, element_at(w, CAST(i AS INT)) AS w1,
               element_at(w, CAST(i AS INT) + 1) AS w2
        FROM (SELECT doc_id, w, explode(sequence(1, size(w) - 1)) AS i
              FROM words WHERE size(w) >= 2)),
      cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bi
             FROM st GROUP BY 1, 2),
      cc AS (SELECT w1, CAST(count(*) AS BIGINT) AS c_ctx
             FROM st GROUP BY 1),
      v AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS vocab
            FROM (SELECT explode(w) AS u FROM words)),
      sc AS (
        SELECT s.doc_id,
          CAST(round(ln((CAST(c_bi AS DOUBLE) + 1.0) /
                        (CAST(c_ctx AS DOUBLE) + CAST(vocab AS DOUBLE))), 6)
               AS DECIMAL(18,6)) AS lp
        FROM st s JOIN cb ON s.w1 = cb.w1 AND s.w2 = cb.w2
                  JOIN cc ON s.w1 = cc.w1, v)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        round(CAST(sum(lp) AS DOUBLE), 6) AS log_prob,
        round(exp(-CAST(sum(lp) AS DOUBLE) / count(*)), 4) AS ppl
      FROM sc GROUP BY doc_id ORDER BY doc_id""",

    // epoch_us -> unix_micros (the q_time_weighted_avg rewrite)
    "q_survival_km" -> """
      WITH u AS (
        SELECT user_id,
          min(ts) AS first_ts,
          min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_p,
          max(ts) AS last_ts
        FROM events GROUP BY user_id),
      lab AS (
        SELECT CAST(floor((unix_micros(coalesce(first_p, last_ts)) - unix_micros(first_ts)) / 3600000000.0) AS INT) AS t,
               CASE WHEN first_p IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM u),
      g AS (
        SELECT t, CAST(sum(ev) AS BIGINT) AS d,
               CAST(count(*) - sum(ev) AS BIGINT) AS c
        FROM lab GROUP BY t),
      sw AS (
        SELECT t, d, c,
          CAST(sum(d + c) OVER () AS BIGINT)
            - CAST(coalesce(sum(d + c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        FROM g),
      s AS (
        SELECT t, d, c, n_risk,
          sum(CAST(round(ln(CASE WHEN d < n_risk THEN 1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) ELSE 1.0 END), 6) AS DECIMAL(18,6)))
            OVER (ORDER BY t) AS lnsum,
          max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t) AS dead
        FROM sw)
      SELECT t AS t_hours, n_risk, d AS n_events, c AS n_censored,
        CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(CAST(lnsum AS DOUBLE)), 4) END AS survival
      FROM s ORDER BY t_hours""",

    // unnest(range(0,21)) -> explode(sequence(0,20))
    "q_hierarchy_rollup" -> """
      WITH j AS (SELECT explode(sequence(0, 20)) AS j),
      cl AS (
        SELECT CAST(floor(c.c_custkey / power(2, j.j)) AS BIGINT) AS node,
               j.j AS lvl, c.c_acctbal
        FROM customer c, j
        WHERE floor(c.c_custkey / power(2, j.j)) >= 1)
      SELECT node, CAST(count(*) AS BIGINT) AS n_desc,
             CAST(max(lvl) AS BIGINT) AS deepest,
             round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 4) AS subtree_bal
      FROM cl GROUP BY node ORDER BY node""",

    // DuckDB date-int subtraction (wk - cohort) -> datediff(wk, cohort)
    "q_cohort_ltv" -> """
      WITH ev AS (
        SELECT user_id, ts, event_type, value,
          CAST(date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS DATE) AS cohort
        FROM events),
      sizes AS (
        SELECT cohort, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM ev GROUP BY cohort),
      pur AS (
        SELECT cohort,
          CAST(floor(datediff(CAST(date_trunc('week', ts) AS DATE), cohort) / 7.0) AS INT) AS w_offset,
          user_id, CAST(value AS DECIMAL(18,2)) AS v
        FROM ev WHERE event_type = 'purchase'),
      agg AS (
        SELECT cohort, w_offset,
          CAST(count(DISTINCT user_id) AS BIGINT) AS n_buyers,
          sum(v) AS rev
        FROM pur GROUP BY cohort, w_offset)
      SELECT a.cohort, a.w_offset, s.n_users, a.n_buyers,
        round(CAST(a.rev AS DOUBLE), 4) AS rev,
        round(CAST(a.rev AS DOUBLE) / CAST(s.n_users AS DOUBLE), 4) AS ltv
      FROM agg a JOIN sizes s ON a.cohort = s.cohort
      ORDER BY a.cohort, a.w_offset""",

    // unnest(range(1,8)) -> explode(sequence(1,7)); DuckDB date-int
    // subtraction (day - CAST(lag AS INT)) -> date_sub(day, lag)
    "q_autocorr" -> """
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS r
        FROM orders GROUP BY 1),
      lags AS (SELECT explode(sequence(1, 7)) AS lag_days),
      pairs AS (
        SELECT l.lag_days, a.r AS x, b.r AS y
        FROM daily a JOIN lags l ON true
        JOIN daily b ON b.day = date_sub(a.day, l.lag_days)),
      m AS (
        SELECT lag_days, CAST(count(*) AS BIGINT) AS n,
          sum(x) AS sx, sum(y) AS sy,
          sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
        FROM pairs GROUP BY lag_days)
      SELECT lag_days, n,
        round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
              (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
               sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
          AS autocorr
      FROM m ORDER BY lag_days""",

    // the oracle generator re-run with duck=false: $1/$2 group refs and
    // implicit all-occurrences regexp_replace instead of \1/\2 + 'g' —
    // this is the ONLY consumer of urlCanonSql's Spark branch, so the
    // twin doubles as its liveness pin (r12 ADVICE item 1)
    "q_dedup_url" -> graft.ops.PipelineOps.dedupUrlSql(duck = false),

    // same PipelineOps.annRecallSql source as the DuckDB oracle (only the
    // dot-product idiom and the array cast differ)
    "q_ann_recall" -> graft.ops.PipelineOps.annRecallSql(duck = false),

    // oracle's chr(n) synthesis -> \uXXXX string escapes; nfc_normalize
    // is the engine's own registered extension expression here
    "q_text_normalize" -> raw"""
      WITH deco AS (
        SELECT lang,
          CASE WHEN doc_id % 4 = 0 THEN concat(text, ' café')
               WHEN doc_id % 4 = 1 THEN concat('', text, '  x')
               WHEN doc_id % 4 = 2 THEN concat('a b ', text)
               ELSE text END AS raw
        FROM documents),
      c AS (
        SELECT lang, raw,
          trim(regexp_replace(regexp_replace(nfc_normalize(raw),
            '[\\p{Cntrl}]', ' '), '[\\s\\u00A0]+', ' ')) AS clean
        FROM deco)
      SELECT lang, count(*) AS n_docs,
        CAST(sum(length(raw)) AS BIGINT) AS chars_raw,
        CAST(sum(length(clean)) AS BIGINT) AS chars_clean,
        CAST(sum(CASE WHEN raw <> clean THEN 1 ELSE 0 END) AS BIGINT)
          AS n_changed
      FROM c GROUP BY lang ORDER BY lang""",

    // range-table 1-based list index -> posexplode; generated from the
    // same MiningOps.kmeansSql source as the DuckDB oracle (only the
    // dim-explosion CTE differs — the two unrolled Lloyd rounds are
    // byte-identical by construction)
    "q_kmeans" -> graft.ops.MiningOps.kmeansSql(duck = false),

    // unnest(string_split) -> explode(split); generated from the same
    // MiningOps.ngramCoverageSql source as the oracle
    "q_ngram_coverage" -> graft.ops.MiningOps.ngramCoverageSql(duck = false),

    // DuckDB hex-prefix digest cast -> the registered md5_prefix60
    // extension function; generated from the same
    // MiningOps.negativeSampleSql source as the oracle
    "q_negative_sample" -> graft.ops.MiningOps.negativeSampleSql(duck = false),

    // DuckDB date+int / date-date arithmetic -> Spark date_add/datediff;
    // generated from the same MiningOps.intervalUnionSql source
    "q_interval_union" -> graft.ops.MiningOps.intervalUnionSql(duck = false),

    // DuckDB date+int arithmetic -> Spark date_add; generated from the
    // same MiningOps.forecastNaiveSql source as the oracle
    "q_forecast_naive" -> graft.ops.MiningOps.forecastNaiveSql(duck = false),

    // DuckDB datediff('day', start, end) -> Spark datediff(end, start)
    "q_seasonality" -> """
      WITH dayrev AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
               sum(CAST(value AS DECIMAL(28,10))) AS rev
        FROM events GROUP BY 1),
      bydow AS (
        SELECT datediff(day, DATE '1970-01-01') % 7 AS dow,
               count(*) AS n_days,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               sum(rev) AS revd
        FROM dayrev GROUP BY 1)
      SELECT CAST(dow AS INT) AS dow, n_days, n_events,
        round(CAST(revd AS DOUBLE), 4) AS revenue,
        round(CAST(revd AS DOUBLE) / CAST(n_days AS DOUBLE), 4) AS avg_day_rev,
        round((CAST(revd AS DOUBLE) / CAST(n_days AS DOUBLE)) /
              (CAST(sum(revd) OVER () AS DOUBLE) /
               CAST(sum(n_days) OVER () AS DOUBLE)), 6) AS seasonal_index
      FROM bydow ORDER BY dow""",

    // range-table 1-based list index -> posexplode (0-based)
    "q_embed_centroid" -> """
      WITH ex AS (
        SELECT label, pos, CAST(v AS DOUBLE) AS v
        FROM embeddings
        LATERAL VIEW posexplode(embedding) t AS pos, v
        WHERE pos < 8)
      SELECT label, pos, count(*) AS n,
        round(CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE) /
              CAST(count(*) AS DOUBLE), 4) AS centroid,
        round(min(v), 4) AS vmin,
        round(max(v), 4) AS vmax
      FROM ex GROUP BY label, pos ORDER BY label, pos""",
  )
}
