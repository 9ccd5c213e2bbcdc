package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the product-analytics/ranking pack (ops/Analytics.scala)
  * that the DuckDB hash-match can't express, plus the plan shapes that ARE
  * the 100 TB cost model (stats broadcast, no cartesian fan-out).
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(key: String) =
    SparkEntry.queries(key)(spark, TestSpark.Sf0001).collect()

  test("q_funnel steps are monotonically non-increasing") {
    val rows = run("q_funnel").sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_signup", "2_view", "3_purchase"))
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts(0) >= counts(1) && counts(1) >= counts(2),
      s"funnel widened downstream: $counts")
  }

  test("q_retention day_offset 0 row exists per cohort and no negative offsets") {
    val rows = run("q_retention")
    val byCohort = rows.groupBy(_.getDate(0))
    byCohort.foreach { case (day, rs) =>
      assert(rs.exists(_.getInt(1) == 0), s"cohort $day missing offset-0 row")
      assert(rs.forall(_.getInt(1) >= 0), s"cohort $day has a negative offset")
    }
    // offset-0 users per cohort = cohort size = max users at any offset
    byCohort.foreach { case (day, rs) =>
      val d0 = rs.find(_.getInt(1) == 0).get.getLong(2)
      assert(rs.forall(_.getLong(2) <= d0),
        s"cohort $day retains more users than it started with")
    }
  }

  // AQE's toString prints the final plan AND the initial plan — count
  // scans in the final section only
  private def finalScans(key: String): Int = {
    val df = SparkEntry.queries(key)(spark, TestSpark.Sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    "FileScan parquet".r.findAllIn(plan).size
  }

  test("q_retention scans the events table exactly once (window cohort, no self-join)") {
    // The join formulation read the fact table twice: Catalyst removes the
    // redundant distinct under the cohort-side min, which breaks exchange-
    // subtree equality and ReuseExchange. The window form can't regress to
    // that without this failing.
    assert(finalScans("q_retention") == 1)
  }

  test("scan-count budget: each key tokenizes/aggregates its fact table the minimum number of times") {
    // Pinned floors (measured): unigram_lm and interpolate derive every
    // corpus statistic from one scanned lineage; funnel is one pass;
    // tfidf = tokenize scan + a metadata-only doc count (reads no text
    // bytes); bm25/zscore = stats pass + fact pass (the broadcast-stats
    // floor without persist). A regression to per-statistic branches
    // (each re-scanning the raw table) fails here.
    // eval_contamination = train gram pass + eval gram pass (pushed %20
    // filters make the two scans partial — ~1 full table in bytes); a
    // regression to a separate hits branch re-scanning train fails here.
    // repetition_score is one bigram pass.
    // r11 additions: event_transitions / gaps_islands are one lead/
    // distinct pass; rfm collapses orders once before its windows;
    // word_entropy tokenizes once; anomaly_mad's exact two-median chain
    // is inherently med-then-MAD = two stats passes + the flag pass.
    val budget = Map("q_unigram_lm" -> 1, "q_interpolate" -> 1,
                     "q_funnel" -> 1, "q_tfidf" -> 2, "q_bm25" -> 2,
                     "q_anomaly_zscore" -> 2, "q_quality_score" -> 2,
                     "q_eval_contamination" -> 2, "q_repetition_score" -> 1,
                     "q_event_transitions" -> 1, "q_rfm" -> 1,
                     "q_gaps_islands" -> 1, "q_word_entropy" -> 1,
                     "q_anomaly_mad" -> 3)
    for ((k, n) <- budget) {
      val got = finalScans(k)
      assert(got <= n, s"$k scans its input $got times (budget $n)")
    }
  }

  test("q_pmi_bigrams tokenizes the corpus exactly once (single mixed-unit lineage)") {
    // The unigram and bigram vocabularies come out of ONE exploded
    // concat + ONE hash agg, lazily checkpointed; every consumer (bigram
    // slice, both unigram joins, the totals broadcast) reads the
    // materialized counts. The consuming plan therefore holds ZERO file
    // scans — all text bytes are read inside the checkpoint's one-time
    // materialization — and the checkpointed RDD is what every branch
    // scans. A regression to per-vocabulary tokenize branches would put
    // FileScans back in the final plan and fail here.
    val df = SparkEntry.queries("q_pmi_bigrams")(spark, TestSpark.Sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("FileScan parquet".r.findAllIn(plan).isEmpty,
      s"expected zero file scans in the consuming plan:\n$plan")
    assert(plan.contains("ExistingRDD"),
      "expected the checkpointed counts RDD as the only source")
  }

  test("sessionize window chain matches a reference per-user scan on random inputs (12 seeds)") {
    // Random gap shapes cover what the fixture can't promise: exact-
    // threshold gaps (boundary is STRICTLY greater-than), ties broken by
    // event_id, single-event users, and long alternating runs.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(300 + seed)
      val gapLimit = 1 + rnd.nextInt(50)
      val users = 1 + rnd.nextInt(5)
      val evs = (0 until (5 + rnd.nextInt(60))).map { i =>
        (i.toLong, (1 + rnd.nextInt(users)).toLong,
         rnd.nextInt(300).toLong, 1.0)
      }
      val expected = evs.groupBy(_._2).flatMap { case (u, es) =>
        var prev = Long.MinValue; var sess = 0L
        es.sortBy(e => (e._3, e._1)).map { case (id, _, sec, _) =>
          if (prev == Long.MinValue || sec - prev > gapLimit) sess += 1
          prev = sec
          (u, sess, id)
        }
      }.groupBy(e => (e._1, e._2)).map { case ((u, sess), members) =>
        (u, sess, members.size.toLong)
      }.toSet
      val got = graft.ops.Analytics.sessionize(
          evs.toDF("event_id", "user_id", "sec", "value"), gapLimit.toLong)
        .select(col("user_id"), col("sess_id"), col("n_events"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"seed $seed gapLimit=$gapLimit")
    }
  }

  test("q_anomaly_zscore flags only |z| > 2.5 and broadcasts the stats side") {
    val df = SparkEntry.queries("q_anomaly_zscore")(spark, TestSpark.Sf0001)
    val rows = df.collect()
    assert(rows.forall(r => math.abs(r.getDouble(3)) > 2.5))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "per-type stats frame must broadcast — the fact side may not shuffle")
  }

  test("q_histogram bins partition the table exactly") {
    val rows = run("q_histogram")
    val total = rows.map(_.getLong(2)).sum
    val n = Tables.lineitem(spark, TestSpark.Sf0001).count()
    assert(total == n, s"histogram dropped/duplicated rows: $total != $n")
    rows.foreach { r =>
      val bin = r.getInt(0); val lo = r.getLong(1).toDouble
      assert(r.getDouble(3) >= lo || bin == 0,
        s"bin $bin min ${r.getDouble(3)} below its lower edge $lo")
      assert(bin < 9 || r.getDouble(4) >= lo,
        "overflow bin should clamp, not wrap")
    }
  }

  test("q_tfidf emits at most 3 ranked terms per doc, rank contiguous from 1") {
    val rows = run("q_tfidf")
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val rns = rs.map(_.getInt(1)).sorted.toSeq
      assert(rns == (1 to rns.size), s"doc $doc ranks not contiguous: $rns")
      assert(rns.size <= 3)
    }
  }

  test("q_bm25 scores every doc containing the term, ordered by score") {
    val rows = run("q_bm25")
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(1) > 0), "a zero-tf doc leaked into the ranking")
    val scores = rows.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse, "not ordered by descending score")
  }

  test("q_funnel plans two-phase aggregation and no per-user event lists") {
    val df = SparkEntry.queries("q_funnel")(spark, TestSpark.Sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial"),
      "funnel's per-user conditional mins lost map-side combine")
    assert(!plan.contains("CollectList") && !plan.contains("collect_list"),
      "funnel materialized per-user event lists — the anti-pattern")
  }

  test("q_histogram and q_table_checksum aggregate two-phase (map-side combine)") {
    for (k <- Seq("q_histogram", "q_table_checksum")) {
      val df = SparkEntry.queries(k)(spark, TestSpark.Sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("HashAggregate") && plan.toLowerCase.contains("partial"),
        s"$k lost partial aggregation:\n$plan")
    }
  }

  test("q_zorder tiles confine BOTH dimensions to 64-wide bands (the skipping invariant)") {
    // A 4096-wide z-range fixes the top 2 bits of each 8-bit dimension, so
    // min/max stats on either column prune a tile — the property that makes
    // z-order layout worth the write cost.
    val rows = run("q_zorder")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tile = r.getInt(0)
      assert(r.getLong(3) - r.getLong(2) <= 63,
        s"tile $tile x-envelope wider than a 64 band")
      assert(r.getLong(5) - r.getLong(4) <= 63,
        s"tile $tile y-envelope wider than a 64 band")
    }
  }

  test("ranking keys plan no cartesian product (corpus-scalar joins stay broadcast)") {
    for (k <- Seq("q_tfidf", "q_bm25", "q_anomaly_mad")) {
      val df = SparkEntry.queries(k)(spark, TestSpark.Sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$k: 1-row corpus-stat join degenerated to a cartesian product")
    }
  }

  test("q_event_transitions probabilities are a distribution per source type") {
    val rows = run("q_event_transitions")
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) > 0 && r.getDouble(3) > 0
      && r.getDouble(3) <= 1.0, s"bad transition row $r"))
    // per-cur probabilities sum to 1 up to the per-row 1e-4 rounding
    rows.groupBy(_.getString(0)).foreach { case (cur, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) <= rs.size * 1e-4 + 1e-9,
        s"p(next|$cur) sums to $s over ${rs.size} rows")
    }
  }

  test("q_rfm quartiles are balanced and segment rules hold") {
    val rows = run("q_rfm")
    assert(rows.nonEmpty)
    val n = rows.size
    for (c <- Seq(4, 5, 6)) { // r_score, f_score, m_score
      val sizes = rows.groupBy(_.getInt(c)).view.mapValues(_.size).toMap
      assert(sizes.keySet == Set(1, 2, 3, 4), s"col $c buckets: $sizes")
      // ntile: bucket sizes differ by at most 1
      assert(sizes.values.max - sizes.values.min <= 1,
        s"col $c unbalanced: $sizes (n=$n)")
    }
    rows.foreach { r =>
      val (rs, fs, seg) = (r.getInt(4), r.getInt(5), r.getString(7))
      val expected =
        if (rs == 1 && fs == 1) "champion"
        else if (rs <= 2 && fs <= 2) "loyal"
        else if (rs >= 3 && fs <= 2) "at_risk"
        else "other"
      assert(seg == expected, s"segment rule broken: $r")
    }
  }

  test("q_anomaly_mad flags exactly the > 3 robust-sigma rows, with positive MAD") {
    val rows = run("q_anomaly_mad")
    rows.foreach { r =>
      val (v, med, mad, score) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mad > 0, s"zero-MAD group leaked: $r")
      assert(math.abs(score) > 3.0, s"under-threshold row flagged: $r")
      // score is the rounded robust z — recompute within rounding tolerance
      assert(math.abs(score - (v - med) / (1.4826 * mad)) <= 5e-5 + 1e-12,
        s"score not consistent with med/mad: $r")
    }
  }

  test("q_gaps_islands streaks are maximal, disjoint, and length-consistent") {
    val rows = run("q_gaps_islands")
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getDate(1).toLocalDate.toEpochDay).toSeq
      sorted.foreach { r =>
        val span = r.getDate(2).toLocalDate.toEpochDay -
          r.getDate(1).toLocalDate.toEpochDay
        assert(span + 1 == r.getInt(3).toLong,
          s"user $u streak length != day span: $r")
      }
      // maximality: consecutive islands are separated by a gap >= 2 days
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          val gap = b.getDate(1).toLocalDate.toEpochDay -
            a.getDate(2).toLocalDate.toEpochDay
          assert(gap >= 2, s"user $u islands $a / $b should have merged")
        case _ =>
      }
    }
  }
}
