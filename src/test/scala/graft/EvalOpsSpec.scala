package graft

import java.time.{DayOfWeek, Instant, LocalDate, ZoneOffset}
import java.time.temporal.TemporalAdjusters

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-13 model-eval / drift / reporting pack. Cross-engine
  * VALUES are pinned by the DuckDB oracle gate; these cases pin the
  * algorithms against independent local recomputation (sequential KM life
  * table, tie-aware average ranks, ancestor-walk rollup, ntile bucket
  * arithmetic) plus the structural invariants each statistic must satisfy
  * (monotone survival, capture reaching 1.0, shares summing to 1).
  */
class EvalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(key: String) =
    SparkEntry.queries(key)(spark, TestSpark.Sf0001)

  private def epochMicros(ts: java.sql.Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000L

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val events: Seq[(Long, java.sql.Timestamp, Long, String, Double)] =
    Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq

  private lazy val orders: Seq[(java.sql.Timestamp, Double)] =
    Tables.orders(spark, TestSpark.Sf0001)
      .select(col("o_orderdate"), col("o_totalprice"))
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1))).toSeq

  // ---- q_calibration -----------------------------------------------------

  test("q_calibration == local logistic binning; bins partition the stream") {
    val local = events
      .map { case (_, _, _, et, v) =>
        val p = 1.0 / (1.0 + math.exp(-(v - 50.0) / 10.0))
        val bin = math.min(math.floor(p * 10).toInt, 9)
        (bin, p, if (et == "purchase") 1L else 0L)
      }
      .groupBy(_._1).view.mapValues { g =>
        (g.size.toLong, g.map(_._3).sum,
          r4(g.map(t => BigDecimal(t._2).setScale(10,
            BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / g.size))
      }.toMap
    val got = run("q_calibration").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == local)
    assert(got.values.map(_._1).sum == events.size.toLong,
      "bins must partition every event exactly once")
  }

  // ---- q_psi -------------------------------------------------------------

  test("q_psi == local fixed-width binning + smoothed divergence") {
    val lo = events.map(_._5).min
    val hi = events.map(_._5).max
    val binned = events.map { case (id, _, _, _, v) =>
      val b = math.max(math.min(math.floor((v - lo) / (hi - lo) * 10).toInt, 9), 0)
      (b, id % 2)
    }
    val counts = binned.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2 == 0L).toLong, g.count(_._2 != 0L).toLong)
    }.toMap
    val ne = counts.values.map(_._1).sum.toDouble
    val na = counts.values.map(_._2).sum.toDouble
    val rows = run("q_psi").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.map(r => r._1 -> (r._2, r._3)).toMap == counts)
    val localTerms = counts.toSeq.sortBy(_._1).map { case (_, (e, a)) =>
      val pe = (e + 0.5) / (ne + 5.0)
      val pa = (a + 0.5) / (na + 5.0)
      BigDecimal((pe - pa) * math.log(pe / pa))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val localTotal = BigDecimal(localTerms.sum.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach(r => assert(math.abs(r._5 - localTotal) < 1e-9,
      s"psi_total ${r._5} != local $localTotal"))
    assert(rows.map(_._2).sum + rows.map(_._3).sum == events.size.toLong)
  }

  // ---- q_spearman --------------------------------------------------------

  test("q_spearman == tie-aware average ranks + local Pearson") {
    val daily = orders.groupBy(t =>
        Instant.ofEpochMilli(t._1.getTime).atZone(ZoneOffset.UTC).toLocalDate)
      .toSeq.map { case (_, g) =>
        (g.size.toLong, g.map(o => BigDecimal(o._2).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)).sum)
      }
    // 2x-scaled average rank: 2*rank + ties - 1, rank = 1 + #strictly-less
    def ranks2x[T: Ordering](xs: Seq[T]): Seq[Long] = {
      val ord = implicitly[Ordering[T]]
      xs.map { x =>
        val less = xs.count(y => ord.lt(y, x))
        val ties = xs.count(y => ord.equiv(y, x))
        2L * (less + 1) + ties - 1
      }
    }
    val rx = ranks2x(daily.map(_._1))
    val ry = ranks2x(daily.map(_._2))
    val n = daily.size.toDouble
    val sx = rx.sum.toDouble; val sy = ry.sum.toDouble
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum.toDouble
    val sxx = rx.map(a => a * a).sum.toDouble
    val syy = ry.map(a => a * a).sum.toDouble
    val local = r4((n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
    val row = run("q_spearman").collect().head
    assert(row.getLong(0) == daily.size.toLong)
    assert(math.abs(row.getDouble(1) - local) < 2e-4,
      s"rho ${row.getDouble(1)} != local $local")
    assert(row.getDouble(1) >= -1.0 && row.getDouble(1) <= 1.0)
  }

  // ---- q_benford ---------------------------------------------------------

  test("q_benford == local first-digit-of-cents counts; shares sum to 1") {
    val local = orders
      .map { case (_, p) =>
        (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100)
          .toLongExact.toString.head.asDigit
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = run("q_benford").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(r => r._1 -> r._2).toMap == local)
    assert(rows.forall(r => r._1 >= 1 && r._1 <= 9))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-2,
      "rounded shares must sum to ~1")
  }

  // ---- q_lift_curve ------------------------------------------------------

  test("q_lift_curve == local desc-score sweep; capture monotone to 1.0") {
    val perScore = events.groupBy(_._5).view.mapValues { g =>
      (g.size.toLong, g.count(_._4 == "purchase").toLong)
    }.toSeq.sortBy(-_._1)
    val nAll = perScore.map(_._2._1).sum
    val pAll = perScore.map(_._2._2).sum
    var cum = 0L
    val local = scala.collection.mutable.Map[Int, (Long, Long)]()
    perScore.foreach { case (_, (tot, pos)) =>
      cum += tot
      val dec = math.min(cum * 10 / nAll, 9L).toInt
      val (t0, p0) = local.getOrElse(dec, (0L, 0L))
      local(dec) = (t0 + tot, p0 + pos)
    }
    val rows = run("q_lift_curve").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(r => r._1 -> (r._2, r._3)).toMap == local.toMap)
    val captures = rows.sortBy(_._1).map(_._4)
    assert(captures.zip(captures.tail).forall { case (a, b) => a <= b },
      "capture must be nondecreasing")
    assert(math.abs(captures.last - 1.0) < 1e-9,
      "the last decile captures every positive")
    assert(rows.map(_._2).sum == nAll && rows.map(_._3).sum == pAll)
  }

  // ---- q_survival_km -----------------------------------------------------

  test("q_survival_km == sequential KM life table") {
    val perUser = events.groupBy(_._3).toSeq.map { case (_, g) =>
      val firstTs = g.map(t => epochMicros(t._2)).min
      val lastTs = g.map(t => epochMicros(t._2)).max
      val firstP = g.filter(_._4 == "purchase").map(t => epochMicros(t._2))
        .sorted.headOption
      val t = math.floor((firstP.getOrElse(lastTs) - firstTs) / 3600000000.0).toInt
      (t, firstP.isDefined)
    }
    val table = perUser.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2).toLong, g.count(!_._2).toLong)
    }.toSeq.sortBy(_._1)
    val total = perUser.size.toLong
    var atRisk = total
    var s = 1.0
    var dead = false
    val localRows = table.map { case (t, (d, c)) =>
      val row = (t, atRisk, d, c)
      if (d == atRisk) dead = true
      if (!dead) s *= 1.0 - d.toDouble / atRisk
      val surv = if (dead) 0.0 else s
      atRisk -= d + c
      (row, surv)
    }
    val got = run("q_survival_km").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.map(g => (g._1, g._2, g._3, g._4)).toSeq ==
      localRows.map(_._1))
    got.zip(localRows).foreach { case (g, (_, sLocal)) =>
      assert(math.abs(g._5 - sLocal) < 2e-3,
        s"t=${g._1}: survival ${g._5} != local $sLocal")
    }
    // survival is nonincreasing and starts <= 1
    val survs = got.map(_._5)
    assert(survs.zip(survs.tail).forall { case (a, b) => b <= a + 1e-9 })
    assert(survs.head <= 1.0 + 1e-9)
  }

  // ---- q_yoy_growth ------------------------------------------------------

  test("q_yoy_growth == local month ledger with lag-1/lag-12 growth") {
    val monthly = orders.groupBy { case (ts, _) =>
      Instant.ofEpochMilli(ts.getTime).atZone(ZoneOffset.UTC).toLocalDate
        .withDayOfMonth(1)
    }.view.mapValues(g => (g.size.toLong,
      g.map(o => BigDecimal(o._2).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum)).toSeq.sortBy(_._1)
    val got = run("q_yoy_growth").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_ => r.getDouble(3)),
        Option(r.get(4)).map(_ => r.getDouble(4))))
    assert(got.map(_._1).toSeq == monthly.map(_._1))
    got.zip(monthly).zipWithIndex.foreach { case ((g, (_, (n, rev))), i) =>
      assert(g._2 == n && g._3 == r4(rev.toDouble))
      if (i == 0) assert(g._4.isEmpty, "first month has no MoM")
      else {
        val prev = monthly(i - 1)._2._2.toDouble
        assert(math.abs(g._4.get - r4((rev.toDouble - prev) / prev)) < 1e-9)
      }
      if (i < 12) assert(g._5.isEmpty, s"month $i cannot have YoY")
      else {
        val prev = monthly(i - 12)._2._2.toDouble
        assert(math.abs(g._5.get - r4((rev.toDouble - prev) / prev)) < 1e-9)
      }
    }
  }

  // ---- q_hierarchy_rollup ------------------------------------------------

  test("q_hierarchy_rollup == local ancestor-walk accumulation") {
    val custs = Tables.customer(spark, TestSpark.Sf0001)
      .select(col("c_custkey").cast("long"), col("c_acctbal"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val acc = scala.collection.mutable.Map[Long, (Long, Long, BigDecimal)]()
    custs.foreach { case (k, bal) =>
      val b = BigDecimal(bal).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      var node = k
      var lvl = 0L
      while (node >= 1 && lvl <= 20) {
        val (n0, l0, s0) = acc.getOrElse(node, (0L, 0L, BigDecimal(0)))
        acc(node) = (n0 + 1, math.max(l0, lvl), s0 + b)
        node = node / 2
        lvl += 1
      }
    }
    val got = run("q_hierarchy_rollup").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == acc.view.mapValues(v => (v._1, v._2, r4(v._3.toDouble)))
      .toMap)
    // root aggregates every IN-TREE key (custkey 0 has no binary-encoded
    // ancestors — the fixture is 0-based); every leaf's subtree is itself
    assert(got(1L)._1 == custs.count(_._1 >= 1).toLong)
    val keys = custs.map(_._1).toSet
    custs.filter { case (k, _) => k >= 1 && !keys.contains(2 * k) &&
      !keys.contains(2 * k + 1) }
      .foreach { case (k, bal) =>
        assert(got(k) == ((1L, 0L,
          r4(BigDecimal(bal).setScale(2,
            BigDecimal.RoundingMode.HALF_UP).toDouble))))
      }
  }

  // ---- q_ntile_bins ------------------------------------------------------

  test("q_ntile_bins == ntile bucket arithmetic over the sorted day grain") {
    val daily = orders.groupBy(t =>
        Instant.ofEpochMilli(t._1.getTime).atZone(ZoneOffset.UTC).toLocalDate)
      .map { case (day, g) =>
        (day, g.map(o => BigDecimal(o._2).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)).sum)
      }.toSeq.sortBy(t => (t._2, t._1.toString))
    val n = daily.size
    val base = n / 10; val rem = n % 10
    val sizes = (1 to 10).map(b => if (b <= rem) base + 1 else base)
    val got = run("q_ntile_bins").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == (1 to 10))
    assert(got.map(_._2).toSeq == sizes.map(_.toLong))
    // bin boundaries follow the sorted revenue sequence
    var off = 0
    got.zip(sizes).foreach { case ((_, _, lo, hi), sz) =>
      assert(lo == r4(daily(off)._2.toDouble))
      assert(hi == r4(daily(off + sz - 1)._2.toDouble))
      off += sz
    }
  }

  // ---- q_target_encode ---------------------------------------------------

  test("q_target_encode == local smoothed category means; encodings shrink " +
       "toward the prior") {
    val rows = Tables.orders(spark, TestSpark.Sf0001)
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val local = rows.groupBy(_._1).view.mapValues { g =>
      (g.size.toLong, g.count(_._2 == "F").toLong)
    }.toMap
    val prior = local.values.map(_._2).sum.toDouble /
      local.values.map(_._1).sum
    val got = run("q_target_encode").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.map(g => g._1 -> (g._2, g._3)).toMap == local)
    got.foreach { case (cat, n, pos, p, enc) =>
      assert(math.abs(p - prior) < 1e-6)
      val expected = (pos + 10.0 * prior) / (n + 10.0)
      assert(math.abs(enc - expected) < 1e-6, s"$cat: $enc != $expected")
      val raw = pos.toDouble / n
      // shrinkage: enc lies strictly between the raw rate and the prior
      assert((enc - raw) * (prior - raw) >= 0 &&
        math.abs(enc - prior) <= math.abs(raw - prior) + 1e-9)
    }
  }

  // ---- q_woe_iv ----------------------------------------------------------

  test("q_woe_iv == local binned WoE; IV is the sum of per-bin terms") {
    val rows = Tables.orders(spark, TestSpark.Sf0001)
      .select(col("o_totalprice"), col("o_orderstatus"))
      .collect().map(r => (r.getDouble(0), r.getString(1) == "F"))
    val lo = rows.map(_._1).min; val hi = rows.map(_._1).max
    val local = rows.groupBy { case (v, _) =>
      math.max(math.min(math.floor((v - lo) / (hi - lo) * 10).toInt, 9), 0)
    }.view.mapValues(g => (g.count(_._2).toLong, g.count(!_._2).toLong))
      .toMap
    val totG = local.values.map(_._1).sum.toDouble
    val totB = local.values.map(_._2).sum.toDouble
    val got = run("q_woe_iv").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.map(g => g._1 -> (g._2, g._3)).toMap == local)
    val ivLocal = BigDecimal(local.toSeq.sortBy(_._1).map { case (_, (g, b)) =>
      val pg = (g + 0.5) / (totG + 5.0); val pb = (b + 0.5) / (totB + 5.0)
      BigDecimal((pg - pb) * math.log(pg / pb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (bin, g, b, woe, iv) =>
      val pg = (g + 0.5) / (totG + 5.0); val pb = (b + 0.5) / (totB + 5.0)
      assert(math.abs(woe - BigDecimal(math.log(pg / pb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"bin $bin woe")
      assert(math.abs(iv - ivLocal) < 1e-9, s"iv $iv != $ivLocal")
    }
  }

  // ---- q_ranking_metrics -------------------------------------------------

  test("q_ranking_metrics == local per-user MRR/NDCG@10 panel averages") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val idcg = graft.ops.EvalOps.IdcgCum.toMap
    val perUser = events.groupBy(_._3).toSeq.map { case (_, g) =>
      val ranked = g.sortBy(e => (-e._5, e._1)).zipWithIndex
        .map { case (e, i) => (e._4 == "purchase", i + 1) }
      val nRel = ranked.count(_._1)
      val rr = ranked.find(_._1).map(t => r6(1.0 / t._2)).getOrElse(0.0)
      val dcg = ranked.filter(t => t._1 && t._2 <= 10)
        .map(t => BigDecimal(r6(1.0 / (math.log(t._2 + 1.0) / math.log(2.0)))))
        .sum
      val ndcg = if (nRel > 0)
        r6(dcg.toDouble / idcg(math.min(nRel, 10))) else 0.0
      (rr, ndcg)
    }
    val n = perUser.size
    val mrr = r4(perUser.map(t => BigDecimal(t._1)).sum.toDouble / n)
    val ndcg = r4(perUser.map(t => BigDecimal(t._2)).sum.toDouble / n)
    val row = run("q_ranking_metrics").collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - mrr) < 1e-9,
      s"mrr ${row.getDouble(1)} != $mrr")
    assert(math.abs(row.getDouble(2) - ndcg) < 1e-9,
      s"ndcg ${row.getDouble(2)} != $ndcg")
    assert(row.getDouble(1) >= 0 && row.getDouble(1) <= 1 &&
      row.getDouble(2) >= 0 && row.getDouble(2) <= 1)
  }

  // ---- q_ngram_lm --------------------------------------------------------

  test("q_ngram_lm == local add-1 bigram LM; perplexity positive") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val vocab = docs.flatMap(_._2).distinct.size
    val st = docs.flatMap { case (id, w) =>
      if (w.size >= 2) w.zip(w.tail).map(p => (id, p._1, p._2)) else Seq.empty
    }
    val cBi = st.groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
    val cCtx = st.groupBy(_._2).view.mapValues(_.size).toMap
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val local = st.groupBy(_._1).view.mapValues { g =>
      val lp = g.map(t => r6(math.log((cBi((t._2, t._3)) + 1.0) /
        (cCtx(t._2).toDouble + vocab)))).sum
      (g.size.toLong, r6(lp.toDouble).toDouble,
        r4(math.exp(-lp.toDouble / g.size)))
    }.toMap
    val got = run("q_ngram_lm").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == local.keySet)
    got.foreach { case (id, (nb, lpG, pplG)) =>
      val (nbL, lpL, pplL) = local(id)
      assert(nb == nbL, s"doc $id n_bigrams")
      assert(math.abs(lpG - lpL) < 1e-9, s"doc $id log_prob $lpG != $lpL")
      assert(math.abs(pplG - pplL) < 1e-9, s"doc $id ppl")
      assert(pplG > 0)
    }
  }

  // ---- q_tree_paths ------------------------------------------------------

  test("q_tree_paths == the binary decomposition of every key") {
    val keys = Tables.customer(spark, TestSpark.Sf0001)
      .select(col("c_custkey").cast("long"))
      .collect().map(_.getLong(0)).filter(_ >= 1)
    val local = keys.map { k =>
      // ancestors root→k are the binary-prefix chain k >> d, ..., k >> 0
      val depth = (63 - java.lang.Long.numberOfLeadingZeros(k))
      val path = (depth to 0 by -1).map(j => k >> j).mkString("/")
      k -> (depth, path)
    }.toMap
    val got = run("q_tree_paths").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(got == local)
  }

  // ---- q_cohort_ltv ------------------------------------------------------

  test("q_cohort_ltv == local weekly cohort ledger") {
    def week(ts: java.sql.Timestamp): LocalDate =
      Instant.ofEpochMilli(ts.getTime).atZone(ZoneOffset.UTC).toLocalDate
        .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
    val cohortOf = events.groupBy(_._3).view.mapValues(g =>
      week(g.minBy(t => (epochMicros(t._2), t._1))._2)).toMap
    val sizes = cohortOf.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val cells = events.filter(_._4 == "purchase").groupBy { e =>
      val c = cohortOf(e._3)
      val off = math.floorDiv(
        java.time.temporal.ChronoUnit.DAYS.between(c, week(e._2)), 7L).toInt
      (c, off)
    }.view.mapValues { g =>
      (g.map(_._3).distinct.size.toLong,
        g.map(e => BigDecimal(e._5).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)).sum)
    }.toMap
    val got = run("q_cohort_ltv").collect()
      .map(r => ((r.getDate(0).toLocalDate, r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got.keySet == cells.keySet)
    got.foreach { case ((c, off), (nUsers, nBuyers, rev, ltv)) =>
      val (lb, lrev) = cells((c, off))
      assert(nUsers == sizes(c) && nBuyers == lb)
      assert(rev == r4(lrev.toDouble))
      assert(math.abs(ltv - r4(lrev.toDouble / sizes(c))) < 1e-9)
    }
  }
}
