package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the third round-11 pack: q_feature_hash / q_kfold /
  * q_feature_scale / q_ewma / q_attribution / q_changepoint / q_bfs_hops /
  * q_skyline / q_lateral_join. Cross-engine VALUES are pinned by the
  * DuckDB oracle gate; these cases pin the algorithmic invariants the
  * oracle can't see — definition-level equality against independent local
  * recomputation (quadratic skyline, queue BFS, sequential EWMA/CUSUM
  * scans), conservation laws, and plan shapes.
  */
class MlPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(key: String) =
    SparkEntry.queries(key)(spark, TestSpark.Sf0001)

  // ---- shared local event stream (user -> ordered (type, value)) --------

  private lazy val eventsByUser: Map[Long, Seq[(String, Double)]] =
    Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("ts"), col("event_id"),
              col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
                 r.getString(3), r.getDouble(4)))
      .sortBy(t => (t._2.getTime, t._3))
      .groupBy(_._1)
      .view.mapValues(_.map(t => (t._4, t._5)).toSeq).toMap

  // ---- q_skyline ---------------------------------------------------------

  test("q_skyline == the quadratic NOT-EXISTS pareto definition") {
    val parts = Tables.part(spark, TestSpark.Sf0001)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val expected = parts.filter { case (_, pr, sz) =>
      !parts.exists { case (_, pr2, sz2) =>
        pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz)
      }
    }.map(_._1).toSet
    val got = run("q_skyline").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"sweep != quadratic: only-sweep=${got -- expected}, " +
        s"only-naive=${expected -- got}")
  }

  test("q_skyline survivors are mutually non-dominated and price-sorted") {
    val rows = run("q_skyline").collect()
      .map(r => (r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    // along increasing price the surviving size must strictly increase —
    // the 2-D frontier signature
    rows.sliding(2).foreach {
      case Array((p1, s1), (p2, s2)) =>
        assert(p1 <= p2 && (p1 == p2 || s2 > s1),
          s"frontier violated: ($p1,$s1) then ($p2,$s2)")
      case _ =>
    }
  }

  test("q_skyline plan: broadcast sweep join-back, no cartesian/BNLJ") {
    val s = run("q_skyline").queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast join:\n$s")
    assert(!s.contains("CartesianProduct") &&
           !s.contains("BroadcastNestedLoopJoin"),
      "skyline must never go quadratic")
  }

  // ---- q_bfs_hops --------------------------------------------------------

  test("q_bfs_hops == queue BFS over the same bipartite edge list") {
    val edges = Tables.lineitem(spark, TestSpark.Sf0001)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, TestSpark.Sf0001)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val custToSup = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val supToCust = edges.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val seed = Tables.customer(spark, TestSpark.Sf0001)
      .filter(col("c_nationkey") === 0).select(col("c_custkey"))
      .collect().map(_.getLong(0)).toSet
    val h1 = seed.flatMap(custToSup.getOrElse(_, Set.empty))
    val h2 = h1.flatMap(supToCust.getOrElse(_, Set.empty)) -- seed
    val h3 = h2.flatMap(custToSup.getOrElse(_, Set.empty)) -- h1
    val expected =
      seed.map(("customer", _, 0)) ++ h1.map(("supplier", _, 1)) ++
        h2.map(("customer", _, 2)) ++ h3.map(("supplier", _, 3))
    val got = run("q_bfs_hops").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected,
      s"BFS mismatch: only-dsl=${got -- expected} only-local=${expected -- got}")
  }

  test("q_bfs_hops: each (kind, node) appears exactly once (min-hop dedup)") {
    val nodes = run("q_bfs_hops").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(nodes.length == nodes.distinct.length,
      "a node surfaced in two rings — anti-joins leaked")
  }

  // ---- q_ewma ------------------------------------------------------------

  test("q_ewma == sequential per-user recompute (trailing 20, w=0.5^age)") {
    val expected = eventsByUser.map { case (u, evs) =>
      val tail = evs.takeRight(20).map(_._2)
      val n = tail.length
      val terms = tail.zipWithIndex.map { case (v, i) =>
        val w = math.pow(0.5, (n - 1 - i).toDouble)
        (BigDecimal(v * w).setScale(10, BigDecimal.RoundingMode.HALF_UP),
         BigDecimal(w).setScale(10, BigDecimal.RoundingMode.HALF_UP))
      }
      val ewma = (terms.map(_._1).sum.toDouble / terms.map(_._2).sum.toDouble)
      u -> (n, BigDecimal(ewma).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    }
    val got = run("q_ewma").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (u, (n, e)) =>
      assert(n == expected(u)._1, s"user $u window size: $n")
      assert(math.abs(e - expected(u)._2) < 5e-4,
        s"user $u ewma $e != ${expected(u)._2}")
    }
  }

  test("q_ewma weights the most recent event hardest") {
    // half-life-1 decay: the last event alone carries >= 50% of the
    // weight mass, so the EWMA always lands within |last - ewma| <=
    // (max-min) / 2 of the last value's side of the range
    val got = run("q_ewma").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    eventsByUser.foreach { case (u, evs) =>
      val tail = evs.takeRight(20).map(_._2)
      val (lo, hi) = (tail.min, tail.max)
      assert(got(u) >= lo - 1e-9 && got(u) <= hi + 1e-9,
        s"user $u ewma ${got(u)} outside value range [$lo,$hi]")
      val last = tail.last
      assert(math.abs(got(u) - last) <= (hi - lo) / 2 + 1e-9,
        s"user $u ewma ${got(u)} too far from last=$last")
    }
  }

  // ---- q_attribution -----------------------------------------------------

  test("q_attribution == sequential last-touch scan; purchases conserved") {
    val credit = scala.collection.mutable.Map.empty[String, (Long, BigDecimal)]
    eventsByUser.values.foreach { evs =>
      var touch: String = null
      evs.foreach { case (tpe, v) =>
        if (tpe == "purchase") {
          val key = if (touch == null) "direct" else touch
          val (c, s0) = credit.getOrElse(key, (0L, BigDecimal(0)))
          credit(key) = (c + 1,
            s0 + BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        } else touch = tpe
      }
    }
    val got = run("q_attribution").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == credit.keySet.toSet)
    credit.foreach { case (k, (n, s)) =>
      assert(got(k)._1 == n, s"touch $k count: ${got(k)._1} != $n")
      assert(math.abs(got(k)._2 - s.toDouble) < 1e-6,
        s"touch $k value: ${got(k)._2} != $s")
    }
    val totalPurchases = eventsByUser.values
      .map(_.count(_._1 == "purchase")).sum
    assert(got.values.map(_._1).sum == totalPurchases,
      "attribution must conserve the purchase count")
  }

  // ---- q_changepoint -----------------------------------------------------

  test("q_changepoint == sequential CUSUM argmax per event type") {
    val byTypeDay = Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .collect()
      .map(r => ((r.getString(0), r.getDate(1)), BigDecimal(r.getDouble(2))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expected = byTypeDay.keys.map(_._1).toSet.map { (tpe: String) =>
      val days = byTypeDay.keys.filter(_._1 == tpe).map(_._2)
        .toSeq.sortBy(_.getTime)
      val xs = days.map(d => byTypeDay((tpe, d)))
      val n = xs.length
      val tot = xs.sum
      var cx = BigDecimal(0)
      val sdevs = xs.zipWithIndex.map { case (x, i) =>
        cx += x; n * cx - (i + 1) * tot
      }
      val best = sdevs.zipWithIndex.maxBy { case (s, i) =>
        (s.abs, -i) // |S| desc, earlier day wins ties
      }
      tpe -> (days(best._2), best._1)
    }.toMap
    val got = run("q_changepoint").collect()
      .map(r => r.getString(0) -> (r.getDate(1), r.getDouble(3))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (tpe, (day, sdev)) =>
      assert(got(tpe)._1 == day, s"$tpe cp day ${got(tpe)._1} != $day")
      val n = byTypeDay.keys.count(_._1 == tpe)
      assert(math.abs(got(tpe)._2 - (sdev / n).toDouble) < 5e-4,
        s"$tpe peak ${got(tpe)._2}")
    }
  }

  // ---- q_feature_hash / q_kfold -----------------------------------------

  test("q_feature_hash conserves the token count and stays in 64 buckets") {
    val rows = run("q_feature_hash").collect()
    val totalTokens = Tables.documents(spark, TestSpark.Sf0001)
      .select(size(split(col("text"), " ")).as("n"))
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalTokens,
      "bucketing must conserve every token")
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64))
    // n_docs is a per-bucket distinct count: bounded by the lang's corpus
    val docsPerLang = Tables.documents(spark, TestSpark.Sf0001)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.forall(r => r.getLong(3) <= docsPerLang(r.getString(0))))
  }

  test("q_kfold partitions the corpus; shares sum to ~1; assignment is " +
       "repartition-invariant") {
    val rows = run("q_kfold").collect()
    val total = Tables.documents(spark, TestSpark.Sf0001).count()
    assert(rows.map(_.getLong(1)).sum == total, "folds must partition")
    assert(rows.map(_.getInt(0)).toSet == (0 until 5).toSet)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 5e-4)
    // content-hash assignment: recompute fold of one doc locally
    val d = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id")).limit(1).collect().head.getLong(0)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(d.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val fold = (java.lang.Long.parseLong(md5.take(15), 16) % 5).toInt
    assert((0 until 5).contains(fold)) // sanity of the reference formula
  }

  // ---- q_feature_scale ---------------------------------------------------

  test("q_feature_scale == locally recomputed z-score / min-max") {
    val li = Tables.lineitem(spark, TestSpark.Sf0001)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val stats = li.groupBy(_._1).map { case (f, xs0) =>
      val xs = xs0.map(t => BigDecimal(t._2)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP))
      val n = xs.length.toDouble
      val sx = xs.sum.toDouble
      val sxx = xs.map(x => x * x).sum.toDouble
      val mean = sx / n
      val varr = (sxx - sx * sx / n) / (n - 1)
      f -> (mean, math.sqrt(varr), xs.min.toDouble, xs.max.toDouble)
    }
    run("q_feature_scale").collect().foreach { r =>
      val (mean, sd, mn, mx) = stats(r.getString(2))
      val x = r.getDouble(3)
      assert(math.abs(r.getDouble(4) - (x - mean) / sd) < 5e-4,
        s"zscore for $x")
      assert(math.abs(r.getDouble(5) - (x - mn) / (mx - mn)) < 5e-4,
        s"minmax for $x")
      assert(r.getDouble(5) >= -1e-9 && r.getDouble(5) <= 1 + 1e-9)
    }
  }

  test("q_feature_scale plan: stats ride a broadcast join, fact side " +
       "never shuffles for them") {
    val s = run("q_feature_scale").queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast:\n$s")
  }

  // ---- q_lateral_join ----------------------------------------------------

  test("q_lateral_join == the window top-2 formulation") {
    import org.apache.spark.sql.expressions.Window
    val expected = Tables.customer(spark, TestSpark.Sf0001)
      .join(Tables.nation(spark, TestSpark.Sf0001),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("n_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_name"))))
      .filter(col("rk") <= 2)
      .select(col("n_name"), col("c_name"), col("c_acctbal"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet
    val got = run("q_lateral_join").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == expected)
  }

  test("q_lateral_join decorrelates: no per-outer-row re-execution " +
       "(no cartesian/BNLJ in the plan)") {
    val s = run("q_lateral_join").queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") &&
           !s.contains("BroadcastNestedLoopJoin"),
      s"lateral must decorrelate to a join + group limit:\n$s")
  }

  // ---- q_path_mining -----------------------------------------------------

  test("q_path_mining == sequential triple scan, top-20 by (n desc, path)") {
    val counts = scala.collection.mutable
      .Map.empty[String, (Long, Set[Long])]
    eventsByUser.foreach { case (u, evs) =>
      evs.map(_._1).sliding(3).filter(_.length == 3).foreach { t =>
        val p = t.mkString(">")
        val (n, us) = counts.getOrElse(p, (0L, Set.empty[Long]))
        counts(p) = (n + 1, us + u)
      }
    }
    val expected = counts.toSeq
      .map { case (p, (n, us)) => (p, n, us.size.toLong) }
      .sortBy { case (p, n, _) => (-n, p) }.take(20)
    val got = run("q_path_mining").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  // ---- q_degree_dist -----------------------------------------------------

  test("q_degree_dist conserves edges and nodes on both sides") {
    val edges = Tables.lineitem(spark, TestSpark.Sf0001)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, TestSpark.Sf0001)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = run("q_degree_dist").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    Seq("customer" -> edges.map(_._1).distinct.length,
        "supplier" -> edges.map(_._2).distinct.length)
      .foreach { case (side, nNodes) =>
        val s = rows.filter(_._1 == side)
        assert(s.map(_._3).sum == nNodes,
          s"$side node count not conserved")
        assert(s.map(t => t._2 * t._3).sum == edges.length,
          s"$side degree mass != edge count")
      }
  }

  // ---- q_funnel_window ---------------------------------------------------

  test("q_funnel_window == sequential 48h-deadline scan; steps shrink") {
    val perUser = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getString(2)))
      .groupBy(_._1)
    val H48 = 48L * 3600 * 1000
    var (n1, n2, n3) = (0L, 0L, 0L)
    perUser.values.foreach { evs =>
      val t1 = evs.filter(_._3 == "signup").map(_._2).minOption
      t1.foreach { a =>
        n1 += 1
        val t2 = evs.filter(e => e._3 == "view" && e._2 >= a &&
          e._2 <= a + H48).map(_._2).minOption
        t2.foreach { b =>
          n2 += 1
          if (evs.exists(e => e._3 == "purchase" && e._2 >= b &&
            e._2 <= b + H48)) n3 += 1
        }
      }
    }
    val got = run("q_funnel_window").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("1_signup" -> n1, "2_view_48h" -> n2,
                      "3_purchase_48h" -> n3))
    assert(n1 >= n2 && n2 >= n3, "funnel must shrink monotonically")
  }

  // ---- q_basket_lift -----------------------------------------------------

  test("q_basket_lift == brute-force apriori recompute over order baskets") {
    val items = Tables.lineitem(spark, TestSpark.Sf0001)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val nBaskets = items.map(_._1).distinct.length
    val supp = items.groupBy(_._2).view.mapValues(_.length).toMap
    val frequent = supp.filter(_._2 >= 5).keySet
    val pairCounts = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).filter(frequent).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size).filter(_._2 >= 3)
    val expected = pairCounts.map { case ((a, b), c) =>
      val lift = BigDecimal(c.toDouble * nBaskets /
        (supp(a).toDouble * supp(b).toDouble))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, c.toLong, lift)
    }.toSeq.sortBy { case (a, b, _, l) => (-l, a, b) }.take(20)
    // join-key reordering can permute output column positions — read by
    // name, not position
    val byName = run("q_basket_lift").collect().map { r =>
      (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c_ab"),
       r.getAs[Double]("lift"))
    }.toSeq
    assert(byName == expected)
    byName.foreach { case (a, b, c, _) =>
      assert(a < b && c >= 3 && frequent(a) && frequent(b))
    }
  }

  test("q_basket_lift plan: no cartesian; supports broadcast back") {
    val p = run("q_basket_lift").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "pair generation must stay inside the basket equi-join")
    assert(p.contains("BroadcastHashJoin"),
      s"support dimension should broadcast:\n$p")
  }

  // ---- q_ab_ttest --------------------------------------------------------

  test("q_ab_ttest == local Welch recompute; symmetric arms flip the sign") {
    val byType = Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_type"), col("user_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1) % 2 == 0,
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble))
      .groupBy(_._1)
    val got = run("q_ab_ttest").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5), r.getDouble(6))).toMap
    assert(got.keySet == byType.keySet)
    byType.foreach { case (tpe, rows) =>
      val a = rows.filter(_._2).map(_._3)
      val b = rows.filterNot(_._2).map(_._3)
      def vr(x: Seq[Double]) = {
        val m = x.sum / x.length
        x.map(v => (v - m) * (v - m)).sum / (x.length - 1)
      }
      val (sea, seb) = (vr(a) / a.length, vr(b) / b.length)
      val t = (a.sum / a.length - b.sum / b.length) / math.sqrt(sea + seb)
      val df = (sea + seb) * (sea + seb) /
        (sea * sea / (a.length - 1) + seb * seb / (b.length - 1))
      val (na, nb, tGot, dfGot) = got(tpe)
      assert(na == a.length && nb == b.length)
      assert(math.abs(tGot - t) < 5e-3, s"$tpe t: $tGot vs $t")
      assert(math.abs(dfGot - df) < 5e-2, s"$tpe df: $dfGot vs $df")
      assert(df <= a.length + b.length - 2 + 1e-9,
        "Welch df can never exceed the pooled df")
    }
  }

  // ---- q_corr_matrix / q_linreg ------------------------------------------

  private lazy val liByFlag: Map[String, Seq[(Double, Double, Double)]] =
    Tables.lineitem(spark, TestSpark.Sf0001)
      .select(col("l_returnflag"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount"))
      .collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2),
                 r.getDouble(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  private def pearson(xs: Seq[Double], ys: Seq[Double]): Double = {
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(v => v * v).sum
    val syy = ys.map(v => v * v).sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
  }

  test("q_corr_matrix == local Pearson recompute; values bounded in [-1,1]") {
    val got = run("q_corr_matrix").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getDouble(4)).toMap
    assert(got.size == liByFlag.size * 3)
    liByFlag.foreach { case (f, rows) =>
      val (qs, ps, ds) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
      val cases = Seq(
        ("quantity", "price", pearson(qs, ps)),
        ("quantity", "discount", pearson(qs, ds)),
        ("price", "discount", pearson(ps, ds)))
      cases.foreach { case (x, y, c) =>
        val g = got((f, x, y))
        assert(math.abs(g - c) < 5e-4, s"($f,$x,$y): $g vs $c")
        assert(g >= -1.0 - 1e-9 && g <= 1.0 + 1e-9)
      }
    }
  }

  test("q_linreg == local OLS recompute; r2 == corr^2") {
    val got = run("q_linreg").collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    liByFlag.foreach { case (f, rows) =>
      val (xs, ys) = (rows.map(_._1), rows.map(_._2))
      val n = xs.length.toDouble
      val slope = (n * xs.zip(ys).map { case (a, b) => a * b }.sum -
        xs.sum * ys.sum) / (n * xs.map(v => v * v).sum - xs.sum * xs.sum)
      val intercept = (ys.sum - slope * xs.sum) / n
      val r = pearson(xs, ys)
      val (sg, ig, r2g) = got(f)
      assert(math.abs(sg - slope) < 5e-3, s"$f slope $sg vs $slope")
      assert(math.abs(ig - intercept) < 5e-2, s"$f intercept")
      assert(math.abs(r2g - r * r) < 5e-4, s"$f r2")
    }
  }

  // ---- q_chi_square / q_gini / q_time_weighted_avg -----------------------

  test("q_chi_square == local contingency-table recompute") {
    val obs = Tables.orders(spark, TestSpark.Sf0001)
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val cells = obs.groupBy(identity).view.mapValues(_.length).toMap
    val rm = obs.groupBy(_._1).view.mapValues(_.length).toMap
    val cm = obs.groupBy(_._2).view.mapValues(_.length).toMap
    val n = obs.length.toDouble
    // full r×c grid: a structural zero still contributes (0−e)²/e
    val chi2 = (for (p <- rm.keys; st <- cm.keys) yield {
      val o = cells.getOrElse((p, st), 0)
      val e = rm(p) * cm(st) / n
      (o - e) * (o - e) / e
    }).sum
    val r = run("q_chi_square").collect().head
    assert(math.abs(r.getDouble(0) - chi2) < 5e-3)
    assert(r.getLong(1) == (rm.size - 1).toLong * (cm.size - 1))
    assert(r.getLong(2) == obs.length.toLong)
  }

  test("q_gini == local closed-form recompute; bounded in [0,1)") {
    val spend = Tables.orders(spark, TestSpark.Sf0001)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .join(Tables.customer(spark, TestSpark.Sf0001)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_custkey"), col("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = spend.groupBy(_._1).map { case (seg, rows) =>
      val xs = rows.sortBy(t => (t._3, t._2)).map(_._3.toDouble)
      val nn = xs.length
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      seg -> (2.0 * six - (nn + 1) * xs.sum) / (nn * xs.sum)
    }
    val got = run("q_gini").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (seg, g) =>
      assert(math.abs(got(seg) - g) < 5e-4, s"$seg: ${got(seg)} vs $g")
      assert(got(seg) >= 0.0 - 1e-9 && got(seg) < 1.0)
    }
  }

  test("q_time_weighted_avg == sequential hold-until-next recompute; " +
       "twap inside the value range") {
    val perUser = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0),
                 r.getTimestamp(1).getTime * 1000 +
                   r.getTimestamp(1).getNanos / 1000 % 1000,
                 r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val got = run("q_time_weighted_avg").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    perUser.foreach { case (u, evs0) =>
      val evs = evs0.sortBy(t => (t._2, t._3))
      val ivs = evs.zip(evs.tail)
        .map { case (a, b) => (a._4, b._2 - a._2) }
        .filter(_._2 > 0)
      val twap = ivs.map { case (v, dt) =>
        BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * dt
      }.sum / ivs.map(_._2).sum
      val (nGot, spanGot, twapGot) = got(u)
      assert(nGot == ivs.length && spanGot == ivs.map(_._2).sum)
      assert(math.abs(twapGot - twap.toDouble) < 5e-4, s"user $u twap")
      val vs = ivs.map(_._1)
      assert(twapGot >= vs.min - 1e-9 && twapGot <= vs.max + 1e-9)
    }
  }

  // ---- q_not_in_nulls ----------------------------------------------------

  test("q_not_in_nulls pins three-valued logic: NULL poisons NOT IN, " +
       "NOT EXISTS is unaffected") {
    val got = run("q_not_in_nulls").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("not_in_with_null") == 0L,
      "a NULL in the NOT IN subquery must eliminate every row")
    assert(got("not_exists") == got("not_in_null_filtered"),
      "anti-join and null-filtered NOT IN must agree")
    // ground truth: customers with no orders (custkey 1's orders were
    // nulled out of the subquery, so customer 1 joins the no-order set
    // iff it exists)
    val custs = Tables.customer(spark, TestSpark.Sf0001)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val withOrders = Tables.orders(spark, TestSpark.Sf0001)
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet - 1L
    assert(got("not_exists") == (custs -- withOrders).size.toLong)
  }

  // ---- q_embed_centroid --------------------------------------------------

  test("q_embed_centroid == local per-(label, pos) recompute; bounds hold") {
    val vecs = Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("label"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val rows = run("q_embed_centroid").collect()
    assert(rows.length == vecs.map(_._1).distinct.length * 8)
    rows.foreach { r =>
      val (label, pos) = (r.getInt(0), r.getInt(1))
      val vs = vecs.filter(_._1 == label).map(_._2(pos).toDouble)
      assert(r.getLong(2) == vs.length, s"($label,$pos) n")
      assert(math.abs(r.getDouble(3) - vs.sum / vs.length) < 5e-4,
        s"($label,$pos) centroid")
      assert(math.abs(r.getDouble(4) - vs.min) < 5e-4)
      assert(math.abs(r.getDouble(5) - vs.max) < 5e-4)
      assert(r.getDouble(3) >= r.getDouble(4) - 1e-9 &&
             r.getDouble(3) <= r.getDouble(5) + 1e-9,
        "centroid must sit inside [vmin, vmax]")
    }
  }
}
