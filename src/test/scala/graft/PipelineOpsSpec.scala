package graft

import graft.ops.PipelineOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the second-wave pipeline operators, beyond the DuckDB
  * hash-match the driver already runs: structural guarantees the oracle
  * can't see (band guarantee, score bounds, top-k shape).
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private def q(name: String) =
    PipelineOps.queries(name)(s, TestSpark.Sf0001)

  test("seqPack matches a reference greedy fold on random inputs (12 seeds)") {
    // Fixture tests pin the happy path; random shapes cover oversized
    // docs mid-stream, exact fits, tiny budgets, and single-doc keys —
    // where an off-by-one in the boundary rule would hide.
    import s.implicits._
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(100 + seed)
      val budget = (1 + rnd.nextInt(20)).toLong
      val langs = Seq("a", "b", "c").take(1 + rnd.nextInt(3))
      val docs = (0 until (5 + rnd.nextInt(40))).map { i =>
        (i.toLong, langs(rnd.nextInt(langs.size)), (1 + rnd.nextInt(30)).toLong)
      }
      val expected = docs.groupBy(_._2).flatMap { case (lang, ds) =>
        var cur = 0L; var pack = 0L
        ds.sortBy(_._1).map { case (id, _, tok) =>
          if (cur + tok > budget && cur > 0) { pack += 1; cur = 0 }
          cur += tok
          (id, lang, pack, tok)
        }
      }.toSet
      val got = PipelineOps.seqPack(docs.toDF("doc_id", "lang", "tok"), budget)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected, s"seed $seed budget=$budget docs=$docs")
    }
  }

  test("chunkDocs matches a reference sliding chunker on random inputs (12 seeds)") {
    // Random (window, stride, doc length) shapes cover the boundary cases
    // the fixture can't: last chunk shorter than stride, exact-fit tails,
    // window == stride (no overlap), single-token docs.
    import s.implicits._
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(200 + seed)
      val window = 1 + rnd.nextInt(12)
      val stride = 1 + rnd.nextInt(window)
      val docs = (0 until (3 + rnd.nextInt(20))).map { i =>
        val n = 1 + rnd.nextInt(40)
        (i.toLong, (0 until n).map(_ => s"w${rnd.nextInt(50)}").mkString(" "))
      }
      val expected = docs.flatMap { case (id, text) =>
        val toks = text.split(" ")
        Iterator.from(0).map(_ * stride).takeWhile(_ < toks.length)
          .zipWithIndex.map { case (st, ci) =>
            val chunk = toks.slice(st, math.min(st + window, toks.length))
            (id, ci, chunk.length, chunk.mkString(" "))
          }.toSeq
      }.toSet
      val got = PipelineOps.chunkDocs(docs.toDF("doc_id", "text"),
          window, stride)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .toSet
      assert(got == expected, s"seed $seed window=$window stride=$stride")
    }
  }

  test("q_dedup_simhash pairs are ordered, deduped, and within Hamming 3") {
    val rows = q("q_dedup_simhash")
      .select("d1", "d2", "hamming").as[(Long, Long, Long)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).collect()
    assert(rows.nonEmpty, "fixture's near-dup docs should collide")
    assert(rows.forall { case (d1, d2, h) => d1 < d2 && h >= 0 && h <= 3 })
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }

  test("q_quality_score stays in [0,1] with ratios in range") {
    val rows = q("q_quality_score").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val dr = r.getAs[Double]("distinct_ratio")
      val sr = r.getAs[Double]("stop_ratio")
      val qv = r.getAs[Double]("quality")
      assert(dr >= 0 && dr <= 1); assert(sr >= 0 && sr <= 1)
      assert(qv >= 0 && qv <= 1)
    }
  }

  test("q_word_entropy is bounded by the uniform-distribution maximum") {
    val rows = q("q_word_entropy").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val dl = r.getAs[Long]("dl")
      val nTypes = r.getAs[Long]("n_types")
      val h = r.getAs[Double]("entropy")
      assert(nTypes <= dl)
      // 0 <= H <= ln(n_types), up to the 1e-4 output rounding plus the
      // 1e-6 per-term rounding accumulated over n_types terms
      val eps = 5e-5 + nTypes * 1e-6
      assert(h >= -eps, s"negative entropy: $r")
      assert(h <= math.log(nTypes.toDouble) + eps,
        s"entropy above uniform bound ln($nTypes): $r")
      // all-distinct docs achieve the bound exactly (tf=1 ⇒ every term 0)
      if (nTypes == dl)
        assert(math.abs(h - math.log(dl.toDouble)) <= 5e-5,
          s"all-distinct doc should hit ln(dl): $r")
    }
  }

  test("q_ann_ivf returns exactly 5 ranked neighbors per probe") {
    val rows = q("q_ann_ivf").collect()
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.keySet == Set(10L, 11L, 12L, 13L, 14L))
    byProbe.values.foreach { g =>
      assert(g.map(_.getAs[Int]("rn")).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      val cos = g.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("cos"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q_lang_id confusion matrix accounts for every document") {
    val total = q("q_lang_id").agg(sum("n_docs")).head.getLong(0)
    val docs = Tables.documents(s, TestSpark.Sf0001).count()
    assert(total == docs, "every doc shares at least one profile word")
  }

  test("q_multimodal_meta magic bytes are the payload's first 4 bytes") {
    val rows = q("q_multimodal_meta")
      .join(Tables.documents(s, TestSpark.Sf0001), "doc_id")
      .select("magic_hex", "text").collect()
    rows.foreach { r =>
      val expect = r.getAs[String]("text").getBytes("UTF-8").take(4)
        .map(b => f"$b%02X").mkString
      assert(r.getAs[String]("magic_hex") == expect)
    }
  }

  test("short documents yield empty shingle sets instead of ANSI crashes") {
    import s.implicits._
    // regression class: the old HOF formulations indexed past the array
    // end (throws under Spark 4 ANSI) or ran sequence() backwards on
    // short docs; WordShingles must give empty sets below k
    val docs = Seq((1L, "solo"), (2L, "two words"), (3L, "a b c d")).toDF("doc_id", "text")
    val bi = docs.select(col("doc_id"),
        graft.expr.WordShingles.of(col("text"), 2).as("g")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(bi(1L).isEmpty)
    assert(bi(2L) == Seq("two words"))
    assert(bi(3L) == Seq("a b", "b c", "c d"))
    val sh = docs.select(col("doc_id"),
      graft.ops.TextOps.shingles(col("text")).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L).isEmpty && sh(2L).isEmpty && sh(3L) == Seq("a b c", "b c d"))
  }

  test("q_doc_fingerprint: identical texts get identical fingerprints") {
    val out = q("q_doc_fingerprint")
    val joined = out.join(
        Tables.documents(s, TestSpark.Sf0001).select(
          col("doc_id"), md5(col("text")).as("th")), "doc_id")
      .groupBy("th")
      .agg(countDistinct(col("fp_xor"), col("fp_min"), col("n_fp")).as("v"))
    assert(joined.filter(col("v") > 1).count() == 0)
  }

  test("q_repetition_score fractions are in range and identical texts score identically") {
    val out = q("q_repetition_score")
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val dup = r.getDouble(2); val top = r.getDouble(3)
      assert(n >= 1)
      assert(dup >= 0.0 && dup < 1.0, s"dup_frac out of range: $dup")
      // the top bigram accounts for at least its own occurrences and for
      // every occurrence when there is only one distinct bigram
      assert(top > 0.0 && top <= 1.0, s"top_frac out of range: $top")
      // top_frac is rounded to 4 decimals, which can land up to 5e-5
      // below the true >= 1/n bound
      assert(top >= 1.0 / n - 5e-5 - 1e-9)
    }
    val dupes = out.join(
        Tables.documents(s, TestSpark.Sf0001)
          .select(col("doc_id"), md5(col("text")).as("th")), "doc_id")
      .groupBy("th")
      .agg(countDistinct(col("dup_frac"), col("top_frac")).as("v"))
    assert(dupes.filter(col("v") > 1).count() == 0,
      "identical texts must get identical repetition scores")
  }

  test("q_pii_scrub removes every match it counted") {
    val rows = q("q_pii_scrub").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scrubbed = r.getString(4)
      assert(!scrubbed.contains("@"), s"email survived scrub: $scrubbed")
      assert(!scrubbed.matches(".*555-[0-9]{4}.*"),
        s"phone survived scrub: $scrubbed")
      assert(!scrubbed.contains("https://"), s"url survived scrub: $scrubbed")
      assert(r.getInt(1) >= 1, "constructed text always has >= 1 email")
      assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<URL>"))
      // placeholder count equals the pre-scrub match count
      assert("<EMAIL>".r.findAllIn(scrubbed).length == r.getInt(1))
      assert("<PHONE>".r.findAllIn(scrubbed).length == r.getInt(2))
    }
  }

  test("q_eval_contamination flags the planted duplicates and nothing about eval docs") {
    val out = q("q_eval_contamination").collect()
    out.foreach { r =>
      assert(r.getLong(0) % 20 != 0, "eval docs must not appear as train")
      val c = r.getDouble(2)
      assert(c >= 0.5 && c <= 1.0, s"contamination out of range: $c")
    }
    // a doc TEXT-identical to an eval doc is contamination 1.0 by
    // construction — verify the check finds every such planted pair
    val docs = Tables.documents(s, TestSpark.Sf0001)
    val evalHashes = docs.filter(col("doc_id") % 20 === 0)
      .filter(size(split(col("text"), " ")) >= 8)
      .select(md5(col("text")).as("th")).distinct()
    val planted = docs.filter(col("doc_id") % 20 =!= 0)
      .join(evalHashes, md5(col("text")) === col("th"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = out.map(_.getLong(0)).toSet
    assert(planted.subsetOf(flagged),
      s"exact eval copies missed: ${planted -- flagged}")
  }
}
