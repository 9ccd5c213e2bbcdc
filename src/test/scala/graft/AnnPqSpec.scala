package graft

import graft.ops.AnnIndex
import graft.sources.SnapshotLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantized serving over the persisted IVF index (r16): the
  * compressed-domain scale path — codes ≈ m small ints per vector
  * instead of d doubles, ADC shortlist + exact re-rank. Pins:
  *  1. codebook shape + determinism (two trainings byte-equal);
  *  2. the degradation identity: nProbe = nLists with a corpus-covering
  *     refine equals [[AnnIndex.topK]]'s brute-force serving EXACTLY
  *     (same rounding, same tie rule) — the correctness anchor;
  *  3. recall@5 of the real operating point (nProbe 4, refine 4) vs the
  *     exact brute-force truth, and that refine ≥ pure-ADC ranking;
  *  4. appendPq encodes exactly the missing vectors against the
  *     PERSISTED codebook — history byte-stable, served results include
  *     the appended mass, second call is a recorded no-op.
  */
class AnnPqSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val NLists = 16
  // operating point validated against an independent numpy PQ reference:
  // m=8/ks=16 (0.5 bit/dim) reads recall 0.464 in BOTH engines (too
  // compressed for this noise-heavy fixture), m=16/ks=64 (1.5 bits/dim)
  // reads 0.592 = the IVF routing ceiling — codes are still ~40x smaller
  // than the full vectors
  private val M = 16
  private val NCodes = 64

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def emb: DataFrame = Tables.embeddings(s, TestSpark.Sf0001)

  private def probesOf(df: DataFrame): DataFrame =
    df.filter(col("vec_id") >= 10 && col("vec_id") < 60)
      .select(col("vec_id").as("probe_id"),
        transform(col("embedding"), v => v.cast("double")).as("pe"))

  test("trainPq: full m x nCodes codebook, deterministic across runs") {
    val cb1 = AnnIndex.trainPq(emb, M, NCodes).collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("code")) ->
        r.getAs[scala.collection.Seq[Double]]("carr").toSeq).toMap
    assert(cb1.keySet ==
      (for (j <- 0 until M; c <- 0 until NCodes) yield (j, c)).toSet)
    assert(cb1.values.forall(_.size == 64 / M), "subspace width")
    val cb2 = AnnIndex.trainPq(emb, M, NCodes).collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("code")) ->
        r.getAs[scala.collection.Seq[Double]]("carr").toSeq).toMap
    assert(cb1 == cb2, "training must be deterministic")
  }

  test("degradation identity: all lists probed + corpus-covering refine == topK") {
    val root = tmpDir("ann_pq_ident")
    AnnIndex.build(emb, root, NLists)
    AnnIndex.buildPq(s, root, M, NCodes)
    val probes = probesOf(emb)
    val n = emb.count().toInt
    val exact = AnnIndex.topK(s, root, probes, nProbe = NLists, k = 5)
      .orderBy("probe_id", "rn").collect().toSeq
    val pq = AnnIndex.topKPq(s, root, probes, nProbe = NLists, k = 5,
        refine = n / 5 + 1)
      .orderBy("probe_id", "rn").collect().toSeq
    assert(pq == exact,
      "a corpus-covering shortlist must re-rank to the exact answer")
  }

  test("recall@5 at the operating point; refine beats pure-ADC ranking") {
    val root = tmpDir("ann_pq_recall")
    AnnIndex.build(emb, root, NLists)
    AnnIndex.buildPq(s, root, M, NCodes)
    val probes = probesOf(emb)
    val truth = AnnIndex.topK(s, root, probes, nProbe = NLists, k = 5)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(refine: Int): Double = {
      val got = AnnIndex.topKPq(s, root, probes, nProbe = 4, k = 5,
          refine = refine)
        .select("probe_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val r4 = recallOf(4)
    val r1 = recallOf(1)
    info(f"IVF-PQ recall@5: refine=4 $r4%.3f, refine=1 (pure ADC) $r1%.3f")
    // the IVF routing alone caps recall (nProbe 4 of 16); PQ's job is to
    // not lose much more than the routing does
    val ivfOnly = {
      val got = AnnIndex.topK(s, root, probes, nProbe = 4, k = 5)
        .select("probe_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    info(f"IVF-only recall@5 at nProbe=4: $ivfOnly%.3f")
    assert(r4 >= ivfOnly - 0.10,
      f"refine=4 recall $r4%.3f fell more than 0.10 below the IVF " +
      f"routing ceiling $ivfOnly%.3f — the compressed stage is broken")
    assert(r4 >= r1 - 1e-9,
      f"exact re-rank ($r4%.3f) must not lose to pure ADC ($r1%.3f)")
  }

  test("appendPq: catch-up encoding, byte-stable history, no-op when current") {
    val root = tmpDir("ann_pq_append")
    val base = emb.filter(col("vec_id") < 400)
    val extra = emb.filter(col("vec_id") >= 400)
    AnnIndex.build(base, root, NLists)
    AnnIndex.buildPq(s, root, M, NCodes)
    val codesT = s"$root/pq/codes"
    val snap1 = SnapshotLake.latest(s, codesT).get
    val before = SnapshotLake.readAt(s, codesT, snap1).collect().toSet

    AnnIndex.append(s, extra, root)
    val got = AnnIndex.appendPq(s, root)
    assert(got.isDefined, "missing vectors must trigger a catch-up commit")
    // covered exactly: every lists vec_id has one codes row
    val lists = SnapshotLake.readLatest(s, s"$root/lists")
    val codes = SnapshotLake.readLatest(s, codesT)
    assert(codes.count() == lists.count())
    assert(codes.select("vec_id").distinct().count() == lists.count())
    // history byte-stable
    assert(SnapshotLake.readAt(s, codesT, snap1).collect().toSet == before)
    // second catch-up is a recorded no-op
    assert(AnnIndex.appendPq(s, root).isEmpty)
    // served results can now reach the appended mass
    val probes = probesOf(emb).filter(col("probe_id") < 20)
    val served = AnnIndex.topKPq(s, root, probes, nProbe = NLists, k = 5,
      refine = 200).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(served.exists(_ >= 400),
      "appended vectors must be servable after catch-up")
  }

  test("rebalance splits hot lists: skew drops, recall holds, PQ re-encodes (r17)") {
    import org.apache.spark.sql.expressions.Window
    val root = tmpDir("ann_rebal")
    AnnIndex.build(emb, root, NLists)
    AnnIndex.buildPq(s, root, M, NCodes)
    // skewed append: a broad 300-vector cloud dominated by vec 0's
    // direction (v0 + 0.15..0.30 of 50 distinct partner directions) —
    // realistic drift: one region grows hot, but the mass has internal
    // structure a 2-means split can separate
    val v0 = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("e0"))
    val drift = emb.filter(col("vec_id") >= 100 && col("vec_id") < 150)
      .crossJoin(v0)
      .select(col("vec_id"), col("embedding"), col("e0"),
        explode(sequence(lit(0), lit(5))).as("j"))
      .select(
        (lit(1000L) + (col("vec_id") - 100) * 6 + col("j")).as("vec_id"),
        zip_with(col("e0"), col("embedding"), (a, b) =>
          a + b * (lit(0.15f) + col("j").cast("float") * lit(0.03f)))
          .as("embedding"))
    AnnIndex.append(s, drift, root)
    AnnIndex.appendPq(s, root)
    def residency: Map[Int, Long] = SnapshotLake
      .readLatest(s, s"$root/lists").groupBy(col("cid")).count()
      .collect().map(r => r.getAs[Int]("cid") -> r.getAs[Long]("count"))
      .toMap
    val before = residency
    val meanBefore = before.values.sum.toDouble / before.size
    assert(before.values.max > 2.0 * meanBefore,
      s"fixture must be skewed for this test: $before")

    // recall truth: exact cosine top-5 over the FULL corpus
    val corpus = SnapshotLake.readLatest(s, s"$root/lists")
      .select(col("vec_id"), col("vec").as("embedding"))
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"),
        transform(col("embedding"), v => v.cast("double")).as("pe"))
    val dot = (a: org.apache.spark.sql.Column,
               b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (p, q) => p + q)
    val e = corpus.select(col("vec_id"),
      transform(col("embedding"), v => v.cast("double")).as("v"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val truth = e.crossJoin(probes)
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(dot(col("pe"), col("v")) /
          (sqrt(dot(col("pe"), col("pe"))) * sqrt(dot(col("v"), col("v")))),
          4).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallAt(nProbe: Int): Double = {
      val got = AnnIndex.topK(s, root, probes, nProbe, k = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(2))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      truth.map { case (p, t) =>
        got.getOrElse(p, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    }
    val recallBefore = recallAt(3)

    val snap = AnnIndex.rebalance(s, root, maxSkew = 2.0)
    assert(snap.isDefined && snap.get > 0L, "rebalance must commit")
    val after = residency
    // no vector lost or duplicated
    assert(after.values.sum == before.values.sum)
    assert(SnapshotLake.readLatest(s, s"$root/lists")
      .select("vec_id").distinct().count() == before.values.sum)
    // the hot mass actually split: max residency strictly dropped and
    // the list count grew
    assert(after.values.max < before.values.max,
      s"split must shed the hot list: ${before.values.max} -> " +
      s"${after.values.max}")
    assert(after.size > before.size)
    assert(SnapshotLake.readLatest(s, s"$root/centroids").count() ==
      after.size.toLong)
    // recall at the same nProbe survives the split
    val recallAfter = recallAt(3)
    info(f"recall@5 nProbe=3: before=$recallBefore%.3f after=$recallAfter%.3f")
    assert(recallAfter >= recallBefore - 0.05,
      s"recall collapsed across rebalance: $recallBefore -> $recallAfter")
    // PQ layer re-encoded: full coverage, still serves the drifted mass
    val codes = SnapshotLake.readLatest(s, s"$root/pq/codes")
    assert(codes.count() == before.values.sum)
    assert(codes.select("vec_id").distinct().count() == before.values.sum)
    val served = AnnIndex.topKPq(s, root, probes,
      nProbe = after.size, k = 5, refine = 200)
    assert(served.count() == truth.size * 5L)
    // iterating to the fixpoint restores the residency bound — the
    // read-amplification contract (no list above maxSkew x mean) — and
    // the fixpoint call itself is a recorded no-op
    var last = snap.get
    var rounds = 0
    var settled = false
    while (!settled && rounds < 8) {
      val r = AnnIndex.rebalance(s, root, maxSkew = 2.0)
      assert(r.isDefined, "no concurrent writer — rebalance must commit")
      settled = r.get == last
      last = r.get
      rounds += 1
    }
    assert(settled, "rebalance must reach a fixpoint")
    val fin = residency
    val finMean = fin.values.sum.toDouble / fin.size
    assert(fin.values.max <= 2.0 * finMean,
      s"fixpoint must restore the residency bound: max=${fin.values.max} " +
      s"mean=$finMean")
  }

  test("trainPq and topKPq validate dimensions loudly (r17)") {
    // trainPq is public: a non-divisible m would silently truncate every
    // subvector's tail dims — must require d % m == 0 itself
    val exT = intercept[IllegalArgumentException] {
      AnnIndex.trainPq(emb, m = 7, nCodes = 8)
    }
    assert(exT.getMessage.contains("not divisible"),
      s"wrong failure: ${exT.getMessage}")
    // probe-side: wrong-dim query vectors throw, not null-pad
    val root = tmpDir("ann_pq_dim")
    AnnIndex.build(emb, root, NLists)
    AnnIndex.buildPq(s, root, M, NCodes)
    val badProbe = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"),
        slice(transform(col("embedding"), v => v.cast("double")),
          1, 6).as("pe"))
    val exP = intercept[Exception] {
      AnnIndex.topKPq(s, root, badProbe, nProbe = 2, k = 3).collect()
    }
    assert(exP.getMessage.contains("does not match index dim"),
      s"wrong failure: ${exP.getMessage}")
  }

  test("delete removes the PQ codes too; compressed serving never returns " +
       "a deleted id and the degradation identity holds on survivors (r18)") {
    import s.implicits._
    val root = tmpDir("ann_pq_del")
    AnnIndex.build(emb, root, NLists)
    AnnIndex.buildPq(s, root, M, NCodes)
    val codesT = s"$root/pq/codes"
    val allCodes = SnapshotLake.readLatest(s, codesT)
      .select("vec_id").as[Long].collect().toSet
    val doomed = Seq(11L, 23L, 47L, 101L)
    assert(AnnIndex.delete(s, root, doomed.toDF("vec_id")).isDefined)
    // codebook untouched; codes lose exactly the doomed ids
    val codesAfter = SnapshotLake.readLatest(s, codesT)
      .select("vec_id").as[Long].collect().toSet
    assert(codesAfter == allCodes -- doomed)
    // compressed serving: no deleted id, and the nProbe=NLists +
    // corpus-covering refine identity still equals brute force over the
    // SURVIVING corpus
    val probes = probesOf(emb).filter(col("probe_id") < 20)
    val pq = AnnIndex.topKPq(s, root, probes, nProbe = NLists, k = 5,
      refine = 200)
    assert(pq.filter(col("vec_id").isin(doomed: _*)).isEmpty)
    val exact = AnnIndex.topK(s, root, probes, nProbe = NLists, k = 5)
    assert(pq.collect().map(_.toSeq).toSet ==
      exact.collect().map(_.toSeq).toSet,
      "post-delete degradation identity must hold on survivors")
  }
}
