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
}
