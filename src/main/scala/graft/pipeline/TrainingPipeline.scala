package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-facing composition of the engine's training-data operators as
  * plain DataFrame → DataFrame stages — the way a consumer actually wires
  * a 100 TB corpus clean-up, as opposed to the fixture-bound `q_*` query
  * keys (which exist for the oracle gate and share these semantics).
  *
  * Stage order is the standard corpus-prep recipe, cheapest-first so each
  * stage shrinks the next one's input: quality gate (narrow filter) →
  * exact dedup (one digest shuffle) → near-dup dedup (MinHash LSH bucket
  * join on survivors only) → annotation (lang-ID). Every stage is
  * incremental-friendly: pure column logic, no state outside the frame.
  */
object TrainingPipeline {

  /** Quality gate: token/diversity/length heuristics (q_quality_score
    * semantics with caller-supplied thresholds). Narrow — no shuffle. */
  def qualityFilter(docs: DataFrame, minTokens: Int = 10,
                    minDistinctRatio: Double = 0.2): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .withColumn("n_tokens", size(toks))
      .withColumn("distinct_ratio",
        size(array_distinct(toks)).cast("double") / col("n_tokens"))
      .filter(col("n_tokens") >= minTokens &&
              col("distinct_ratio") >= minDistinctRatio)
      .drop("n_tokens", "distinct_ratio")
  }

  /** Model-based quality gate (q_unigram_lm semantics): scores every doc
    * with the corpus unigram LM ([[graft.ops.TextOps.unigramLogProb]]) and
    * drops the lowest-scoring `dropFraction` — the perplexity-style filter
    * run AFTER the cheap heuristic [[qualityFilter]] (heuristics first:
    * they're narrow; the LM score costs a (doc, word) shuffle). The cut
    * point is an `approx_percentile` t-digest over the scores — mergeable,
    * bounded memory, broadcast back as ONE row — so the stage adds no
    * driver-side collect and no global sort at any corpus size. */
  def lmQualityFilter(docs: DataFrame, dropFraction: Double = 0.05): DataFrame = {
    require(dropFraction >= 0 && dropFraction < 1,
      s"dropFraction must be in [0, 1), got $dropFraction")
    val scores = graft.ops.TextOps.unigramLogProb(docs)
      .select(col("doc_id"), col("avg_logp"))
    val cut = scores.agg(
      percentile_approx(col("avg_logp"), lit(dropFraction), lit(10000))
        .as("cut"))
    // LEFT join + null-pass: a doc whose text tokenizes to nothing (null
    // or empty text) gets no LM score at all — the contract is "drop the
    // lowest-scoring fraction", not "drop the unscorable", so unscored
    // docs pass through to the next stage rather than vanishing on the
    // inner join (ADVICE r7).
    docs.join(scores, Seq("doc_id"), "left")
      .crossJoin(broadcast(cut))
      .filter(col("avg_logp").isNull || col("avg_logp") >= col("cut"))
      .drop("avg_logp", "cut")
  }

  /** Repetition gate (q_repetition_score semantics): drop docs whose
    * duplicate-bigram fraction exceeds `maxDupFrac` — the Gopher/Dolma
    * boilerplate filter (template pages repeat the same n-grams). LEFT
    * join + null-pass like [[lmQualityFilter]]: a doc too short to have
    * bigrams is unscorable, not low-quality, and passes through. One
    * narrow explode + two hash-aggs; grams ride as h60 longs. */
  def repetitionFilter(docs: DataFrame, maxDupFrac: Double = 0.3): DataFrame = {
    require(maxDupFrac >= 0 && maxDupFrac <= 1,
      s"maxDupFrac must be in [0, 1], got $maxDupFrac")
    val grams = docs.select(col("doc_id"),
        explode(graft.expr.WordShingles.of(col("text"), 2)).as("gs"))
      .select(col("doc_id"), graft.expr.Md5Prefix60.h60(col("gs")).as("g"))
    val scores = grams.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg((lit(1.0) - count(lit(1)).cast("double") /
        sum(col("cnt")).cast("double")).as("dup_frac"))
    docs.join(scores, Seq("doc_id"), "left")
      .filter(col("dup_frac").isNull || col("dup_frac") <= maxDupFrac)
      .drop("dup_frac")
  }

  /** PII scrub (q_pii_scrub semantics): replace emails, simple phone
    * shapes, and URLs in `text` with placeholder tokens. Pure narrow
    * projection — zero shuffles; run it FIRST so no downstream stage
    * (dedup digests, LM scores, packs) ever sees raw PII. Patterns are
    * lookaround-free character classes (portable, codegen-friendly);
    * widen per corpus. */
  def scrubPii(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        "[a-zA-Z0-9.#_]+@[a-zA-Z0-9.]+", "<EMAIL>"),
        "\\b[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}\\b", "<PHONE>"),
        "https?://[^ ]+", "<URL>"))

  /** Unicode cleanup stage (r14, the q_text_normalize op as a pipeline
    * step): NFC normalization (custom codegen'd NfcNormalize — decomposed
    * accents, compatibility artifacts from OCR/PDF extraction),
    * control-char → space (NOT delete: \n/\t/\r must separate words, never
    * weld them), whitespace/NBSP collapse, updating n_chars to the clean
    * length. Narrow projection, zero shuffles; run it BEFORE any digest
    * stage so byte-variant spellings of the same text dedup together —
    * a decomposed 'é' and a composed 'é' hash differently raw, NFC makes
    * them one canonical form. */
  def normalizeText(docs: DataFrame): DataFrame =
    docs.withColumn("text",
        trim(regexp_replace(regexp_replace(
          graft.expr.NfcNormalize.nfc(col("text")), "[\\p{Cntrl}]", " "),
          "[\\s\\u00A0]+", " ")))
      .withColumn("n_chars", length(col("text")))

  /** Exact dedup: keep the lowest-id doc per md5(text). One shuffle of
    * (digest, id) — the text column never moves. */
  def dedupExact(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** The canon digest ledger (q_dedup_incremental semantics): one
    * (digest) row per doc — md5 of the full text by default, or of the
    * first `prefixWords` words (the CCNet-style leading-content hash)
    * when near-exact snapshot matching is wanted. Persist THIS per
    * snapshot cycle (16 bytes/doc — ~160 GB at 10¹⁰ docs), so the next
    * crawl's [[dedupAgainstCanon]] never recomputes digests from the old
    * corpus's text. */
  def contentDigests(docs: DataFrame, prefixWords: Int = 0): DataFrame =
    docs.select(graft.ops.TextOps.prefixDigest(prefixWords).as("digest"))
      .distinct()

  /** Incremental (cross-snapshot) dedup: drop every doc whose digest
    * already exists in `canonDigests` (a [[contentDigests]] frame from
    * the prior snapshot), then dedup the batch against itself the
    * [[dedupExact]] way. The anti-join is digest-keyed — text never
    * shuffles — and SMJ-shuffles (long, long) pairs when the canon
    * outgrows broadcast. `prefixWords` must match the value the ledger
    * was built with. */
  def dedupAgainstCanon(docs: DataFrame, canonDigests: DataFrame,
                        prefixWords: Int = 0): DataFrame = {
    val fresh = docs
      .withColumn("digest", graft.ops.TextOps.prefixDigest(prefixWords))
      .join(canonDigests, Seq("digest"), "left_anti")
    val w = Window.partitionBy(col("digest")).orderBy(col("doc_id"))
    fresh.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "digest")
  }

  /** One crawl cycle of the incremental-dedup ledger, SNAPSHOT-COMMITTED
    * (composing [[dedupAgainstCanon]] with
    * [[graft.sources.SnapshotLake]]): dedup `batch` against the canon
    * digest table's latest committed snapshot (empty canon on the first
    * cycle), then commit the survivors' digests as the next snapshot
    * (append — the ledger only grows). Returns (survivors, snapshotId).
    *
    * What the snapshot protocol buys the cycle: a crash ANYWHERE before
    * the manifest rename leaves the ledger at the old snapshot — the
    * whole batch replays and re-commits, no torn digest set ever anchors
    * a future dedup; and a reader pinned at snapshot N−1 (an audit, a
    * slow downstream join) keeps a byte-stable canon while cycle N
    * lands. The returned `survivors` frame is lazy lineage over `batch`
    * — a caller that both writes it and inspects it should persist it
    * once (the commit itself reads the digests, not the text, twice). */
  def dedupCycle(batch: DataFrame, canonTable: String,
                 prefixWords: Int = 0): (DataFrame, Long) = {
    val spark = batch.sparkSession
    val canon = graft.sources.SnapshotLake.latest(spark, canonTable)
      .map(id => graft.sources.SnapshotLake.readAt(spark, canonTable, id))
      .getOrElse(spark.range(0).select(lit("").as("digest")))
    val survivors = dedupAgainstCanon(batch, canon, prefixWords)
    val id = graft.sources.SnapshotLake.commit(
      contentDigests(survivors, prefixWords), canonTable)
    (survivors, id)
  }

  /** [[dedupCycle]] + ANN-index hygiene (r18, VERDICT r17 item 4): after
    * the cycle commits, the batch rows dedup REMOVED (exact dups against
    * the canon or inside the batch) also leave the persisted ANN index
    * at `annRoot` — [[graft.ops.AnnIndex.delete]]'s dir-granular CoW, so
    * a removed document's vector stops serving from probes without a
    * rebuild (vec_id = doc_id, the pipeline convention). The delete
    * retries through lost CAS races against concurrent appends (bounded)
    * — an append is never dropped, and the removed ids always leave.
    * Returns (survivors, canon snapshot id). */
  def dedupCycleWithIndex(batch: DataFrame, canonTable: String,
                          annRoot: String,
                          prefixWords: Int = 0): (DataFrame, Long) = {
    val spark = batch.sparkSession
    val (survivors0, id) = dedupCycle(batch, canonTable, prefixWords)
    val survivors = survivors0.localCheckpoint(false)
    val removed = batch.select(col("doc_id"))
      .join(survivors.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id").as("vec_id"))
    var attempts = 0
    var done = false
    while (!done && attempts < 16) {
      done = graft.ops.AnnIndex.delete(spark, annRoot, removed).isDefined
      attempts += 1
    }
    require(done, s"ANN vector deletion lost $attempts CAS races at " +
      s"$annRoot — a concurrent lists writer is hot; re-run the cycle's " +
      "hygiene pass")
    (survivors, id)
  }

  /** Near-dup removal via the MinHash LSH pipeline (q_dedup_minhash
    * semantics): every doc that is the HIGHER id of any ≥-threshold pair
    * is dropped. Conservative: in a transitive chain (1~2, 2~3, 1≁3),
    * doc 3 is removed along with 2 even though its only match was itself
    * removed — the result never contains two near-dup docs, at the cost
    * of over-removing inside chains. The smallest doc of every dup
    * cluster always survives (pairs have d1 < d2, so a cluster minimum is
    * never a right side). Alternatives, both multi-pass: canonical
    * one-doc-per-cluster needs connected components + min-per-component
    * (removes even non-d2 members of a cluster); maximal retention needs
    * a sequential greedy over pairs (keeps a doc whose only matches were
    * themselves removed). This one-pass rule sits between them and is the
    * shape a 100 TB pipeline runs by default. */
  def dedupNearMinHash(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    dropPairRight(docs, graft.ops.TextOps.minhashPairs(docs, threshold))

  /** The one-pass drop rule shared by [[dedupNearMinHash]] and the
    * signature-store path: remove every doc that is the HIGHER id (`d2`)
    * of any pair. */
  private def dropPairRight(docs: DataFrame, pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("d2").as("doc_id")).distinct(),
              Seq("doc_id"), "left_anti")

  /** Canonical near-dup removal: MinHash pairs → connected components →
    * keep exactly the minimum doc of every dup cluster (strictest of the
    * alternatives in [[dedupNearMinHash]]'s doc — a non-minimum cluster
    * member is removed even when it is never the right side of a pair).
    */
  def dedupNearCanonical(docs: DataFrame, threshold: Double = 0.5,
                         maxIters: Int = 50): DataFrame = {
    val pairs = graft.ops.TextOps.minhashPairs(docs, threshold)
      .select(col("d1"), col("d2"))
    val comps = graft.ops.Components.connectedComponents(pairs, maxIters)
    val losers = comps.filter(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Best-member near-dup removal (q_dedup_cluster_rep semantics): MinHash
    * pairs → connected components → each dup cluster keeps the member that
    * maximizes `quality` (doc_id breaks ties) instead of
    * [[dedupNearCanonical]]'s lowest-id rule — the production finisher
    * when a quality score exists (pass e.g. the LM score column; the
    * default keeps the longest doc). The rank is one `row_number` window
    * per comp — clusters are near-dup-radius-bounded, so the window is
    * skew-free; only (id, quality) rows move, never text. */
  def dedupNearKeepBest(docs: DataFrame, quality: Column = col("n_chars"),
                        threshold: Double = 0.5,
                        maxIters: Int = 50): DataFrame =
    keepBestOfClusters(docs,
      graft.ops.TextOps.minhashPairs(docs, threshold), quality, maxIters)

  /** The components + best-member rank shared by [[dedupNearKeepBest]] and
    * the signature-store path: cluster the pairs, keep the max-`quality`
    * member of each cluster (doc_id breaks ties). */
  private def keepBestOfClusters(docs: DataFrame, pairs: DataFrame,
                                 quality: Column,
                                 maxIters: Int): DataFrame = {
    val comps = graft.ops.Components.connectedComponents(
      pairs.select(col("d1"), col("d2")), maxIters)
    val w = Window.partitionBy(col("comp"))
      .orderBy(col("q").desc, col("id"))
    val losers = comps
      .join(docs.select(col("doc_id").as("id"), quality.as("q")), Seq("id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") =!= 1)
      .select(col("id").as("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Persist the MinHash signature store — the "a production pipeline
    * would persist signatures to parquet between stages" trade the scale
    * notes promise, made a real stage (r8 verdict item 1). ONE scan of
    * `docs` writes two frames under `path`:
    *  - `shingles.parquet`  (doc_id, h): the distinct 60-bit shingle
    *    digests — what the exact-Jaccard confirm joins; 16 bytes/shingle,
    *    the only corpus-sized artifact.
    *  - `signatures.parquet` (doc_id, m0..m63, n): the 64-perm signature
    *    + set size, derived FROM the persisted shingles (so text is
    *    scanned once, shingles twice-from-parquet, never text twice).
    * Every downstream near-dup consumer — the pair generator, connected
    * components' iterative rounds, the cluster-rep rank — then re-reads
    * cheap columnar parquet instead of re-running the text→shingle→digest
    * chain per action, and the store survives executor loss (unlike the
    * fixture path's localCheckpoint blocks). */
  def writeSignatureStore(docs: DataFrame, path: String): Unit = {
    graft.ops.TextOps.shingleHashes(docs)
      .write.mode("overwrite").parquet(s"$path/shingles.parquet")
    val sh = docs.sparkSession.read.parquet(s"$path/shingles.parquet")
    graft.ops.TextOps.signatureFrame(sh)
      .write.mode("overwrite").parquet(s"$path/signatures.parquet")
  }

  /** Near-dup pairs from a persisted [[writeSignatureStore]] store —
    * identical output to `TextOps.minhashPairs` on the same corpus
    * (TrainingPipelineSpec pins it), but every evaluation reads parquet
    * instead of re-deriving signatures from text. */
  def minhashPairsStored(spark: SparkSession, path: String,
                         threshold: Double,
                         bandSaltFactor: Int = 1): DataFrame =
    graft.ops.TextOps.minhashPairsFrom(
      spark.read.parquet(s"$path/signatures.parquet"),
      spark.read.parquet(s"$path/shingles.parquet"),
      threshold, bandSaltFactor)

  /** Near-dup removal in EMBEDDING space (q_dedup_embed semantics, for
    * corpora where semantic duplicates don't share surface text): sign-LSH
    * candidates — multi-table when `tables` > 1, the SCALE.md recall knob —
    * confirmed by exact cosine ≥ `minCos`, then the same one-pass
    * drop-the-higher-id rule as [[dedupNearMinHash]] (same chain
    * trade-off; [[dedupNearCanonical]]'s components approach composes here
    * too if canonical clusters are needed). Expects (doc_id, embedding)
    * columns; everything else rides along. */
  def dedupNearEmbedding(docs: DataFrame, minCos: Double = 0.95,
                         signBits: Int = 4, tables: Int = 1): DataFrame = {
    val pairs = graft.ops.PipelineOps.embedNearDupMulti(
      docs.select(col("doc_id").as("vec_id"), col("embedding")),
      signBits, tables, minCos)
    docs.join(pairs.select(col("v2").as("doc_id")).distinct(),
              Seq("doc_id"), "left_anti")
  }

  /** Language annotation: profile-vote lang-ID (shared with q_lang_id via
    * [[graft.ops.PipelineOps.predictLanguage]]), adding `pred_lang`.
    * Profiles come from `labeled` — any (lang, text) frame; the corpus
    * being annotated needs only (doc_id, text). Docs with no profile
    * overlap keep a null prediction. */
  def annotateLanguage(docs: DataFrame, labeled: DataFrame,
                       profileSize: Int = 20): DataFrame = {
    val profiles = graft.ops.PipelineOps.languageProfiles(labeled, profileSize)
    docs.join(graft.ops.PipelineOps.predictLanguage(docs, profiles),
              Seq("doc_id"), "left")
  }

  /** Sequence-packing stage (q_seq_pack semantics via
    * [[graft.ops.PipelineOps.seqPack]]'s streaming secondary sort): greedy
    * ≤`budget`-token packs per `key` in doc_id order — a doc that would
    * overflow closes the pack and seeds the next; an oversized doc gets a
    * pack of its own. Returns the collator manifest
    * (doc_id, `key`, pack_id, tok); join back on doc_id to carry text, or
    * hand it straight to the collator. Run AFTER dedup so no budget is
    * spent on docs a later stage removes. `key` defaults to lang; at
    * cluster scale pack by a finer key (shard/file id) for parallelism —
    * same operator, same boundary rule. */
  def pack(docs: DataFrame, budget: Long = 512L,
           key: String = "lang"): DataFrame =
    graft.ops.PipelineOps.seqPack(
      docs.select(col("doc_id"), col(key).cast("string").as("lang"),
                  size(split(col("text"), " ")).cast("long").as("tok")),
      budget)
      .withColumnRenamed("lang", key)

  /** Token-budget sampling stage (q_token_budget semantics via
    * [[graft.ops.PipelineOps.tokenBudgetSample]]'s two-level prefix sum):
    * keep docs in content-hash order until each lang's running token
    * total crosses `budget` — the training-mix primitive when the budget
    * is tokens, not documents (pair with [[pack]] downstream: sample the
    * budget, then pack the sample). Returns the sampled docs with their
    * manifest columns dropped — schema-stable like the other stages. */
  def sampleTokens(docs: DataFrame, budget: Long): DataFrame =
    docs.join(
      graft.ops.PipelineOps.tokenBudgetSample(docs, budget)
        .select(col("doc_id")),
      Seq("doc_id"))

  /** Chunking stage ([[graft.ops.PipelineOps.chunkDocs]], q_doc_chunk
    * semantics): fixed-token chunks with overlap for retrieval/pretraining
    * — run it LAST, on the cleaned corpus, since it multiplies token
    * volume by ~window/stride. Unlike the filter stages this changes the
    * unit of the frame: one row per (doc_id, chunk_id), text column
    * replaced by `chunk`. */
  def chunk(docs: DataFrame, window: Int = 32, stride: Int = 24): DataFrame =
    graft.ops.PipelineOps.chunkDocs(docs, window, stride)

  /** The full prep flow. `labeled` trains the language profiles (defaults
    * to the corpus itself when it carries a ground-truth `lang` column).
    * `lmDropFraction` > 0 inserts the model-based [[lmQualityFilter]]
    * between the heuristic gate and dedup; `maxDupFrac` < 1 inserts the
    * [[repetitionFilter]] boilerplate gate; `scrub` = true rewrites text
    * through [[scrubPii]] FIRST (so no later stage sees raw PII, and
    * dedup digests are computed over the scrubbed form). Cheapest-first
    * still holds: scrub is a free narrow map, heuristics are narrow, the
    * repetition/LM scores cost one token shuffle each, dedup's LSH is
    * the most expensive — each stage shrinks the next one's input.
    * Returns the cleaned, annotated corpus; persist with
    * [[graft.sources.LakeSink]] between runs at scale. Incremental
    * (per-crawl) flows run [[dedupAgainstCanon]] on the raw batch FIRST
    * — against the prior snapshot's [[contentDigests]] ledger — so
    * prepare() never pays quality/LSH work for docs the corpus already
    * holds, then append the survivors' digests to the ledger.
    * `keepBestNearDup` = true swaps the near-dup stage to
    * [[dedupNearKeepBest]] (each cluster keeps its longest doc instead of
    * dropping every pair's right side) — use when dup clusters mix
    * fragments with full documents.
    *
    * `signaturePath` non-null inserts the [[writeSignatureStore]] stage:
    * the exact-deduped corpus's MinHash signatures are persisted to
    * parquet ONCE (an eager write — the one action prepare() then takes),
    * and the near-dup stage (pair generation, connected components when
    * `keepBestNearDup`, the final anti-join) runs entirely off the store —
    * text is shingled exactly once per prepare() instead of once per
    * downstream action. Identical output to the null-path recompute
    * (TrainingPipelineSpec pins both branches); this IS the documented
    * 100 TB shape — at cluster scale point it at durable storage, not
    * `target/`. */
  def prepare(docs: DataFrame, minTokens: Int = 10,
              nearDupThreshold: Double = 0.5,
              labeled: DataFrame = null,
              lmDropFraction: Double = 0.0,
              maxDupFrac: Double = 1.0,
              scrub: Boolean = false,
              keepBestNearDup: Boolean = false,
              signaturePath: String = null): DataFrame = {
    val clean = if (scrub) scrubPii(docs) else docs
    val gated = qualityFilter(clean, minTokens)
    val unrepeated =
      if (maxDupFrac < 1.0) repetitionFilter(gated, maxDupFrac) else gated
    val scored =
      if (lmDropFraction > 0) lmQualityFilter(unrepeated, lmDropFraction)
      else unrepeated
    val exact = dedupExact(scored)
    val cleaned = Option(signaturePath) match {
      case Some(path) =>
        writeSignatureStore(exact, path)
        val pairs = minhashPairsStored(exact.sparkSession, path,
          nearDupThreshold)
        if (keepBestNearDup)
          keepBestOfClusters(exact, pairs, col("n_chars"), maxIters = 50)
        else dropPairRight(exact, pairs)
      case None =>
        if (keepBestNearDup)
          dedupNearKeepBest(exact, threshold = nearDupThreshold)
        else dedupNearMinHash(exact, nearDupThreshold)
    }
    annotateLanguage(cleaned, Option(labeled).getOrElse(docs))
  }
}
