package graft.pipeline

import org.apache.spark.sql.DataFrame
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

  /** Exact dedup: keep the lowest-id doc per md5(text). One shuffle of
    * (digest, id) — the text column never moves. */
  def dedupExact(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Near-dup removal via the MinHash LSH pipeline (q_dedup_minhash
    * semantics): of every candidate pair with exact Jaccard ≥ `threshold`,
    * the higher doc_id is dropped. Survivor set = docs minus the
    * greedily-removed right sides (deterministic: pairs are generated with
    * d1 < d2, so the smallest doc of a dup cluster always survives). */
  def dedupNearMinHash(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val pairs = graft.ops.TextOps.minhashPairs(docs, threshold)
    docs.join(pairs.select(col("d2").as("doc_id")).distinct(),
              Seq("doc_id"), "left_anti")
  }

  /** Language annotation: profile-vote lang-ID (q_lang_id semantics),
    * adding `pred_lang`. The profile table is corpus-derived and
    * broadcast; docs with no profile overlap keep a null prediction. */
  def annotateLanguage(docs: DataFrame, profileSize: Int = 20): DataFrame = {
    val words = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("word"))
    val profile = words
      .groupBy(col("lang").as("p_lang"), col("word"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p_lang")).orderBy(col("n").desc, col("word"))))
      .filter(col("rn") <= profileSize)
      .select(col("p_lang"), col("word"))
    val pred = words.select(col("doc_id"), col("word")).distinct()
      .join(broadcast(profile), Seq("word"))
      .groupBy(col("doc_id"), col("p_lang"))
      .agg(count(lit(1)).as("score"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("p_lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("p_lang").as("pred_lang"))
    docs.join(pred, Seq("doc_id"), "left")
  }

  /** The full prep flow. Returns the cleaned, annotated corpus; persist
    * with [[graft.sources.LakeSink]] between runs at scale. */
  def prepare(docs: DataFrame, minTokens: Int = 10,
              nearDupThreshold: Double = 0.5): DataFrame =
    annotateLanguage(
      dedupNearMinHash(
        dedupExact(
          qualityFilter(docs, minTokens)), nearDupThreshold))
}
