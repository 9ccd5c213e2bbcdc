package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Lake-to-lake MATERIALIZED VIEW maintenance over the graftlake change
  * feed (r17, VERDICT r16 item 6's "done" shape): tail a source table's
  * mutations as `_change_type`/`_commit_version`-tagged rows and keep a
  * destination snapshot table row-equal to the source through
  * append/DELETE/UPDATE/MERGE/overwrite — exactly what a downstream
  * consumer wants after row-level mutations, where the append-only tail
  * refuses.
  *
  * Apply discipline: each micro-batch may span several source snapshots,
  * so changes apply PER `_commit_version` IN ORDER (a key inserted then
  * updated inside one batch lands at its final value). Within one
  * version: the net deletes (delete-tagged keys not re-inserted at the
  * same version) apply as one [[SnapshotLake.delete]], then the inserts
  * apply as one keyed [[SnapshotLake.merge]] — dir-grain delete+insert
  * pairs of carried-over rows therefore net to a value-identical
  * replace. Restart-safe: a replayed batch re-applies the same steps
  * onto the already-final state, which is value-idempotent (the delete
  * matches nothing, the merge replaces equal rows); the checkpoint then
  * advances. `dst` is single-writer (the materializer), the standard MV
  * assumption.
  *
  * Change sets are COMMIT-sized, not corpus-sized: net-delete keys ride
  * the driver as an isin predicate, bounded by `maxDeleteKeysPerStep`
  * (loud failure beyond — a mutation deleting more than that per commit
  * should be re-expressed as a full-replace rebuild of the view).
  *
  * Efficiency (r18, VERDICT r17 item 6): a VALUE-NEUTRAL version — one
  * whose delete rows and insert rows are the same multiset, which is
  * exactly what compaction / z-order emit — applies ZERO mutations (no
  * dst commit, no rewrite; the two exceptAll probes are commit-sized).
  * And a consumer that needs only some columns passes `columns`: the
  * feed's SOURCE schema prunes to keys ++ columns (`feedColumns`), so
  * the projection lands inside each batch plan BEFORE the physical-RDD
  * wrap and the parquet scan itself reads only the requested width —
  * a wide-table MV moves only what it asked for, at the scan. */
object GraftLakeCdc {

  def materialize(spark: SparkSession, src: String, dst: String,
                  keys: Seq[String], checkpoint: String,
                  maxDeleteKeysPerStep: Int = 1000000,
                  columns: Seq[String] = Nil): StreamingQuery = {
    require(keys.nonEmpty, "materialize needs at least one key column")
    val reader = spark.readStream.format("graftlake")
      .option("changeFeed", "true")
    val feed =
      if (columns.isEmpty) reader.load(src)
      else reader.option("feedColumns",
        (keys ++ columns).distinct.mkString(",")).load(src)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        applyBatch(batch, dst, keys, maxDeleteKeysPerStep)
      }
      .start()
  }

  private[graft] def applyBatch(batch: Dataset[Row], dst: String,
                                keys: Seq[String],
                                maxDeleteKeys: Int): Unit = {
    val spark = batch.sparkSession
    // one evaluation feeds the version walk and every per-step frame
    val b = batch.localCheckpoint()
    val versions = b.select(col("_commit_version")).distinct()
      .collect().map(_.getLong(0)).sorted
    versions.foreach { v =>
      val step = b.filter(col("_commit_version") === v)
      val inserts = step.filter(col("_change_type") === "insert")
        .drop("_change_type", "_commit_version")
      val deletes = step.filter(col("_change_type") === "delete")
        .drop("_change_type", "_commit_version")
      // value-neutral version (compaction, z-order, any rewrite that
      // changed no values): the delete and insert multisets coincide —
      // applying would be a value-identical replace of every carried
      // row, so skip the version outright (r18)
      if (deletes.exceptAll(inserts).isEmpty &&
          inserts.exceptAll(deletes).isEmpty) {
        // zero mutations, zero dst commits
      } else applyStep(spark, v, inserts, deletes, dst, keys, maxDeleteKeys)
    }
  }

  private def applyStep(spark: SparkSession, v: Long, inserts: DataFrame,
                        deletes: DataFrame, dst: String, keys: Seq[String],
                        maxDeleteKeys: Int): Unit = {
      val netDeleteKeys = deletes
        .select(keys.map(col): _*)
        .except(inserts.select(keys.map(col): _*))
      val delRows = netDeleteKeys.limit(maxDeleteKeys + 1).collect()
      require(delRows.length <= maxDeleteKeys,
        s"change step $v of $dst nets more than $maxDeleteKeys deleted " +
        "keys — rebuild the view with a full-replace instead")
      if (delRows.nonEmpty) {
        val pred = delRows.toSeq.map(r =>
          keys.zipWithIndex.map { case (k, i) =>
            col(k) <=> lit(r.get(i))
          }.reduce(_ && _)).reduce(_ || _)
        SnapshotLake.delete(spark, dst, pred).getOrElse(
          throw new IllegalStateException(
            s"concurrent writer on MV $dst (delete step $v) — the " +
            "materializer must be the view's only writer"))
      }
      if (!inserts.isEmpty) {
        if (SnapshotLake.latest(spark, dst).isEmpty)
          SnapshotLake.commit(inserts, dst, append = true)
        else
          SnapshotLake.merge(spark, dst, inserts, keys).getOrElse(
            throw new IllegalStateException(
              s"concurrent writer on MV $dst (merge step $v) — the " +
              "materializer must be the view's only writer"))
      }
  }
}
