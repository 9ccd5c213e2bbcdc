package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftShim, SQLContext, SaveMode,
  SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  InMemoryFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{BaseRelation,
  CreatableRelationProvider, DataSourceRegister, RelationProvider,
  StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graftlake")` — the DataSource V2-era SQL surface of
  * [[SnapshotLake]] (r16, VERDICT r15 item 9): time travel and incremental
  * reads become `spark.read` options (and `CREATE ... USING graftlake`
  * DDL) instead of object-API calls, so the lake is queryable like every
  * other source in the engine.
  *
  * Options:
  *  - `path` (or `.load(<table root>)`) — the SnapshotLake table root;
  *  - `snapshotId` — time travel: read the table exactly as of that
  *    committed snapshot (default: latest). Byte-stable under later
  *    commits, exactly [[SnapshotLake.readAt]];
  *  - `sinceSnapshotId` — incremental: only the data directories added in
  *    `(since, snapshotId]`, exactly [[SnapshotLake.readIncremental]].
  *
  * Architecture — DELEGATION, not a reader (the lakehouse-format shape
  * Delta/Iceberg use on Spark): the manifest resolves to a data-directory
  * list, which backs Spark's own `HadoopFsRelation` + `ParquetFileFormat`
  * through an `InMemoryFileIndex` rooted at EXACTLY the manifest's
  * directories. Everything the built-in parquet source does — vectorized
  * reads, whole-stage codegen, filter pushdown to row-group stats, column
  * pruning, file-split parallelism — applies unchanged, while the
  * manifest (not a directory listing) decides which files exist: orphaned
  * compaction dirs and in-flight writers are invisible, identically to
  * the object API. At 100 TB the planning cost is manifest-sized, and a
  * z-ordered table's file envelopes prune through the same pushed
  * predicates as any parquet scan (GraftLakeProviderSpec probes both).
  *
  * Schema evolution: additive `addColumn` directives apply natively — the
  * scan schema is the directive-applied snapshot schema, and Spark's
  * parquet reader null-fills a requested column absent from a file (the
  * same by-name resolution `mergeSchema` reads rely on), so pre-evolution
  * directories read the new column as typed NULL and post-evolution
  * appends read through. `renameColumn` directives are REFUSED loudly:
  * rename-by-mapping needs the coalesce(new, old) projection of
  * [[SnapshotLake.applyDirectives]], which a bare file relation cannot
  * express — a name-based format needs parquet field ids (the
  * Delta/Iceberg column-mapping technique) to push renames into the scan,
  * and silently dropping pre-rename data would be corruption, not
  * degradation. `readAt` remains the full-fidelity reader for renamed
  * tables.
  *
  * Write path (r16, the read path's completion): the same short name is a
  * batch sink and a streaming sink, both delegating to the manifest-CAS
  * commit protocol — every `save` is ONE atomic snapshot (readers see
  * old-or-new, never a partial directory) and `overwrite` is the atomic
  * full-replace that plain parquet `mode("overwrite")` cannot give:
  *  - `df.write.format("graftlake").mode(m).save(table)` — `append` →
  *    [[SnapshotLake.commit]](append = true); `overwrite` → full-replace
  *    commit; `errorifexists` / `ignore` key off an existing COMMITTED
  *    snapshot (an orphaned data dir from a crashed writer does not
  *    count — manifests are the source of truth);
  *  - `ds.writeStream.format("graftlake").option("checkpointLocation",
  *    cp).start(table)` — each micro-batch commits through
  *    [[SnapshotLake.commitIdempotent]] keyed on the batchId: the
  *    exactly-once discipline of [[SnapshotLake.streamWriter]] behind the
  *    format-level API (a restart's replayed batch is a recorded no-op,
  *    a crashed half-write is healed and rewritten). Append output mode
  *    only — Complete/Update re-emit updated result rows, which an
  *    append-only snapshot history would duplicate, so they are refused
  *    at start.
  *  - option `maxRecordsPerFile` bounds written file sizes (default 1M).
  */
class GraftLakeProvider extends RelationProvider
    with CreatableRelationProvider with StreamSinkProvider
    with StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graftlake"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String])
      : BaseRelation = {
    val spark = sqlContext.sparkSession
    val table = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graftlake needs a table root: .load(<table>) or option(\"path\", ...)"))
    val latest = SnapshotLake.latest(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"no committed snapshot at $table"))
    val snap = parameters.get("snapshotId").map(_.trim.toLong)
      .getOrElse(latest)
    val directives = SnapshotLake.manifestDirectives(spark, table, snap)
    val renames = directives.filter(_.split("\t")(1) == "rename")
    require(renames.isEmpty,
      s"graftlake cannot scan a rename-evolved snapshot (directives: " +
      s"${renames.mkString("; ")}) — rename-by-mapping needs the " +
      "coalesce projection of SnapshotLake.readAt; use that API for " +
      "renamed tables")
    val (dirs, schema) = parameters.get("sinceSnapshotId")
        .map(_.trim.toLong) match {
      case None =>
        // directive-applied schema: adds surface as typed NULLs wherever
        // no file carries them (parquet by-name resolution)
        (SnapshotLake.manifestDirs(spark, table, snap),
         SnapshotLake.readAt(spark, table, snap).schema)
      case Some(since) =>
        require(since <= snap, s"sinceSnapshotId $since > snapshotId $snap")
        val delta = SnapshotLake.manifestDirs(spark, table, snap)
          .diff(SnapshotLake.manifestDirs(spark, table, since))
        // mirror readIncremental: raw merged schema of the NEW dirs only
        // (no directives — the delta is change-feed grain, not the table)
        (delta,
         if (delta.isEmpty) StructType(Nil)
         else spark.read.option("mergeSchema", "true")
           .parquet(delta: _*).schema)
    }
    val index = new InMemoryFileIndex(spark, dirs.map(new Path(_)),
      Map.empty[String, String], Some(schema))
    HadoopFsRelation(
      location = index,
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty[String, String])(spark)
  }

  private def maxRecs(parameters: Map[String, String]): Long =
    parameters.get("maxRecordsPerFile").map(_.trim.toLong)
      .getOrElse(1000000L)

  /** Batch write: `df.write.format("graftlake").mode(m).save(table)`. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val table = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graftlake needs a table root: .save(<table>) or option(\"path\", ...)"))
    val exists = SnapshotLake.latest(spark, table).isDefined
    mode match {
      case SaveMode.Append =>
        SnapshotLake.commit(data, table, append = true, maxRecs(parameters))
      case SaveMode.Overwrite =>
        // atomic full replace: old snapshots stay time-travelable
        SnapshotLake.commit(data, table, append = false, maxRecs(parameters))
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"graftlake table at $table already has committed snapshots " +
          "(mode errorifexists)")
      case SaveMode.Ignore if exists => // recorded no-op
      case _ => // ErrorIfExists/Ignore on an empty table root: first commit
        SnapshotLake.commit(data, table, append = true, maxRecs(parameters))
    }
    // The returned relation only carries the written schema (CTAS reads
    // it for the catalog entry). Deliberately NOT the read relation: a
    // legitimate append to a rename-evolved table would otherwise throw
    // AFTER its commit landed, from the reader's rename refusal.
    new BaseRelation {
      override def sqlContext: SQLContext = spark.sqlContext
      override def schema: StructType = data.schema
    }
  }

  /** Streaming sink: exactly-once micro-batch commits keyed on batchId —
    * `SnapshotLake.streamWriter`'s discipline behind
    * `writeStream.format("graftlake")`. */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val table = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graftlake needs a table root: .start(<table>) or option(\"path\", ...)"))
    require(outputMode == OutputMode.Append(),
      s"graftlake is an append-only snapshot history; output mode " +
      s"$outputMode would re-emit updated rows as duplicates — use " +
      "append mode (aggregate with a watermark so results finalize)")
    require(partitionColumns.isEmpty,
      "graftlake does not lay data out by partition columns; " +
      "use compactZOrder for layout")
    val bound = maxRecs(parameters)
    new Sink {
      override def addBatch(batchId: Long,
                            data: org.apache.spark.sql.DataFrame): Unit = {
        // re-materialize over the already-planned physical RDD — the
        // incoming frame is a streaming micro-batch a fresh batch query
        // could not re-plan (and must not re-read)
        SnapshotLake.commitIdempotent(GraftShim.rematerialize(data), table,
          s"batch-$batchId", bound)
        ()
      }
      override def name(): String = s"graftlake[$table]"
    }
  }

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graftlake needs a table root: .load(<table>) or option(\"path\", ...)"))

  /** Streaming-source schema: fixed at query start to the latest
    * snapshot's directive-applied schema (the FileStreamSource
    * discipline — a mid-stream ALTER does not reshape a running query;
    * restart to pick it up). Rename-evolved tables refuse, same as the
    * batch relation. */
  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    val spark = sqlContext.sparkSession
    val table = tableOf(parameters)
    val s = schema.getOrElse {
      val latest = SnapshotLake.latest(spark, table).getOrElse(
        throw new IllegalArgumentException(
          s"no committed snapshot at $table to infer a stream schema " +
          "from — commit one first or pass .schema(...)"))
      val renames = SnapshotLake.manifestDirectives(spark, table, latest)
        .filter(_.split("\t")(1) == "rename")
      require(renames.isEmpty,
        "graftlake streams cannot tail a rename-evolved table " +
        s"(directives: ${renames.mkString("; ")}) — the delta dirs are " +
        "raw physical names; use SnapshotLake.readAt for renamed tables")
      SnapshotLake.readAt(spark, table, latest).schema
    }
    (shortName(), s)
  }

  /** `spark.readStream.format("graftlake").load(table)` — tail the
    * snapshot history as a micro-batch stream: offset = committed
    * snapshot id (dense, CAS-allocated), each micro-batch = the data
    * directories added in `(lastOffset, newOffset]`, exactly the
    * [[SnapshotLake.readIncremental]] delta. Options:
    *  - `startingSnapshotId` (default 0): tail AFTER this snapshot —
    *    0 replays the whole table as the first batch (a backfill),
    *    `latest-at-start` skips history;
    *  - `maxSnapshotsPerTrigger`: rate limit — a restart facing a deep
    *    backlog catches up over several bounded micro-batches instead
    *    of one giant one (each capped batch is still a committed-
    *    snapshot boundary, so a mid-catchup crash resumes cleanly).
    * Append-only histories only: a full-replace / compact / DELETE in
    * the tailed range rewrites old rows into new dirs, which a dir-diff
    * would re-emit as inserts — the source FAILS LOUDLY when it sees
    * dirs disappear rather than emit duplicates (the readIncremental
    * caveat, enforced). An [[SnapshotLake.expire]]d start offset also
    * fails loudly (manifest gone), like a Kafka out-of-range offset. */
  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val table = tableOf(parameters)
    val resolved = sourceSchema(sqlContext, schema, providerName,
      parameters)._2
    // `latest-at-start` resolves ONCE, at source construction (r16 advisor
    // item: it was documented but fell through to toLong and crashed) —
    // the offset it pins is what "skip history" means for this query.
    val start0 = parameters.get("startingSnapshotId").map(_.trim) match {
      case Some("latest-at-start") =>
        SnapshotLake.latest(spark, table).getOrElse(0L)
      case Some(s) => s.toLong
      case None => 0L
    }
    val maxPerTrigger = parameters.get("maxSnapshotsPerTrigger")
      .map(_.trim.toLong)
    maxPerTrigger.foreach(m => require(m >= 1,
      s"maxSnapshotsPerTrigger must be >= 1, got $m"))
    new GraftLakeSource(spark, table, resolved, start0, maxPerTrigger)
  }
}

/** The V1 micro-batch source behind `readStream.format("graftlake")` —
  * see [[GraftLakeProvider.createSource]] for the contract. */
private[graft] class GraftLakeSource(spark: SparkSession, table: String,
                                     override val schema: StructType,
                                     start0: Long,
                                     maxPerTrigger: Option[Long])
    extends Source {

  // the highest offset this source has HANDED OUT (not necessarily
  // processed) — rate limiting advances from here; recovered from the
  // checkpoint via getBatch's start on restart
  private var lastEnd: Long = start0

  private def offId(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getOffset: Option[Offset] = {
    val latest = SnapshotLake.latest(spark, table).getOrElse(return None)
    if (latest <= lastEnd) return Some(LongOffset(lastEnd))
    // snapshot ids are dense (CAS allocates base+1), so a cap is itself
    // a committed snapshot boundary
    val end = maxPerTrigger.map(m => math.min(latest, lastEnd + m))
      .getOrElse(latest)
    lastEnd = end
    Some(LongOffset(end))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromId = start.map(offId).getOrElse(start0)
    val endId = offId(end)
    lastEnd = math.max(lastEnd, endId) // restart: resume pacing from here
    if (endId <= fromId) return GraftShim.emptyStreamingDF(spark, schema)
    val fromDirs =
      if (fromId == 0L) Seq.empty[String]
      else SnapshotLake.manifestDirs(spark, table, fromId)
    val endDirs = SnapshotLake.manifestDirs(spark, table, endId)
    val removed = fromDirs.diff(endDirs)
    require(removed.isEmpty,
      s"graftlake stream over $table saw data dirs disappear between " +
      s"snapshots $fromId and $endId (${removed.mkString(", ")}) — a " +
      "full-replace/compact/DELETE landed in the tailed range; this " +
      "source tails APPEND-ONLY histories (re-emitting rewritten rows " +
      "would duplicate them downstream)")
    val newDirs = endDirs.diff(fromDirs)
    if (newDirs.isEmpty) return GraftShim.emptyStreamingDF(spark, schema)
    val raw = spark.read.option("mergeSchema", "true").parquet(newDirs: _*)
    // align every batch to the query-start schema: absent columns (delta
    // dirs predating an addColumn's first carrying write) read as typed
    // NULL, extra columns (a mid-stream ALTER) are dropped until restart
    val aligned = raw.select(schema.fields.map { f =>
      if (raw.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    GraftShim.asStreamingDF(aligned)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftLakeSource[$table]"
}
