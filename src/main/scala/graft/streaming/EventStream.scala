package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, StreamingQuery, Trigger}

/** Structured-Streaming twin of the reference's ingestion surface
  * (SURVEY.md §2.9): file-arrival auto-ingest with exactly-once
  * offsets + archive (Snowpipe-style, README.md:29,43-44), bounded
  * stateful dedup across batches (README.md:51), and the event-time
  * tumbling rollup whose batch twin is q19.
  *
  * Scale notes: the file source checkpoints offsets (exactly-once
  * across restarts); dedup state is watermark-bounded (never grows
  * past the lateness horizon); `Trigger.AvailableNow` drains whatever
  * has arrived and stops — the reference's scheduled-batch cadence
  * (ST1) on streaming semantics.
  */
object EventStream {

  /** Events file stream with `ts` normalized to micro-precision
    * timestamps — the same generation detection as the batch reader
    * (Tables.eventsTsType: one footer read against whatever has
    * arrived in `srcDir`), because a file stream must declare its schema up
    * front and the driver's stored `ts` type has already changed once
    * (NANOS → MICROS-NTZ). An empty source dir falls back to the
    * current driver convention (MICROS-NTZ); NANOS-generation sources
    * additionally need the session's nanosAsLong conf, as in batch. */
  private def readEvents(spark: SparkSession, srcDir: String,
      archiveDir: Option[String]): DataFrame = {
    // Only schema-inference failure (empty source dir) falls back to
    // the current driver convention — I/O and permission errors must
    // propagate. A NANOS-generation producer writing into a dir that
    // was empty at start() would be READ under the fallback schema for
    // the stream's whole lifetime; [[guardFallbackTs]] turns that from
    // a silent misread into a first-batch failure with an explicit
    // generation-mismatch error (the batch reader always detects
    // per-file, so only the fallback path needs the guard).
    // missing dir surfaces as FileNotFoundException (from the stat
    // inside eventsTsType), empty dir as AnalysisException (schema
    // inference) — both are the documented fallback; everything else
    // (permissions, I/O) propagates
    val detected =
      try Some(Tables.eventsTsType(spark, srcDir))
      catch {
        case _: org.apache.spark.sql.AnalysisException |
            _: java.io.FileNotFoundException => None
      }
    val dt = detected.getOrElse(org.apache.spark.sql.types.TimestampNTZType)
    val base = spark.readStream.schema(Tables.eventsSchemaFor(dt))
    val withArchive = archiveDir match {
      // ST3: consumed files move aside once processed — the streaming
      // twin of the batch to_processed -> already_processed rename.
      case Some(dir) => base.option("cleanSource", "archive")
        .option("sourceArchiveDir", dir)
      case None => base
    }
    val normalized = Tables.normalizeEventTs(withArchive.parquet(srcDir), dt)
    if (detected.isEmpty) guardFallbackTs(normalized) else normalized
  }

  /** Fail-fast for the empty-dir fallback (ADVICE r9): the stream's
    * schema is frozen at start(), so a NANOS-generation producer that
    * begins writing AFTER start() has its int64 nanos decoded as
    * micros — timestamps ~1000× in the future (year ≳ 56,000). Rather
    * than relying on the operator reading the scaladoc, the first
    * micro-batch that decodes such a value fails the query with an
    * explicit generation-mismatch error naming the fix (restart, so
    * the stored type is re-detected). The year-3000 pivot cannot
    * misfire on a genuine micros producer, and a mis-declared NANOS
    * source cannot slip under it: any post-1971 nanos value decodes
    * past year 3000. Applied ONLY on the fallback path — detected
    * streams carry no extra expression. */
  private[graft] def guardFallbackTs(df: DataFrame): DataFrame =
    df.withColumn("ts",
      when(col("ts") >= lit("3000-01-01 00:00:00").cast("timestamp"),
        raise_error(concat(
          lit("graft: events ts generation mismatch — the source dir was " +
            "empty at stream start so the schema fell back to MICROS-NTZ, " +
            "but a read value decodes to "),
          col("ts").cast("string"),
          lit(" (a NANOS-generation producer began writing after start). " +
            "Restart the stream so the stored type is re-detected.")))
          .cast("timestamp"))
        .otherwise(col("ts")))

  /** ST2+ST3+ST4: checkpointed ingest with watermark-bounded dedup on
    * event_id, appending parquet to `outDir`. Re-delivered events
    * within the 24h lateness horizon are dropped exactly once; state
    * is bounded by the watermark. */
  def dedupIngest(spark: SparkSession, srcDir: String, checkpointDir: String,
      outDir: String, archiveDir: Option[String] = None): StreamingQuery =
    readEvents(spark, srcDir, archiveDir)
      .withWatermark("ts", "24 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(outDir)

  /** Incremental paged-endpoint ingest — the streaming leg of the
    * `graft-pages` connector (sources/PageSource.scala), completing
    * its lifecycle (batch read / pushdown / streaming ingest). The
    * endpoint keeps appending pages; the stream's OFFSET IS THE PAGE
    * ID (a paged API's `next` cursor), each AvailableNow drain
    * delivers exactly the pages that arrived since the committed
    * cursor, and the cursor survives restarts in the checkpoint — so
    * the union of deliveries ≡ the batch connector read of the same
    * pages, with no page ever re-delivered (StreamingSpec pins both
    * across a restart). Arrival contract is keyset-append: page ids
    * grow monotonically; see [[graft.sources.PageMicroBatchStream]]. */
  def pagesIngest(spark: SparkSession, pagesDir: String, checkpointDir: String,
      outDir: String): StreamingQuery =
    spark.readStream.format("graft-pages")
      .option("path", pagesDir)
      .option("schema", graft.sources.PageSource.DDL)
      .load()
      .writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(outDir)

  /** Streaming corpus ingest with cross-batch EXACT dedup by content
    * fingerprint — the streaming twin of the batch x20/x21 dedup
    * family: documents arrive as files (crawl drops), re-crawled
    * identical content is emitted exactly once, first arrival wins,
    * and the fingerprint state survives restarts via the checkpoint.
    *
    * State is BOUNDED in two tiers (exact corpus dedup has no
    * event-time horizon after which a re-crawl may re-emit, so a naive
    * dropDuplicates holds every fingerprint forever — 16 bytes/doc of
    * state store growing without bound):
    *   - RECENT tier: an ingest-time watermark +
    *     dropDuplicatesWithinWatermark bounds the state store to the
    *     last `stateHorizon` of arrivals (ingest time is the batch
    *     timestamp — deterministic on retry);
    *   - COMPACTED tier: fingerprints older than the horizon live in a
    *     shard-partitioned parquet table maintained by
    *     [[compactCorpusFingerprints]] and consulted via a
    *     stream-static LEFT ANTI join (static side on the right — the
    *     supported shape). Columnar at rest, nothing in the state
    *     store.
    * CADENCE CONTRACT: compaction must run at least once per
    * `stateHorizon` (while the AvailableNow drain is idle — the
    * overwrite must not race a running trigger), and the ingest query
    * restarts after compaction so the refreshed static side is picked
    * up. A fingerprint is then always covered by at least one tier:
    * in-horizon re-crawls hit the state store, older ones hit the
    * compacted table.
    *
    * `compactedFpDir = None` (or a not-yet-created dir) degrades to
    * state-only dedup — correct until the first horizon expiry, which
    * is exactly the window the cadence contract closes. */
  def corpusDedupIngest(spark: SparkSession, srcDir: String, checkpointDir: String,
      outDir: String, compactedFpDir: Option[String] = None,
      stateHorizon: String = "24 hours"): StreamingQuery = {
    val recent = spark.readStream.schema(Tables.schemas("documents")).parquet(srcDir)
      .withColumn("fp", md5(col("text")))
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", stateHorizon)
      .dropDuplicatesWithinWatermark("fp")
    // existence probe through the Hadoop filesystem of the PATH (not
    // java.nio): a remote compacted table (hdfs://, s3a://) must enable
    // the tier, not silently degrade to state-only dedup
    def tableExists(dir: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    val survivors = compactedFpDir.filter(tableExists) match {
      case Some(dir) =>
        // static side re-resolved at query (re)start — the compaction
        // cadence restarts the drain, so each run sees the fresh table
        recent.join(spark.read.parquet(dir).select("fp"), Seq("fp"), "left_anti")
      case None => recent
    }
    survivors.drop("ingest_ts")
      .writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(outDir)
  }

  /** Streaming UPSERT into the transactional keyed table (r17) — the
    * reference's incremental-load semantics
    * (`/root/reference/README.md:51`, "only new/updated tracks") as a
    * STANDING stream: each micro-batch of document versions MERGEs
    * into a graft-keyed catalog table by primary key (matched →
    * update, not matched → insert), through whichever physical
    * strategy the table declares (`dmlMode` — COW directory rewrite or
    * MOR deletion vectors + appends).
    *
    * Delivery contract, stated honestly: the file source's checkpoint
    * means a completed batch is never re-read; a batch replayed across
    * the foreachBatch/commit crash window re-runs its MERGE, which is
    * IDEMPOTENT for upserts — the previously-inserted rows now MATCH
    * and update in place to the same values — so the table converges
    * to exactly-once CONTENT while the replay burns one extra snapshot
    * (at-least-once commits, exactly-once state: the
    * foreachBatch-merge discipline; the epoch-marker exactly-once
    * path is the plain APPEND sink, [[graft.sources.KeyedStreamingWrite]]).
    * Inside a batch, LATEST WINS deterministically: versions pre-dedup
    * per key on (`versionCol` desc, full column tiebreak) before the
    * MERGE, which refuses multiple source matches per target row. */
  def keyedUpsertIngest(spark: SparkSession, srcDir: String,
      checkpointDir: String, table: String,
      pk: String = "doc_id", versionCol: String = "n_chars"): StreamingQuery = {
    val src = spark.readStream.schema(Tables.schemas("documents")).parquet(srcDir)
      .selectExpr("doc_id % 16 AS kb", "doc_id", "n_chars")
    src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val others = batch.columns.filterNot(c => c == pk || c == versionCol)
        val deduped = batch.withColumn("_rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(pk)
            .orderBy((col(versionCol).desc +: others.map(col(_).desc)): _*)))
          .where(col("_rn") === 1).drop("_rn")
        val view = s"graft_upsert_src_${math.abs(table.hashCode)}"
        deduped.createOrReplaceTempView(view)
        s.sql(
          s"""MERGE INTO $table AS t USING $view AS src
             |ON t.$pk = src.$pk
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming twin of the x74/x75 incremental index append — the
    * production loop those queries imply: new embeddings arrive as
    * files, each micro-batch is assigned map-side via the caller's
    * `assign` (scoring against the FROZEN quantizer — index metadata
    * riding the closure; retrain stays a deliberate batch event), and
    * the assigned rows are appended to the bucketed index table under
    * its existing spec ([[graft.io.Bucketing.appendBucketed]]): new
    * per-bucket files, base untouched, downstream zero-Exchange probes
    * undisturbed.
    *
    * Delivery contract: EXACTLY-ONCE, with no heal required (r10
    * verdict #4). The file source checkpoints offsets, so a completed
    * batch is never RE-READ across restarts; within a batch, delivery
    * is [[graft.io.Bucketing.publishBucketedBatch]]'s
    * write-audit-publish — the batch stages as hidden bucket files
    * inside the table location, is audited by read-back count, lands
    * via one atomic rename into its `ingest_batch=<id>` generation
    * directory, and becomes VISIBLE only at the idempotent partition
    * registration. A crash at ANY point (mid-stage, post-stage,
    * post-rename) leaves either an invisible dot-dir the replay
    * re-stages or an unregistered generation the replay registers —
    * never a partial batch, never a doubled one, with no marker file
    * and no compaction heal in the contract (compact(dedupBy) remains
    * for the plain-append BATCH maintenance path). The table is
    * migrated into the ingest layout once, before the stream starts
    * (existing rows become the `ingest_batch=-1` base generation —
    * same bucket spec, so downstream zero-Exchange probes are
    * undisturbed; StreamingSpec pins the plan). StreamingSpec also
    * kills the writer between stage and publish and shows the index
    * never exposes a partial or doubled batch.
    *
    * Generic over the index kind via (`assign`, `key`, `buckets`):
    * the IVF defaults append (…, cid) rows bucketed by cid; the PQ
    * twin (x75's loop) passes the frozen-codebook encode
    * (Curation.pqFrozenEncode) with key = vec_id, buckets = 8 —
    * identical delivery contract, different payload. */
  def ivfStreamingAppend(spark: SparkSession, srcDir: String,
      checkpointDir: String, table: String, assign: DataFrame => DataFrame,
      key: String = "cid", buckets: Int = 16,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    // one-time layout migration, BEFORE the stream starts (driver-side
    // maintenance, crash-healed via the __compacting convention)
    graft.io.Bucketing.ensureIngestLayout(spark, table, key, buckets,
      sorted = false)
    val batches = spark.readStream
      .schema(Tables.schemas("embeddings"))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.io.Bucketing.publishBucketedBatch(
          batch.sparkSession, assign(batch), table, key, buckets, id)
        // the publish ran in the micro-batch's CLONED session; drop
        // the caller session's cached file listing so its next read
        // sees the new generation (other sessions refresh on their
        // own cadence — standard catalog-cache semantics)
        spark.catalog.refreshTable(table)
      }
      .start()
  }

  /** Streaming decontamination gate — x79's stream-side twin, the
    * frozen-state pattern of [[ivfStreamingAppend]] applied to the
    * eval-set bloom: newly crawled documents are flagged MAP-SIDE
    * against FROZEN benchmark bloom bytes (built once in batch by
    * `LlmData.decontamBloom`, closed over as a literal). The gate is
    * STATELESS — no state store, no watermark — so restarts replay
    * committed offsets only and any trigger cadence works. It emits
    * SUSPECTS: docs sharing ≥1 bloom-positive shingle. No false
    * negatives ever (a contaminated doc always surfaces); the
    * fpp-bounded overcount is settled downstream by x79's exact
    * confirm join over the tiny suspect slice. At 100 TB this is the
    * shape that keeps decontamination OFF the ingest critical path:
    * bytes broadcast to every task, no join, no shuffle in-stream. */
  def decontamGate(spark: SparkSession, srcDir: String, checkpointDir: String,
      bloom: Array[Byte], outDir: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val docs = spark.readStream
      .schema(Tables.schemas("documents"))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    graft.operators.LlmData.withShingles(docs)
      .filter(graft.operators.LlmData.bloomSuspect(bloom))
      .select("doc_id", "lang", "source")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** x88's stream-side twin — the frozen-state pattern of
    * [[decontamGate]] applied to the corpus quality histogram: every
    * micro-batch of newly crawled documents is binned MAP-SIDE (the
    * same `sourceBinCounts` scan as the batch query) and its
    * per-source histogram is scored against a FROZEN reference
    * (bin → count, total) closed over as literals — index-metadata
    * scale (≤ 11 bins), the same driver-bound argument as the trained
    * centroids. Emits one (source, n_docs, drift) row set per
    * micro-batch into its own `batch_id=<id>` partition directory
    * with OVERWRITE semantics — a replayed batch (crash after the
    * write committed, before the skip-marker landed) rewrites the
    * same deterministic rows into the same directory instead of
    * double-appending, so idempotence holds without a transactional
    * table format; the marker only skips recomputation on the happy
    * path. Nothing is stateful in-stream (no state store, no watermark):
    * the composition monitor a 100 TB ingest runs per drop, off the
    * critical path, with only dimension-sized aggregates ever
    * shuffled. Drift math is ONE definition with the oracle-checked
    * x88 (`LlmData.sourceDriftAgainst`). */
  def qualityDriftGate(spark: SparkSession, srcDir: String,
      checkpointDir: String, outDir: String,
      refBins: Seq[(Long, Long)], refTotal: Long,
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    perBatchGate(spark, srcDir, checkpointDir, outDir,
      maxFilesPerTrigger) { batch =>
      val s = batch.sparkSession
      import s.implicits._
      graft.operators.LlmData.sourceDriftAgainst(
        graft.operators.LlmData.sourceBinCounts(batch),
        refBins.toDF("bin", "cb"), Seq(refTotal).toDF("t"))
    }

  /** Streaming twin of x93 — mixture-composition drift of each
    * micro-batch against the frozen training-mixture targets (ONE
    * weight definition with x53/x78/x93: `LlmData.mixtureShareDrift`).
    * Completes the mixture family's monitoring leg: x53 plans the
    * budget, x78 orders the stream, x82 derives weights, x93/this
    * gate watch the realized composition per ingest drop. */
  def mixtureDriftGate(spark: SparkSession, srcDir: String,
      checkpointDir: String, outDir: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    perBatchGate(spark, srcDir, checkpointDir, outDir,
      maxFilesPerTrigger)(graft.operators.LlmData.mixtureShareDrift)

  /** Streaming near-dup ingest gate: every arriving micro-batch is
    * verdicted (exact_dup / near_dup / new) against the FROZEN corpus
    * dedup index — x101's three bucketed catalog tables built once
    * over `corpusDir` — through the ONE probe definition the batch
    * query registers (LlmData.indexProbeVerdicts), so batch and
    * stream can never verdict a document differently. This is the
    * near-dup tier [[corpusDedupIngest]] lacks: that gate dedups by
    * exact content digest (state store + compacted table); this one
    * additionally catches band-key neighbors at Jaccard ≥ 0.8.
    * Per-batch output (doc_id, verdict, batch_id) lands under the
    * idempotent overwrite-per-batch contract of [[perBatchGate]]
    * (batch-SIZED rather than dimension-sized — the contract only
    * needs the per-batch directory to be rewrite-stable, which a
    * deterministic verdict list is); downstream keeps verdict='new'.
    * Index GROWTH is maintenance, not gate work: append accepted docs
    * via Bucketing.appendBucketed + compact on the x74 cadence and
    * restart the drain, exactly the corpusDedupIngest compaction
    * story. */
  def nearDupIngestGate(spark: SparkSession, srcDir: String,
      checkpointDir: String, outDir: String, corpusDir: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    // Frozen state built ONCE with the long-lived OUTER session,
    // BEFORE the stream starts (the decontamGate frozen-bloom
    // pattern). foreachBatch hands a per-run cloneSession(); the
    // identity-keyed memos miss on it, so building in-closure would
    // re-hash the corpus and re-Overwrite all three index tables on
    // every (re)start — the exact per-ingest corpus cost the probe
    // design exists to avoid — while dead-clone registry entries pin
    // persisted frames until the context stops.
    val (fpT, bandT, sigT) =
      graft.operators.LlmData.fullDedupIndexTables(spark, corpusDir)
    perBatchGate(spark, srcDir, checkpointDir, outDir, maxFilesPerTrigger) {
      batch =>
        graft.operators.LlmData.indexProbeVerdicts(spark, batch,
          graft.operators.LlmData.hashedSignatures(batch), fpT, bandT, sigT)
    }
  }

  /** Streaming importance scorer: every arriving micro-batch is
    * weighted by the FROZEN x98 ratio table trained once over
    * `corpusDir` (the memoized 256-row model — the decontamGate
    * frozen-bloom pattern applied to DSIR), through the ONE scoring
    * definition the batch query registers (LlmData.dsirScore). The
    * production selection loop this enables: train the ratio table on
    * the curated corpus, score every crawl batch as it lands, keep
    * what clears the bar — without re-reading the corpus per batch
    * (per-batch work is batch tokens × a broadcast 256-row join).
    * Retraining on a grown corpus is maintenance: clearMemo (or a
    * corpus regeneration, which the memo stamp detects) and restart
    * the drain. */
  def dsirScoreGate(spark: SparkSession, srcDir: String,
      checkpointDir: String, outDir: String, corpusDir: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    // trained ONCE with the OUTER session before start() — see
    // nearDupIngestGate's clone-session note; the 256-row model is
    // then shared with the registered x98 query's memo entry instead
    // of retrained per stream (re)start.
    val ratio = graft.operators.LlmData.dsirRatioTable(spark, corpusDir)
    perBatchGate(spark, srcDir, checkpointDir, outDir, maxFilesPerTrigger) {
      batch =>
        graft.operators.LlmData.dsirScore(batch, ratio).orderBy("doc_id")
    }
  }

  /** Streaming BM25 serve/triage gate — the retrieval twin of
    * [[dsirScoreGate]]'s train-once/score-many shape: each arriving
    * micro-batch of documents is scored under the FROZEN corpus
    * retrieval model (x104's 6-row df table + corpus scalars, both
    * broadcast) and triaged against the frozen top-k admission floor,
    * so the gate answers "would an index refresh surface this doc for
    * the standing query?" at per-batch cost = batch tokens — zero
    * corpus re-reads after the memoized staging builds once. A doc
    * containing no query term scores 0 by definition and is not
    * emitted (its tf staging is empty — the scorer's documented
    * contract, unlike dsir where every token carries evidence).
    * Same idempotent per-batch overwrite delivery as every gate here. */
  def bm25ServeGate(spark: SparkSession, srcDir: String,
      checkpointDir: String, outDir: String, corpusDir: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    // frozen model (df table, corpus scalars, admission floor) built
    // ONCE with the OUTER session before start() — see
    // nearDupIngestGate's clone-session note.
    val serve = graft.operators.LlmData.bm25FrozenServe(spark, corpusDir)
    perBatchGate(spark, srcDir, checkpointDir, outDir, maxFilesPerTrigger) {
      batch => serve(batch).orderBy("doc_id")
    }
  }

  /** Streaming domain-budget admission gate — the stateful member of
    * the gate family: unlike [[dsirScoreGate]]/[[bm25ServeGate]]
    * (frozen model, stateless batches), admission here depends on how
    * much of each source's budget EARLIER batches already spent. The
    * budget (x111's cap: 5% of frozen-corpus tokens per source) is
    * trained once at start; each micro-batch admits its documents in
    * the x111 bucket-major order continued from the per-source PRIOR
    * totals, so a single-batch delivery of the whole corpus admits
    * exactly the registered x111 kept set (one-definition equality,
    * pinned in StreamingSpec) and a multi-batch stream is the honest
    * arrival-order greedy under the same caps.
    *
    * State is NOT in the state store: priors fold from DIMENSION-SIZED
    * per-batch summaries (`<outDir>-sums/batch_id=<id>`: source,
    * adm_docs, adm_tokens) — per-batch cost = batches × domains rows,
    * never ∝ corpus, and the fold is the recovery path too. Both the
    * verdict rows and the summary land behind ONE applied-marker with
    * overwrite delivery: a replayed batch recomputes priors from
    * summaries with batch_id < id only (its own stale partial is
    * excluded and overwritten), so the pair is idempotent exactly like
    * [[perBatchGate]]'s single write. */
  def domainBudgetGate(spark: SparkSession, srcDir: String,
      checkpointDir: String, outDir: String, corpusDir: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    // frozen with the OUTER session before start() — the clone-session
    // note on nearDupIngestGate
    val cap = graft.operators.Shaping.frozenCap(spark, corpusDir)
    val sumDir = s"$outDir-sums"
    val docs = spark.readStream
      .schema(Tables.schemas("documents"))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        val conf = s.sessionState.newHadoopConf()
        val marker = new org.apache.hadoop.fs.Path(
          s"$checkpointDir/graft-applied/$id")
        val fs = marker.getFileSystem(conf)
        if (!fs.exists(marker)) {
          val priors =
            if (fs.exists(new org.apache.hadoop.fs.Path(sumDir)))
              Some(s.read.parquet(sumDir)
                .filter(col("batch_id") < lit(id))
                .groupBy("source").agg(sum("adm_tokens").as("prior")))
            else None
          // batch_id lives ONLY in the partition directory name — a
          // physical batch_id column under a batch_id=<id> path would
          // collide with the partition-inferred column on read (the
          // inferred one shadows the data one), so the column exists
          // exactly once and root-readers' batch_id filters prune
          // partitions.
          val verdicts = graft.operators.Shaping
            .admitBatch(batch, priors, cap)
            .orderBy("doc_id")
            .persist() // two writes below fold the same admission once
          verdicts.write.mode("overwrite").parquet(s"$outDir/batch_id=$id")
          verdicts.filter(col("admitted"))
            .groupBy("source")
            .agg(count(lit(1)).as("adm_docs"), sum("nt").as("adm_tokens"))
            .write.mode("overwrite").parquet(s"$sumDir/batch_id=$id")
          verdicts.unpersist()
          fs.create(marker, false).close()
        }
      }
      .start()
  }

  /** The per-batch monitor delivery contract shared by
    * [[qualityDriftGate]] and [[mixtureDriftGate]]: documents arrive
    * as files, each micro-batch is scored by a pure
    * DataFrame→DataFrame function (dimension-sized output), and the
    * result lands in its own `batch_id=<id>` directory with OVERWRITE
    * semantics — a replayed batch (crash after the write committed,
    * before the skip-marker) rewrites identical rows instead of
    * double-appending, so idempotence holds on plain parquet; the
    * marker only skips recomputation. Stateless in-stream (no state
    * store, no watermark). batch_id exists exactly ONCE, as the
    * partition-inferred column from the directory name — writing it
    * as a data column too would be shadowed by the inferred one on
    * root reads (a silent schema overlap); root-readers' batch_id
    * filters prune partitions instead. */
  private def perBatchGate(spark: SparkSession, srcDir: String,
      checkpointDir: String, outDir: String, maxFilesPerTrigger: Int)(
      score: DataFrame => DataFrame): StreamingQuery = {
    val docs = spark.readStream
      .schema(Tables.schemas("documents"))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        val marker = new org.apache.hadoop.fs.Path(
          s"$checkpointDir/graft-applied/$id")
        val fs = marker.getFileSystem(s.sessionState.newHadoopConf())
        if (!fs.exists(marker)) {
          score(batch)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$id")
          fs.create(marker, false).close()
        }
      }
      .start()
  }

  /** Batch compaction for [[corpusDedupIngest]]: fold the published
    * corpus's fingerprints into the compacted table, partitioned by a
    * 2-hex-char shard (256 partitions) of the md5 — so a future
    * shard-pruned consumer reads 1/256th of the table per key prefix
    * and the overwrite parallelizes by shard. Reads the corpus through
    * the streaming sink's _spark_metadata log, so uncommitted files
    * from an in-flight trigger are never compacted. Idempotent
    * (distinct over the full corpus each run); run it at least once
    * per ingest stateHorizon, while ingest is idle. */
  def compactCorpusFingerprints(spark: SparkSession, corpusDir: String,
      compactedFpDir: String): Unit =
    spark.read.parquet(corpusDir)
      .select(col("fp"), substring(col("fp"), 1, 2).as("shard"))
      .distinct()
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(compactedFpDir)

  /** Complete-mode snapshot sink shared by the rollups: foreachBatch
    * overwrite keeps the output a consistent per-trigger snapshot —
    * idempotent under retries. Complete mode retains all aggregation
    * state; fine for the AvailableNow drain-and-stop cadence these
    * rollups target, UNBOUNDED under a long-running trigger (a
    * production continuous run would switch to append mode behind a
    * watermark). */
  private def snapshotTo(df: DataFrame, checkpointDir: String,
      outDir: String): StreamingQuery =
    df.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** ST2+ST5: event-time tumbling hourly rollup — the streaming twin
    * of q19. The cents-sum is the ONE shared definition
    * (Rounding.sumCents), so the batch oracle checks the same math. */
  def hourlyRollup(spark: SparkSession, srcDir: String, checkpointDir: String,
      outDir: String): StreamingQuery =
    snapshotTo(
      readEvents(spark, srcDir, archiveDir = None)
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"),
          graft.functions.Rounding.sumCents(col("value")).as("sum_value"))
        .select(col("w.start").as("hour_start"), col("n"), col("sum_value")),
      checkpointDir, outDir)

  /** Streaming quality-gate monitor — the streaming twin of x52's
    * Gopher rule gate over arriving crawl files: per-(lang, keep)
    * document counts, complete-mode snapshot per drain. The rules are
    * the ONE shared definition (Text.gopherGate), so the monitor's
    * keep decision can never drift from the oracle-checked batch
    * query; all rule evaluation is map-side on the stream, the only
    * state is the (lang, keep) count table (≤ 2 × |langs| rows). */
  def qualityGateMonitor(spark: SparkSession, srcDir: String,
      checkpointDir: String, outDir: String): StreamingQuery =
    snapshotTo(
      spark.readStream.schema(Tables.schemas("documents")).parquet(srcDir)
        .withColumn("tk", graft.functions.Text.tokens(col("text")))
        .withColumn("keep", graft.functions.Text.gopherGate(col("tk")).getField("keep"))
        .groupBy("lang", "keep").agg(count(lit(1)).as("n")),
      checkpointDir, outDir)

  /** Streaming recency monitor: per-day event volume as a complete-mode
    * snapshot per drain — the input table for the α=1/2 EWMA recency
    * signal (x59). The DECAY MATH is deliberately not in the stream:
    * chained streaming aggregations are unsupported, and the EWMA is a
    * pure function of the daily snapshot — so the monitor maintains
    * only the tiny (day, n) table and `functions.Decay.ewma` (the ONE
    * shared definition the x59 oracle checks) is applied to each
    * snapshot batch-side. StreamingSpec pins monitor∘Decay ≡ x59. */
  def recencyMonitor(spark: SparkSession, srcDir: String,
      checkpointDir: String, outDir: String): StreamingQuery =
    snapshotTo(
      readEvents(spark, srcDir, archiveDir = None)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")),
      checkpointDir, outDir)

  /** Streaming twin of q24: event-time session windows (30-min gap)
    * per user, same shared agg expressions as the oracle-checked batch
    * query. */
  def sessionRollup(spark: SparkSession, srcDir: String, checkpointDir: String,
      outDir: String): StreamingQuery =
    snapshotTo(
      readEvents(spark, srcDir, archiveDir = None)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"),
          graft.functions.Rounding.sumCents(col("value")).as("sum_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("n"), col("sum_value")),
      checkpointDir, outDir)

  /** One open session per user, carried in the state store. */
  final case class SessionState(startMicros: Long, lastMicros: Long,
      n: Long, sumCents: Long)
  final case class ClosedSession(user_id: Long, session_start_micros: Long,
      n: Long, sum_value: Double)

  /** Explicit stateful sessionization via `flatMapGroupsWithState` +
    * event-time timeout — the state-machine form of q24/sessionRollup:
    * a session row is emitted exactly once, WHEN IT CLOSES (a successor
    * event arrives more than 30 minutes later — the same strict-gap
    * rule as q24 — or the event-time timeout fires once the watermark
    * passes last_event + gap). Each user's state is exactly one open
    * session; the timeout bounds it, so state size is |active users|,
    * never event volume. Compare sessionRollup: the windowed-agg form
    * re-snapshots every session per drain, this form streams each
    * session downstream once — the shape an incremental training-data
    * feed wants. Events inside a batch are folded in (ts, cents) order,
    * which reproduces q24's session boundaries exactly (sums are
    * order-free cents integers). */
  def closedSessions(spark: SparkSession, srcDir: String, checkpointDir: String,
      outDir: String): StreamingQuery = {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val gapMicros = 30L * 60 * 1000000
    // the watermarked ts attribute must SURVIVE into the grouped
    // Dataset (projecting it away detaches the watermark and the
    // analyzer rejects the event-time timeout)
    val events = readEvents(spark, srcDir, archiveDir = None)
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("tsm"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .as[(Long, java.sql.Timestamp, Long, Long)]
    val closed = events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid, rows, state) =>
          def emit(s: SessionState) =
            ClosedSession(uid, s.startMicros, s.n, s.sumCents / 100.0)
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit)
            state.remove()
            out.iterator
          } else {
            val sorted = rows.map(r => (r._3, r._4)).toSeq.sorted
            var cur = state.getOption
            val out = Seq.newBuilder[ClosedSession]
            sorted.foreach { case (ts, cents) =>
              cur match {
                case Some(s) if ts - s.lastMicros > gapMicros =>
                  out += emit(s)
                  cur = Some(SessionState(ts, ts, 1L, cents))
                case Some(s) =>
                  cur = Some(s.copy(lastMicros = ts, n = s.n + 1,
                    sumCents = s.sumCents + cents))
                case None =>
                  cur = Some(SessionState(ts, ts, 1L, cents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fires when the watermark passes the strict-gap boundary
              state.setTimeoutTimestamp(s.lastMicros / 1000 + gapMicros / 1000 + 1)
            }
            out.result().iterator
          }
      }
    closed.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Per-user running state carried in the state store. */
  final case class UserState(count: Long, lastTsMicros: Long)
  final case class UserSummary(user_id: Long, n_events: Long, last_seen_micros: Long)

  /** Stream-STREAM event-time interval join (ST surface previously
    * missing: every other op here is stream-static or single-stream
    * stateful): purchase attribution — each purchase joins the views
    * by the SAME user within the hour BEFORE it. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * the state store holds only one hour of unmatched rows per side
    * (Spark derives the eviction horizon from watermark + interval —
    * unbounded-state stream-stream joins are rejected by the analyzer).
    * Inner join ⇒ append mode; rows emit as they match. At 100 TB/day
    * this is the shape for joining two live firehoses (impressions ⋈
    * conversions) without landing either: state is bounded by rate ×
    * interval, keyed on user_id so the shuffle co-locates both sides.
    * Batch twin: the identical expressions over static frames
    * (StreamingSpec asserts set equality). */
  def purchaseAttribution(spark: SparkSession, srcDir: String, checkpointDir: String,
      outDir: String): StreamingQuery = {
    val joined = purchaseAttributionOf(
      readEvents(spark, srcDir, archiveDir = None))
    joined.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(outDir)
  }

  /** Shared join definition — ONE set of expressions for the streaming
    * query and its batch twin, so the equality test can't drift. */
  def purchaseAttributionOf(events: DataFrame): DataFrame =
    attributionJoin(events, "inner")

  /** LEFT-OUTER variant — the semantically hard case a real
    * attribution pipeline needs: a purchase with no qualifying view
    * must still come out (null-extended), but in a stream it may only
    * emit once the watermark PROVES no qualifying view can still
    * arrive — i.e. when the purchase's state is evicted. Spark keeps a
    * left row until the watermark clears its WHOLE match interval, so
    * the null row appears with a delay of watermark delay + interval
    * width (1 h + 1 h here), not at p_ts + delay — the documented
    * outer-join deferral. Until then the row sits in the state store
    * as a candidate. Consequence the spec pins:
    * the streamed result is the batch left-outer twin RESTRICTED to
    * purchases whose eviction horizon the final watermark passed —
    * null rows for the un-evicted tail are not wrong, they are
    * pending. State stays bounded by rate × 1 h per side exactly as
    * the inner form. */
  def purchaseAttributionOuterOf(events: DataFrame): DataFrame =
    attributionJoin(events, "left_outer")

  /** FULL-outer variant — both deferral directions at once: unmatched
    * purchases null-extend on the left-eviction horizon (delay +
    * width past p_ts) and unmatched views null-extend on the right
    * one (delay + width past v_ts); matches emit immediately. The
    * user key is coalesced across sides so every output row carries
    * it. At 100 TB this is the reconciliation shape — attribute what
    * matches, surface BOTH kinds of orphans (conversions without
    * impressions, impressions that never converted) from one pass of
    * state, still bounded by rate × 1 h per side. */
  def purchaseAttributionFullOf(events: DataFrame): DataFrame =
    attributionJoin(events, "full_outer")

  /** Full-outer attribution as a runnable stream (append mode). */
  def purchaseAttributionFull(spark: SparkSession, srcDir: String,
      checkpointDir: String, outDir: String): StreamingQuery = {
    val joined = purchaseAttributionFullOf(
      readEvents(spark, srcDir, archiveDir = None))
    joined.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(outDir)
  }

  private def attributionJoin(events: DataFrame, joinType: String): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "1 hour")
    purchases.join(views,
        col("user_id") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") <= col("p_ts"),
        joinType)
      // user key coalesced across sides: identity for inner/left (the
      // purchase side is always present there), and what lets the
      // full-outer's view-orphan rows still carry their user
      .select(col("purchase_id"),
        coalesce(col("user_id"), col("v_user")).as("user_id"),
        col("p_ts"), col("view_id"), col("v_ts"), col("value"))
  }

  /** Left-outer attribution as a runnable stream (append mode — outer
    * null rows are appended at eviction time, matches as they occur). */
  def purchaseAttributionOuter(spark: SparkSession, srcDir: String,
      checkpointDir: String, outDir: String): StreamingQuery = {
    val joined = purchaseAttributionOuterOf(
      readEvents(spark, srcDir, archiveDir = None))
    joined.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(outDir)
  }

  /** Custom keyed state via `mapGroupsWithState` (the escape hatch when
    * windowed aggs can't express the state machine): per-user running
    * event count + last-seen, durable across restarts through the
    * checkpointed state store. Update-mode foreachBatch snapshots the
    * touched groups per trigger. NoTimeout keeps the demo state
    * unbounded — production sessionization would use an event-time
    * timeout against the watermark to bound it. */
  def userRunningState(spark: SparkSession, srcDir: String, checkpointDir: String,
      outDir: String): StreamingQuery = {
    import spark.implicits._
    val events = readEvents(spark, srcDir, archiveDir = None)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_micros"))
      .as[(Long, Long)]
    val updated = events.groupByKey(_._1)
      .mapGroupsWithState[UserState, UserSummary](GroupStateTimeout.NoTimeout) {
        (uid, rows, state) =>
          var cnt = 0L
          var maxTs = Long.MinValue
          rows.foreach { case (_, ts) => cnt += 1; if (ts > maxTs) maxTs = ts }
          val prev = state.getOption.getOrElse(UserState(0L, Long.MinValue))
          val next = UserState(prev.count + cnt, math.max(prev.lastTsMicros, maxTs))
          state.update(next)
          UserSummary(uid, next.count, next.lastTsMicros)
      }
    updated.writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[UserSummary], _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
