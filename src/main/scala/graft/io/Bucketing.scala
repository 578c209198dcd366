package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout writer: the shuffle-amortization lever for FACT⋈FACT
  * joins (SURVEY.md §4 — the join class `broadcast()` cannot touch
  * because neither side fits an executor, and the class that dominates
  * a 100 TB star-schema workload once dim joins are broadcast).
  *
  * Writing both sides bucketed by the join key with the SAME bucket
  * count pays the layout shuffle ONCE at write time; every subsequent
  * join or aggregation keyed on the bucket column then plans with ZERO
  * Exchange nodes — the scan itself reports hashpartitioning, so
  * Catalyst sees the co-location and deletes the shuffle (asserted by
  * BucketingSpec). At 1000 executors that is the difference between a
  * nightly pipeline re-shuffling the full fact table per query and one
  * that never moves it again.
  *
  * Bucket metadata lives in the session catalog, so the table MUST go
  * through `saveAsTable` — a bare `.parquet(path)` write silently drops
  * the bucket spec and every downstream join re-shuffles (the failure
  * is invisible at small scale: results stay correct, only the plan
  * rots). `sortBy` additionally records per-bucket sort order, letting
  * a sort-merge join skip its Sort when each bucket holds one file.
  *
  * Sizing rule: pick `buckets` so one bucket of the LARGER side fits
  * comfortably in one task (≈ `spark.sql.files.maxPartitionBytes`);
  * both sides must use the same count or Spark falls back to
  * re-shuffling the mismatched side.
  */
object Bucketing {

  /** Write `df` as a bucketed (and per-bucket sorted) managed parquet
    * table keyed on `key`. Overwrites any existing table of that name.
    *
    * The explicit `repartition(buckets, bucketId)` IS the layout
    * shuffle the scaladoc above prices (r19 optimization — previously
    * the write ran at whatever parallelism the input happened to
    * have). The partitioning expression is the BUCKET ID — the same
    * `pmod(hash(key), buckets)` [[compact]] has always used (and whose
    * scaladoc records that repartitioning by the raw key empirically
    * still split files) — so every bucket lands WHOLLY in one task:
    * one file per bucket at ANY input parallelism (the zero-Sort SMJ
    * contract needs exactly that; without it a multi-task input writes
    * tasks×buckets files and the per-bucket sort claim degrades), and
    * the write's fan-out stays near `buckets` tasks regardless of how
    * AQE coalesced the upstream (advisory-sized coalescing had
    * serialized the whole table write into one task — x101's index
    * build read 5.1 s cold from exactly that). Iceberg's
    * write.distribution-mode=hash is this same move.
    *
    * Fan-out precision (r19 ADVICE): the repartition hashes the bucket
    * id AGAIN (partition = pmod(murmur3(bucketId), buckets)), so
    * bucket ids collide — ≈1/e of the partitions come up empty and
    * some tasks write 2-3 buckets' files; effective parallelism is
    * ~63% of `buckets`, not exactly `buckets`. One-file-per-bucket and
    * the zero-Sort SMJ contract are unaffected (a bucket never splits
    * across tasks). Accepted: exact id→partition placement needs an
    * RDD-level custom partitioner, which would drop this write out of
    * the DataFrame writer for a ≤1.6× tail-parallelism win. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val w = df.repartition(buckets, pmod(hash(col(key)), lit(buckets)))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Append rows to an existing bucketed table under the SAME bucket
    * spec — the incremental-index maintenance path (a production corpus
    * is append-mostly; the index must grow without rewriting). New rows
    * hash into per-bucket files ADDED next to the existing ones; base
    * files are never touched, and the scan keeps reporting
    * hashpartitioning, so downstream zero-Exchange plans survive the
    * append. Spark validates the spec matches the catalog's — a
    * mismatched bucket count fails loudly instead of silently
    * de-bucketing the table. */
  def appendBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    // same bucket-id layout shuffle as [[writeBucketed]]: one new file
    // per bucket per append batch (not per task), written in parallel
    val w = df.repartition(buckets, pmod(hash(col(key)), lit(buckets)))
      .write.mode(SaveMode.Append).format("parquet")
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Partition column of the transactional ingest layout. */
  val IngestCol = "ingest_batch"

  private def ingestLayout(spark: SparkSession, table: String): Boolean =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .partitionColumnNames == Seq(IngestCol)

  /** One-time migration of a plain bucketed table into the
    * TRANSACTIONAL ingest layout: the same bucket spec, additionally
    * partitioned by [[IngestCol]], with the existing rows rewritten as
    * the base generation (`ingest_batch=-1`). Bucketed plans are
    * unaffected — the scan still reports hashpartitioning on `key`
    * across partition directories (zero-Exchange probes survive,
    * pinned in spec) — and every payload read gains one inert
    * partition column. Idempotent; a crash mid-swap reuses
    * [[compact]]'s `__compacting` recovery convention, so an
    * interrupted migration heals on the next call or read. */
  def ensureIngestLayout(spark: SparkSession, table: String, key: String,
      buckets: Int, sorted: Boolean = false): Unit = {
    import org.apache.spark.sql.functions.lit
    val tmp = table + "__compacting"
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(tmp)) {
      finishSwap(spark, tmp, table)
    }
    if (ingestLayout(spark, table)) return
    spark.sql(s"DROP TABLE IF EXISTS `$tmp`")
    val w = spark.table(table).withColumn(IngestCol, lit(-1L))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .partitionBy(IngestCol).bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(tmp)
    spark.sql(s"DROP TABLE `$table`")
    finishSwap(spark, tmp, table)
    recoverIfIngest(spark, table)
  }

  /** WRITE-AUDIT-PUBLISH delivery of one ingest batch into an
    * ingest-layout table (r10 verdict #4 — the q46 generation-dir
    * pattern applied to streaming appends, so the crash window the
    * marker+append path could only HEAL is prevented outright):
    *
    *  1. WRITE — the batch is staged as proper bucket files under a
    *     dot-prefixed scratch dir INSIDE the table location
    *     (`.stage-<id>`, via a scratch external bucketed table so the
    *     file names carry bucket ids). Dot-dirs are invisible to every
    *     reader; a crash here strands hidden files the next attempt
    *     deletes.
    *  2. AUDIT — the staged copy is read back and its row count
    *     checked against the batch before anything becomes visible; a
    *     torn stage write fails here, not in a consumer.
    *  3. PUBLISH — one atomic `rename(.stage-<id>,
    *     ingest_batch=<id>)`, then the idempotent `ADD IF NOT EXISTS
    *     PARTITION` registration. Partitions are catalog-managed, so
    *     REGISTRATION is the single visibility atom: before it the
    *     batch does not exist to readers (even renamed), after it the
    *     whole batch exists exactly once.
    *
    * Replay safety needs no marker: a redelivered batch finds its
    * partition directory already present, skips stage+rename, and
    * re-runs only the idempotent registration — which is also the
    * heal for a crash between rename and register. No interleaving of
    * crash and restart can expose a partial or doubled batch
    * (StreamingSpec kills the writer between stage and publish to pin
    * exactly that). Returns true iff this call published the batch.
    *
    * `failpoint` is a TEST SEAM: invoked with "staged" after the
    * audited stage write and "renamed" after the atomic rename, so the
    * crash-window spec can kill the real code path at exactly those
    * boundaries instead of simulating the on-disk states by hand. */
  def publishBucketedBatch(spark: SparkSession, df: DataFrame, table: String,
      key: String, buckets: Int, batchId: Long,
      sorted: Boolean = false,
      failpoint: String => Unit = _ => ()): Boolean = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val part = new org.apache.hadoop.fs.Path(loc, s"$IngestCol=$batchId")
    val fresh = !fs.exists(part)
    if (fresh) {
      val stagePath = new org.apache.hadoop.fs.Path(loc, s".stage-$batchId")
      val stageTbl = s"${table}__stage$batchId"
      spark.sql(s"DROP TABLE IF EXISTS `$stageTbl`")
      if (fs.exists(stagePath)) fs.delete(stagePath, true)
      val w = df
        .repartition(buckets, org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(df(key)),
          org.apache.spark.sql.functions.lit(buckets)))
        .write.mode(SaveMode.Overwrite).format("parquet")
        .option("path", stagePath.toString).bucketBy(buckets, key)
      (if (sorted) w.sortBy(key) else w).saveAsTable(stageTbl)
      val staged = spark.table(stageTbl).count()
      val expected = df.count()
      // external table: the drop releases the catalog name, files stay
      spark.sql(s"DROP TABLE IF EXISTS `$stageTbl`")
      if (staged != expected) {
        fs.delete(stagePath, true)
        throw new IllegalStateException(
          s"stage audit failed for $table batch $batchId: read back $staged of $expected rows")
      }
      failpoint("staged")
      if (!fs.rename(stagePath, part))
        throw new IllegalStateException(
          s"publish rename failed for $table batch $batchId")
      failpoint("renamed")
    }
    spark.sql(s"ALTER TABLE `$table` ADD IF NOT EXISTS PARTITION ($IngestCol=$batchId)")
    spark.catalog.refreshTable(table)
    fresh
  }

  /** Compact a bucketed table: every [[appendBucketed]] batch adds one
    * file per written bucket, so a daily append regime grows per-bucket
    * file counts without bound — and scan/open overhead with them.
    * Compaction rewrites the table at exactly ONE file per bucket and
    * swaps it in through the catalog.
    *
    * The rewrite repartitions by the BUCKET ID expression itself —
    * `pmod(hash(key), buckets)`, the exact Murmur3 the bucketed writer
    * assigns files by — so all rows of one bucket land in one task and
    * each bucket emits exactly one file (repartitioning by the raw key
    * is NOT enough: the writer then re-derives bucket ids per task and
    * a task holding several buckets' rows splits into several files).
    * The bucket spec — and every downstream zero-Exchange plan —
    * survives the swap (BucketingSpec pins all three: file bound,
    * result identity, plan shape).
    *
    * Swap semantics, honestly: Spark's v1 catalog has no atomic table
    * swap, so the DROP + RENAME pair is a SINGLE-WRITER maintenance op
    * with a brief no-table window for concurrent resolvers. Data is
    * never at risk — the compacted copy exists under `<table>__compacting`
    * before the DROP — and a crash between the two DDLs is
    * self-healing: the next compact() call (or [[table]] read via the
    * recovery below) completes the interrupted swap instead of
    * failing on the missing table.
    *
    * `dedupBy` is the DOUBLE-APPEND HEAL for the streaming append's
    * one non-transactional window (EventStream.ivfStreamingAppend: a
    * crash between the bucketed append and its idempotence marker
    * makes the replayed batch append its rows a second time — parquet
    * + a v1 catalog have no multi-operation transaction to close
    * that). Pass the payload's logical key (vec_id for the IVF/PQ
    * index tables) and the rewrite drops duplicate key rows while it
    * compacts; replayed rows are byte-identical re-assignments of the
    * same batch under a frozen quantizer, so keeping any one row per
    * key restores exactly the once-delivered table (StreamingSpec pins
    * this against the batch-x74 index). Empty = plain compaction. */
  def compact(spark: SparkSession, table: String, key: String,
      buckets: Int, sorted: Boolean = true,
      dedupBy: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val tmp = table + "__compacting"
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(tmp)) {
      // a prior swap died between DROP and RENAME: finish it; the
      // tmp copy IS the compacted table
      finishSwap(spark, tmp, table)
      return
    }
    // a stale tmp from a crash BEFORE the drop is dead weight (the
    // live table still exists) — clear it so the write can't collide
    spark.sql(s"DROP TABLE IF EXISTS `$tmp`")
    val src =
      if (dedupBy.isEmpty) spark.table(table)
      else spark.table(table).dropDuplicates(dedupBy)
    if (ingestLayout(spark, table)) {
      // ingest-layout compaction folds every published generation into
      // a fresh base (`ingest_batch=-1`), keeping the transactional
      // layout so future publishBucketedBatch deliveries keep working
      val w = src.drop(IngestCol)
        .repartition(buckets, pmod(hash(col(key)), lit(buckets)))
        .withColumn(IngestCol, lit(-1L))
        .write.mode(SaveMode.Overwrite).format("parquet")
        .partitionBy(IngestCol).bucketBy(buckets, key)
      (if (sorted) w.sortBy(key) else w).saveAsTable(tmp)
    } else
      // writeBucketed performs the bucket-id repartition itself (r19)
      writeBucketed(src, tmp, key, buckets, sorted)
    spark.sql(s"DROP TABLE `$table`")
    finishSwap(spark, tmp, table)
    recoverIfIngest(spark, table)
  }

  /** Post-swap partition-metadata rebuild: a catalog RENAME moves the
    * table directory but keeps partition entries at the old location,
    * so any swapped-in ingest-layout table must recover its partitions
    * from the filesystem before it is readable. No-op for plain
    * bucketed tables. */
  private def recoverIfIngest(spark: SparkSession, table: String): Unit =
    if (ingestLayout(spark, table)) {
      spark.catalog.recoverPartitions(table)
      spark.catalog.refreshTable(table)
    }

  /** The RENAME half of the swap, tolerant of LOSING a race to a
    * concurrent healer: the check-then-rename in [[table]] (and a
    * second reader, or compact itself) can both observe the crash
    * window — whichever ALTER lands second throws on the now-missing
    * tmp. Losing is success iff the destination exists afterwards;
    * anything else is a real failure and rethrows. */
  private def finishSwap(spark: SparkSession, tmp: String, table: String): Unit =
    try {
      spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
      ()
    } catch {
      case scala.util.control.NonFatal(e) =>
        // fatal errors and interrupts propagate; and a metastore that
        // is DOWN must surface the rename failure, not a secondary
        // exists-check exception in its place
        val healed =
          try spark.catalog.tableExists(table)
          catch { case scala.util.control.NonFatal(_) => false }
        if (!healed) throw e
    }

  /** Catalog read-back; the scan carries the bucket spec (and therefore
    * its hashpartitioning output partitioning) only via this path.
    *
    * Recovery: if a [[compact]] crashed between its DROP and RENAME,
    * the live data sits under `<name>__compacting` and `<name>` is
    * absent — finish the interrupted swap here so a reader landing in
    * that window heals the table instead of failing on a missing one
    * (the scaladoc contract on [[compact]]). */
  def table(spark: SparkSession, name: String): DataFrame = {
    val tmp = name + "__compacting"
    if (!spark.catalog.tableExists(name) && spark.catalog.tableExists(tmp)) {
      finishSwap(spark, tmp, name)
      recoverIfIngest(spark, name)
    }
    spark.table(name)
  }
}
