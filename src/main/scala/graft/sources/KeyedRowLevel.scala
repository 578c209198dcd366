package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Row-level DML on `graft-keyed` — MERGE INTO / UPDATE / row-grain
  * DELETE via GROUP-BASED COPY-ON-WRITE (`SupportsRowLevelOperations`,
  * the r15 verdict's #2; the reference's incremental-load semantics —
  * `/root/reference/README.md:51`, "only new/updated tracks" — is
  * exactly this upsert, previously expressible only as a full INSERT
  * OVERWRITE).
  *
  * The group is the KEY DIRECTORY — the same grain every other surface
  * of this connector speaks (partition pruning, SPJ alignment, sidecar
  * entries, tombstones). Spark's group-based rewrite plans:
  *
  *  1. SCAN the affected groups through [[KeyedCowOperation.newScanBuilder]]
  *     — an ordinary [[KeyedScan]], so the command condition's key
  *     predicates prune statically (pushFilters, exact directory
  *     grain) and, when the condition only touches non-key columns,
  *     Spark's runtime group filtering executes the matching-rows
  *     subquery first and hands the surviving keys to the scan as an
  *     execution-time IN (the scan already implements
  *     SupportsRuntimeV2Filtering through its v1 runtime filter).
  *     Groups the condition cannot reach are NEVER read, NEVER
  *     rewritten.
  *  2. WRITE the replacement rows (survivors + updates + inserts) of
  *     exactly those groups into an uncommitted `_gen-<queryId>`
  *     through the same audited writer the overwrite commit uses (one
  *     file per key, framing guard, writer-derived sidecar + order
  *     marker inside the generation).
  *  3. COMMIT a new snapshot in which rewritten keys point at the new
  *     generation via per-key EDITS, scanned-but-unwritten keys (all
  *     rows deleted) are tombstoned, MERGE-inserted keys outside the
  *     scanned set APPEND their new file after the key's prior ones,
  *     and every unaffected key carries forward BY REFERENCE — the
  *     base generation's files are never copied. At 100 TB an upsert
  *     touching 3 of 16 buckets costs 3 directory rewrites and one
  *     CAS metadata swap, not a corpus rewrite.
  *
  * SERIALIZABLE CONFLICT DETECTION, not rebase: the replacement rows
  * were computed FROM the snapshot the scan resolved; if any commit
  * (overwrite, delete, another rewrite) lands between that resolution
  * and this commit's CAS claim, applying the edits anyway would mix
  * rows derived from the old snapshot into the new one — a write-skew
  * lost update. The commit compares the fresh head's seq against the
  * scanned seq and FAILS LOUDLY with a re-run remediation (Iceberg's
  * copy-on-write validation draws the same line).
  *
  * Key-grain DELETEs never reach this path: Spark's
  * OptimizeMetadataOnlyDeleteFromTable converts them back to
  * [[KeyedTable.deleteWhere]]'s zero-data-movement tombstone commit
  * (q64's contract is untouched); copy-on-write is the ROW-grain
  * fallback the r15 connector refused. */
/** The scan-registration seam shared by both row-level modes: the
  * operation's commit consumes the scan's resolved snapshot (conflict
  * detection) and, for copy-on-write, its final planned key set. */
trait KeyedRowLevelHost {
  private[sources] def registerScan(s: KeyedScan): Unit
}

final class KeyedRowLevelBuilder(declared: StructType, path: String,
    key: String, sortBy: Seq[String], retain: Int,
    info: RowLevelOperationInfo, dmlMode: String = "cow",
    branch: Option[String] = None)
    extends RowLevelOperationBuilder {
  /** Mode routing (table property `dmlMode`): copy-on-write rewrites
    * affected key directories (the default — reads stay pristine);
    * merge-on-read handles row-grain DELETE as a deletion-vector
    * commit (O(deleted rows) written, zero data rewritten — the
    * Iceberg v2 position-delete trade: cheap deletes now, a read-side
    * merge until compaction folds them in). UPDATE and MERGE stay
    * copy-on-write in either mode (their insert legs need real files;
    * the delete+insert MOR decomposition is the recorded next step). */
  override def build(): RowLevelOperation =
    if (dmlMode == "mor")
      new KeyedMorOperation(declared, path, key, retain, info.command(), branch)
    else
      new KeyedCowOperation(declared, path, key, sortBy, retain,
        info.command(), branch)
}

final class KeyedCowOperation(declared: StructType, path: String, key: String,
    sortBy: Seq[String], retain: Int, cmd: Command,
    branch: Option[String] = None)
    extends RowLevelOperation with KeyedRowLevelHost {

  /** The scan instance Spark executes for this operation — its final
    * effective key set (static pushdown ∩ runtime group filter) IS the
    * affected-group set the commit replaces. Registered at scan build;
    * read at commit, which runs strictly after the query executed. */
  @volatile private[sources] var configuredScan: KeyedScan = _
  override private[sources] def registerScan(s: KeyedScan): Unit =
    configuredScan = s

  override def command(): Command = cmd
  override def description(): String =
    s"GraftKeyedCow path=$path key=$key command=$cmd"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    if (KeyedSource.readCommitLog(path, conf.value).isEmpty)
      throw new UnsupportedOperationException(
        s"graft-keyed $cmd is a copy-on-write commit against the snapshot log, " +
          s"but $path has no commit log (legacy flat stage) — restage through " +
          "the connector writer first")
    new KeyedScanBuilder(declared, path, key, conf,
      options.getBoolean("vectorize", true),
      // a branch DML scans the BRANCH head (resolved at plan time);
      // the commit then checks the branch head did not move
      reportStats = true,
      asOf = branch.map(b => KeyedSource.resolveBranch(path, conf.value, b)),
      cowHost = Some(this))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        val schema = info.schema()
        require(schema.fieldNames.sameElements(declared.fieldNames),
          s"graft-keyed $cmd must write the full layout schema " +
            s"${declared.simpleString}, got ${schema.simpleString}")
        new KeyedCowWrite(KeyedCowOperation.this, schema, path, key, sortBy,
          retain, info.queryId(), branch)
      }
    }
}

/** The copy-on-write replacement write: same clustered-by-key +
  * key-first-sorted distribution as the overwrite write (each affected
  * key lands wholly in one task as one file), same audited writer. */
final class KeyedCowWrite(op: KeyedCowOperation, schema: StructType,
    path: String, key: String, sortBy: Seq[String], retain: Int,
    queryId: String, branch: Option[String] = None)
    extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}

  override def description(): String =
    s"GraftKeyedCowWrite path=$path key=$key"
  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.column(key)))
  // session-parallelism writer fan-out, same rationale as
  // KeyedWrite.requiredNumPartitions (AQE advisory-sized coalescing
  // must not serialize per-key file creation)
  private val writeParallelism: Int =
    try org.apache.spark.sql.SparkSession.active.sessionState.conf
      .numShufflePartitions
    catch { case _: Throwable => 0 }
  override def requiredNumPartitions(): Int = writeParallelism
  override def requiredOrdering(): Array[SortOrder] =
    (key +: sortBy).map(c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray
  override def toBatch: BatchWrite =
    new KeyedCowBatchWrite(op, schema, path, key, sortBy, retain, queryId,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()),
      branch)
}

final class KeyedCowBatchWrite(op: KeyedCowOperation, schema: StructType,
    path: String, key: String, sortBy: Seq[String], retain: Int,
    queryId: String, conf: org.apache.spark.util.SerializableConfiguration,
    branch: Option[String] = None)
    extends BatchWrite {

  private def genName = s"_gen-$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    // rewrites INHERIT the layout's codec (per-file extension probe)
    new KeyedCowWriterFactory(schema, key, s"$path/$genName", conf,
      KeyedSource.codecOfHead(path, conf.value))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.toSeq.collect { case m: KeyedCommitMessage => m }
    val entries = msgs.flatMap(_.keys)
    val dup = entries.groupBy(_.rawKey).collect { case (k, g) if g.size > 1 => k }
    if (dup.nonEmpty) throw new IllegalStateException(
      s"graft-keyed rewrite produced ${dup.size} keys in multiple tasks " +
        s"(${dup.take(3).mkString(",")}…): clustering contract violated, not publishing")
    val scan = op.configuredScan
    require(scan != null,
      "graft-keyed row-level commit reached without a configured scan")
    val scannedView = scan.view
    val scanned: Set[String] = scan.plannedRawKeys
    val written: Set[String] = entries.map(_.rawKey).toSet
    val hconf = conf.value
    val root = new org.apache.hadoop.fs.Path(path)
    val gen = new org.apache.hadoop.fs.Path(root, genName)
    val fs = root.getFileSystem(hconf)
    // visible no-op (nothing scanned, nothing written — e.g. the
    // runtime group filter proved no group matches): burn no snapshot,
    // clean own staging
    if (scanned.isEmpty && written.isEmpty) { fs.delete(gen, true); return }
    // AUDIT artifacts land INSIDE the uncommitted generation — the
    // merged-sidecar read (KeyedStats.readView) serves edited keys
    // from here, unaffected keys from their own generations
    val sidecarEntries = entries.map(e =>
      KeyedStats.Entry(e.rawKey, e.count, e.mins, e.maxs, e.sums))
    // ONE sketch merge serves both the estimate line and the persisted
    // hash file (round-19 review: the first cut folded every task's
    // arrays twice)
    val mergedSk = Array.fill(schema.length)(new KmvSketch)
    msgs.foreach(_.sketches.zipWithIndex.foreach { case (hs, i) =>
      mergedSk(i).addHashes(hs) })
    val table = KeyedStats.TableNdv(entries.map(_.count).sum,
      mergedSk.map(_.estimate))
    KeyedSource.writeFile(fs, new org.apache.hadoop.fs.Path(gen, KeyedStats.SidecarFile),
      KeyedStats.render(schema, key, sidecarEntries, Some(table)))
    // KMV sketch bytes per column (r19) — what lets table NDV merge
    // across exactly the generation mix this commit creates
    KeyedSource.writeFile(fs, new org.apache.hadoop.fs.Path(gen, KeyedStats.NdvFile),
      KeyedStats.renderNdv(schema, key, mergedSk.map(_.hashes)))
    if (sortBy.nonEmpty)
      KeyedSource.writeFile(fs, new org.apache.hadoop.fs.Path(gen, KeyedSource.OrderFile),
        KeyedSource.renderOrderMarker(schema, key, sortBy))
    if (!fs.exists(gen)) fs.mkdirs(gen)
    if (KeyedSource.failBeforePublish) throw new IllegalStateException(
      "graft-keyed test hook: crash before publish")
    var priorGens = Set.empty[String]
    val published = KeyedSource.commitLoop(path, hconf, "row-level commit") { prior =>
      val log = prior.getOrElse(throw new IllegalStateException(
        s"graft-keyed row-level commit at $path found no commit log — " +
          "the layout was replaced mid-operation; re-run the DML"))
      // a branch DML reads and rewrites ITS ref's head; main is
      // untouched until a fastForward publishes the branch
      val head = branch.fold(log.head)(log.branchHead)
      // SERIALIZABLE conflict check: the replacement rows were derived
      // from the scanned snapshot; any commit that moved the ref since
      // invalidates them (write skew) — fail loudly, never rebase
      if (head.seq != scannedView.seq) throw new IllegalStateException(
        s"graft-keyed row-level commit at $path conflicts with a concurrent " +
          s"commit: rows were derived from snapshot ${scannedView.seq} but the " +
          s"${branch.fold("head")(b => s"branch '$b' head")} is now " +
          s"${head.seq}; re-run the DML against the fresh table")
      priorGens = log.snapshots
        .flatMap(_.referencedGens).toSet
      // the base generation's stored keys — needed to carry a key's
      // prior file list when a MERGE inserts into an UNAFFECTED key
      // (the new file APPENDS after the existing ones)
      val baseKeys: Set[String] = {
        val baseGen = new org.apache.hadoop.fs.Path(root, head.gen)
        if (fs.exists(baseGen)) fs.listStatus(baseGen).toSeq.collect {
          case s if s.isDirectory && s.getPath.getName.startsWith("k=") =>
            s.getPath.getName.stripPrefix("k=")
        }.toSet else Set.empty
      }
      def priorLive(k: String): Seq[String] =
        head.edits.getOrElse(k,
          if (baseKeys.contains(k) && !head.tombstones.contains(k)) Seq(head.gen)
          else Seq.empty)
      val fullyDeleted = scanned -- written
      val edits = (head.edits -- fullyDeleted) ++ written.toSeq.map { k =>
        k -> (if (scanned.contains(k)) Seq(genName) else priorLive(k) :+ genName)
      }
      val tombstones = (head.tombstones -- written) ++ fullyDeleted
      val keep = math.max(math.max(log.retain, retain), 1)
      // Only SCANNED keys fold their deletion vectors in: the scan read
      // the DV-applied view, so those keys' replacement files already
      // exclude the deleted rows. A key that was written but NOT
      // scanned (MERGE insert into an unaffected key) merely APPENDS a
      // file after the prior ones — its prior files stay referenced and
      // must keep their DVs, or rows deleted under dmlMode='mor' would
      // silently resurrect.
      val snap = KeyedSource.Snapshot(log.nextSeq, head.gen, tombstones,
        edits, head.dvs -- scanned, branch = branch)
      Some(KeyedSource.CommitLog(keep,
        KeyedSource.trimWindow(log.snapshots :+ snap, keep, log.tags,
          log.branches),
        log.ops, log.tags, log.streams, log.branches))
    }.get
    val live = published.snapshots
      .flatMap(_.referencedGens).toSet
    KeyedSource.expireGenerations(path, live, hconf, known = priorGens -- live)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    if (KeyedSource.failBeforePublish) return // modeled process death
    val gen = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(path), genName)
    val fs = gen.getFileSystem(conf.value)
    fs.delete(gen, true)
  }
}

/** The audited keyed writer behind a projection dropping Spark's
  * `__row_operation` column: a group-based ReplaceData query emits
  * `[operation, row...]`, and with NO metadata projection (our group id
  * is the key DATA column, `requiredMetadataAttributes` is empty) Spark
  * plans the plain writing task, which hands the writer the UNPROJECTED
  * query output (`ReplaceDataExec.writingTask` applies projections only
  * on the metadata branch — the Iceberg path, which always carries
  * `_file`). Arity-checked per row: a future Spark that projects
  * upstream passes through untouched. */
final class KeyedCowWriterFactory(schema: StructType, key: String,
    genDir: String, conf: org.apache.spark.util.SerializableConfiguration,
    codec: String = "none")
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] = {
    val inner = new KeyedDataWriter(schema, key, genDir, taskId, conf, codec)
    new org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
      private val proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
        schema, (1 to schema.length).toIndexedSeq)
      override def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit =
        if (row.numFields == schema.length) inner.write(row)
        else { proj.project(row); inner.write(proj) }
      override def commit(): WriterCommitMessage = inner.commit()
      override def abort(): Unit = inner.abort()
      override def close(): Unit = inner.close()
    }
  }
}

// ── Merge-on-read DELETE (deletion vectors — r16) ────────────────────

/** Row-grain DELETE — and, since the second r16 leg, UPDATE — as a
  * DELETION-VECTOR commit (`SupportsDelta` —
  * Spark's delta-based row-level operation; table property
  * `dmlMode='mor'`): instead of rewriting the affected key
  * directories, the operation scans the matching rows WITH their
  * merge-on-read row ID — `(key, _graft_pos)`, the key column plus the
  * position metadata column ([[KeyedSource.PosCol]]) — and each task
  * writes the deleted ordinals into small `dv-<count>-<task>` files
  * under an uncommitted generation. The commit appends those files to
  * the snapshot's per-key DV refs; readers skip the ordinals at decode
  * ([[PositionedReader]]).
  *
  * The trade is Iceberg v2's position-delete trade, stated honestly:
  *  - a delete costs O(deleted rows) bytes and one CAS swap, however
  *    large the key directories are (copy-on-write pays a full
  *    directory rewrite for one doomed row);
  *  - reads pay a per-row bitset probe and COLUMNAR decode drops to
  *    the row path for DV'd keys until a compaction folds the deletes
  *    into clean files ([[KeyedCompact]] treats DV'd keys as eligible
  *    and clears their vectors). Metadata AGGREGATE answers survive
  *    (r17): the commit recomputes the affected keys' exact
  *    count/min/max/sum into a stats PATCH — one bounded read-only
  *    job over the affected keys, raising the commit's READ cost from
  *    O(deleted rows) to O(affected keys' rows) while keeping every
  *    later stats question a metadata lookup. TopN budgets SURVIVE
  *    patched deletion vectors for the same reason (the pushdown's
  *    exact-count license reads the patched entries through
  *    [[KeyedStats.readView]]); only a pre-patch dv commit — stale
  *    counts, `unresolvedDvKeys` — refuses until compaction. The DV
  *    container forms live in their readers: bare-ordinal/range lines
  *    in [[KeyedSource.loadDeleted]], the dense base64 bitmap in
  *    [[KeyedSource.bitmapRuns]], and the stats-patch range parse in
  *    [[KeyedStats.readPatch]].
  *
  * Conflict detection is the serializable scanned-seq check: positions
  * are ordinals into the SCANNED snapshot's file lists; any commit
  * landing in between invalidates them and fails the DELETE loudly.
  * Key-grain DELETEs still route to the zero-IO tombstone path
  * (canDeleteWhere wins before row-level planning). */
final class KeyedMorOperation(declared: StructType, path: String,
    key: String, retain: Int, cmd: Command, branch: Option[String] = None)
    extends RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta
    with KeyedRowLevelHost {
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
  import org.apache.spark.sql.connector.write.{DeltaWrite, DeltaWriteBuilder}

  @volatile private[sources] var configuredScan: KeyedScan = _
  override private[sources] def registerScan(s: KeyedScan): Unit =
    configuredScan = s

  override def command(): Command = cmd
  override def description(): String =
    s"GraftKeyedMor path=$path key=$key command=$cmd"

  // both components are METADATA columns (non-nullable by the framing
  // guard — the DECLARED key column is nullable by DDL and Spark
  // refuses nullable row-ID attributes)
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(KeyedSource.KeyCol),
      Expressions.column(KeyedSource.PosCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    if (KeyedSource.readCommitLog(path, conf.value).isEmpty)
      throw new UnsupportedOperationException(
        s"graft-keyed merge-on-read DELETE commits deletion vectors against " +
          s"the snapshot log, but $path has no commit log (legacy flat " +
          "stage) — restage through the connector writer first")
    new KeyedScanBuilder(declared, path, key, conf,
      options.getBoolean("vectorize", true),
      reportStats = true,
      asOf = branch.map(b => KeyedSource.resolveBranch(path, conf.value, b)),
      cowHost = Some(this))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new KeyedMorDeltaWrite(KeyedMorOperation.this, declared, path,
          key, retain, info, branch)
    }
}

final class KeyedMorDeltaWrite(op: KeyedMorOperation,
    declared: StructType, path: String, key: String, retain: Int,
    info: LogicalWriteInfo, branch: Option[String] = None)
    extends org.apache.spark.sql.connector.write.DeltaWrite {
  override def description(): String = s"GraftKeyedMorDeltaWrite path=$path"
  override def toBatch: org.apache.spark.sql.connector.write.DeltaBatchWrite = {
    val idSchema = info.rowIdSchema().orElseThrow(() =>
      new IllegalStateException(
        "graft-keyed merge-on-read DELETE planned without a row-ID schema"))
    new KeyedMorBatchWrite(op, declared, path, key, retain, info.queryId(),
      idSchema,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()),
      branch)
  }
}

/** One task's merge-on-read output: deletion vectors as (raw key,
  * relative dv ref, ordinal count), plus — for UPDATE — the audited
  * stats of the per-key APPEND files holding the new row versions. */
final case class KeyedDvMessage(dvs: Seq[(String, String, Long)],
    inserts: Option[KeyedCommitMessage] = None)
    extends WriterCommitMessage

final class KeyedMorBatchWrite(op: KeyedMorOperation,
    declared: StructType, path: String, key: String, retain: Int,
    queryId: String, idSchema: StructType,
    conf: org.apache.spark.util.SerializableConfiguration,
    branch: Option[String] = None)
    extends org.apache.spark.sql.connector.write.DeltaBatchWrite {

  private def genName = s"_gen-$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriterFactory =
    new KeyedDvWriterFactory(declared, key, path, genName, idSchema, conf,
      KeyedSource.codecOfHead(path, conf.value))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val tDbg = sys.env.contains("SPARK_GRAFT_TIMING")
    var t0 = System.nanoTime()
    def lap(name: String): Unit = if (tDbg) {
      val t1 = System.nanoTime()
      System.err.println(f"[mor-commit] $name%-18s ${(t1 - t0) / 1e9}%8.3f s")
      t0 = t1
    }
    val msgs = messages.toSeq.collect { case m: KeyedDvMessage => m }
    val perKey: Map[String, Seq[(String, Long)]] = msgs.flatMap(_.dvs)
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(x => (x._2, x._3)) }
    // UPDATE's append files: per-key entries MERGED across tasks (an
    // update's new versions may land from several tasks — the gen's
    // sidecar carries one line per key, so counts/min/max/sum fold)
    val insertMsgs = msgs.flatMap(_.inserts)
    val insertEntries: Seq[KeyedStats.Entry] = insertMsgs
      .flatMap(_.keys)
      .groupBy(_.rawKey).toSeq.map { case (_, ks) =>
        KeyedStats.mergeEntries(declared, ks.map(e =>
          KeyedStats.Entry(e.rawKey, e.count, e.mins, e.maxs, e.sums)))
      }
    val hconf = conf.value
    val root = new org.apache.hadoop.fs.Path(path)
    val gen = new org.apache.hadoop.fs.Path(root, genName)
    val fs = root.getFileSystem(hconf)
    // visible no-op: no row matched — burn no snapshot
    if (perKey.isEmpty && insertEntries.isEmpty) { fs.delete(gen, true); return }
    if (insertEntries.nonEmpty) {
      val mergedSk = Array.fill(declared.length)(new KmvSketch)
      insertMsgs.foreach(_.sketches.zipWithIndex.foreach { case (hs, i) =>
        mergedSk(i).addHashes(hs) })
      val table = KeyedStats.TableNdv(insertEntries.map(_.count).sum,
        mergedSk.map(_.estimate))
      KeyedSource.writeFile(fs,
        new org.apache.hadoop.fs.Path(gen, KeyedStats.SidecarFile),
        KeyedStats.render(declared, key, insertEntries, Some(table)))
      KeyedSource.writeFile(fs,
        new org.apache.hadoop.fs.Path(gen, KeyedStats.NdvFile),
        KeyedStats.renderNdv(declared, key, mergedSk.map(_.hashes)))
    }
    val scan = op.configuredScan
    require(scan != null,
      "graft-keyed merge-on-read commit reached without a configured scan")
    val scannedSeq = scan.view.seq
    // ── STATS PATCH (r17): recompute the affected keys' post-delete
    // stats so min/max/sum stay metadata-answered under live deletion
    // vectors (they don't decompose under row deletion — count does,
    // via the dv filenames). One bounded read-only job over EXACTLY
    // the affected keys' DV-applied rows, anti-joined against this
    // commit's own deleted ordinal ranges (tiny, broadcast); the
    // result — one stats line per affected key — lands as a patch
    // file inside this generation, atomic with the commit. Honest
    // cost statement: this raises the DV commit from O(deleted rows)
    // to O(affected keys' rows) READ (writes stay O(deleted)); the
    // alternative was every later stats question paying a data scan
    // until compaction.
    lap("pre-patch")
    if (perKey.nonEmpty) {
      val s = org.apache.spark.sql.SparkSession.active
      import org.apache.spark.sql.functions.{broadcast, col, count, lit, max, min, sum}
      val ranges: Seq[(String, Long, Long)] = perKey.toSeq.flatMap {
        case (k, refs) => refs.flatMap { case (ref, _) =>
          val in = fs.open(new org.apache.hadoop.fs.Path(root, ref))
          val lines = try scala.io.Source.fromInputStream(in, "US-ASCII")
            .getLines().filter(_.nonEmpty).toVector finally in.close()
          lines.flatMap { line =>
            if (line.charAt(0) == 'B')
              KeyedSource.bitmapRuns(line).map { case (a, b) => (k, a, b) }
            else {
              val dash = line.indexOf('-')
              if (dash < 0) Seq((k, line.toLong, line.toLong))
              else Seq((k, line.substring(0, dash).toLong,
                line.substring(dash + 1).toLong))
            }
          }
        }
      }
      lap("dv-range-parse")
      val keyVals: Seq[Any] = declared(key).dataType match {
        case LongType => perKey.keys.toSeq.map(_.toLong)
        case _ => perKey.keys.toSeq
      }
      import s.implicits._
      val rng = ranges.toDF("_dv_k", "_dv_s", "_dv_e")
      val survivors = s.read.format("graft-keyed")
        .option("path", path).option("schema", declared.toDDL)
        .option("key", key).option("asOf", scannedSeq.toString)
        .load()
        .where(col(key).isin(keyVals: _*))
        .select(col("*"), col(KeyedSource.KeyCol), col(KeyedSource.PosCol))
        .join(broadcast(rng),
          col(KeyedSource.KeyCol) === col("_dv_k") &&
            col(KeyedSource.PosCol).between(col("_dv_s"), col("_dv_e")),
          "left_anti")
      val aggExprs = count(lit(1)).as("_n") +:
        declared.fields.toSeq.zipWithIndex.flatMap { case (f, i) =>
          Seq(min(col(f.name)).as(s"_mn$i"), max(col(f.name)).as(s"_mx$i")) ++
            // INT rides the numeric leg like the sidecar writers (r18)
            (if (KeyedStats.numeric(f.dataType))
              Seq(sum(col(f.name)).cast("long").as(s"_sm$i")) else Nil)
        }
      lap("patch-plan-build")
      // bounded collect: ONE row per affected key (the same driver
      // payload class as the dv refs themselves). Grouped by the DATA
      // key column, not the KeyCol metadata string (r20): the scan
      // reports key-grouped partitioning on the data column, so this
      // aggregate plans WITHOUT an Exchange — one stage, no AQE
      // materialization break; the raw-key string is re-rendered on
      // the driver exactly the way the writers render it (toString).
      val aggDf = survivors.groupBy(col(key).as("_pk"))
        .agg(aggExprs.head, aggExprs.tail: _*)
      if (tDbg) { aggDf.queryExecution.executedPlan; lap("patch-optimize") }
      val aggRows = aggDf.collect()
      lap("patch-job")
      val agg = aggRows
        .map { r =>
          val n = declared.length
          val mins = new Array[String](n); val maxs = new Array[String](n)
          val sums = new Array[Long](n)
          declared.fields.zipWithIndex.foreach { case (f, i) =>
            if (KeyedStats.numeric(f.dataType)) {
              // min/max come back typed per column (Long or Integer);
              // the sidecar stores digit strings either way
              mins(i) = String.valueOf(r.getAs[Number](s"_mn$i").longValue)
              maxs(i) = String.valueOf(r.getAs[Number](s"_mx$i").longValue)
              sums(i) = r.getAs[Long](s"_sm$i")
            } else if (KeyedStats.fp(f.dataType)) {
              // Spark's min/max over doubles shares the stored order
              // (NaN greatest), so transforming the extremes back to
              // sortable digits is exact
              def dig(v: Any): String = v match {
                case d: java.lang.Double => KeyedStats.sortableDouble(d).toString
                case fl: java.lang.Float => KeyedStats.sortableFloat(fl).toString
                case other => throw new IllegalStateException(
                  s"unexpected fp aggregate value $other")
              }
              mins(i) = dig(r.getAs[Any](s"_mn$i"))
              maxs(i) = dig(r.getAs[Any](s"_mx$i"))
            } else {
              mins(i) = r.getAs[String](s"_mn$i")
              maxs(i) = r.getAs[String](s"_mx$i")
            }
          }
          // raw-key rendering: the writers store LongType keys as
          // their decimal string (KeyedDvWriter.insert), so toString
          // of the typed group value reproduces the sidecar's raw key
          val pk = String.valueOf(r.getAs[Any]("_pk"))
          pk -> KeyedStats.Entry(pk, r.getAs[Long]("_n"), mins, maxs, sums)
        }.toMap
      val scanView = scan.view
      val patchEntries: Seq[(KeyedStats.Entry, Int)] = perKey.keys.toSeq.sorted
        .map { k =>
          // covered = the key's serving-dir count at the scanned
          // snapshot; the UPDATE path's own appended generation (and
          // any later append) adds its sidecar entry ON TOP
          val covered = scanView.edits.get(k).map(_.length).getOrElse(1)
          val n = declared.length
          agg.get(k) match {
            case Some(e) => (e, covered)
            case None => // every row of k deleted: explicit zero entry
              (KeyedStats.Entry(k, 0L, Array.fill(n)(""), Array.fill(n)(""),
                Array.fill(n)(0L)), covered)
          }
        }
      KeyedSource.writeFile(fs,
        new org.apache.hadoop.fs.Path(gen, KeyedStats.PatchFile),
        KeyedStats.renderPatch(declared, key, patchEntries))
    }
    lap("stats-patch")
    if (KeyedSource.failBeforePublish) throw new IllegalStateException(
      "graft-keyed test hook: crash before publish")
    var priorGens = Set.empty[String]
    val published = KeyedSource.commitLoop(path, hconf, "deletion-vector commit") { prior =>
      val log = prior.getOrElse(throw new IllegalStateException(
        s"graft-keyed deletion-vector commit at $path found no commit log — " +
          "the layout was replaced mid-operation; re-run the DML"))
      val head = branch.fold(log.head)(log.branchHead)
      // SERIALIZABLE: ordinals index the scanned snapshot's file lists
      if (head.seq != scannedSeq) throw new IllegalStateException(
        s"graft-keyed deletion-vector commit at $path conflicts with a " +
          s"concurrent commit: positions were derived from snapshot " +
          s"$scannedSeq but the ${branch.fold("head")(b => s"branch '$b' head")} " +
          s"is now ${head.seq}; re-run the DML")
      priorGens = log.snapshots.flatMap(_.referencedGens).toSet
      val dvs = head.dvs ++ perKey.map { case (k, refs) =>
        k -> (head.dvs.getOrElse(k, Seq.empty) ++ refs.map(_._1))
      }
      // UPDATE's new versions APPEND to their target keys (the same
      // edit mechanism appends/MERGE-inserts use; a key-moving update
      // lands under the NEW key, possibly creating it)
      val baseKeys: Set[String] = {
        val baseGen = new org.apache.hadoop.fs.Path(root, head.gen)
        if (fs.exists(baseGen)) fs.listStatus(baseGen).toSeq.collect {
          case st if st.isDirectory && st.getPath.getName.startsWith("k=") =>
            st.getPath.getName.stripPrefix("k=")
        }.toSet else Set.empty
      }
      def priorLive(k: String): Seq[String] =
        head.edits.getOrElse(k,
          if (baseKeys.contains(k) && !head.tombstones.contains(k)) Seq(head.gen)
          else Seq.empty)
      val written = insertEntries.map(_.rawKey).toSet
      val edits = head.edits ++ written.toSeq.map(k =>
        k -> (priorLive(k) :+ genName))
      val keep = math.max(math.max(log.retain, retain), 1)
      val snap = KeyedSource.Snapshot(log.nextSeq, head.gen,
        head.tombstones -- written, edits, dvs -- (head.tombstones & written),
        branch = branch)
      Some(KeyedSource.CommitLog(keep,
        KeyedSource.trimWindow(log.snapshots :+ snap, keep, log.tags,
          log.branches),
        log.ops, log.tags, log.streams, log.branches))
    }.get
    val live = published.snapshots.flatMap(_.referencedGens).toSet
    KeyedSource.expireGenerations(path, live, hconf, known = priorGens -- live)
    lap("publish+expire")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    if (KeyedSource.failBeforePublish) return
    val gen = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(path), genName)
    val fs = gen.getFileSystem(conf.value)
    fs.delete(gen, true)
  }
}

final class KeyedDvWriterFactory(declared: StructType, key: String,
    path: String, genName: String, idSchema: StructType,
    conf: org.apache.spark.util.SerializableConfiguration,
    codec: String = "none")
    extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
    new KeyedDvWriter(declared, key, path, genName, idSchema, taskId, conf, codec)
}

/** Accumulates deleted ordinals per key; close-time flush writes one
  * `dv-<count>-<task>` file per key into the uncommitted generation.
  * Ordinals are Ints by the layout's per-key row bound (the same bound
  * the decode batch carries); a position beyond it fails loudly. */
final class KeyedDvWriter(declared: StructType, key: String, path: String,
    genName: String, idSchema: StructType, taskId: Long,
    conf: org.apache.spark.util.SerializableConfiguration,
    codec: String = "none")
    extends org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {

  private val keyIdx = idSchema.fieldIndex(KeyedSource.KeyCol)
  private val posIdx = idSchema.fieldIndex(KeyedSource.PosCol)
  private val dataKeyIdx = declared.fieldIndex(key)
  // shared kind codes (KeyedSource.kindOf — the r18 review's INT+MOR
  // lesson generalized: one mapping, every storable type)
  private val kind: Array[Int] = declared.fields.map(f =>
    KeyedSource.kindOf(f.dataType))
  private val acc =
    scala.collection.mutable.LinkedHashMap.empty[String, java.util.BitSet]
  // UPDATE's new row versions, buffered per TARGET key (an update that
  // moves the key buffers under the new one) — memory is this task's
  // updated rows, the update's own size, not the corpus's
  private val pending = scala.collection.mutable.LinkedHashMap
    .empty[String, scala.collection.mutable.ArrayBuffer[Array[Any]]]

  private def rawKeyOf(id: InternalRow): String =
    id.getUTF8String(keyIdx).toString

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    val pos = id.getLong(posIdx)
    if (pos > Int.MaxValue) throw new IllegalStateException(
      s"graft-keyed deletion-vector position $pos exceeds the per-key " +
        "row bound")
    acc.getOrElseUpdate(rawKeyOf(id), new java.util.BitSet())
      .set(pos.toInt)
  }

  /** MERGE's not-matched rows (and UPDATE's new versions) buffer as
    * APPENDS to their target key. Values are OWNED copies — the row's
    * buffers are reused. */
  override def insert(row: InternalRow): Unit = {
    val copy = new Array[Any](declared.length)
    var i = 0
    while (i < declared.length) {
      copy(i) = if (row.isNullAt(i)) null
        else KeyedSource.boxOf(row, i, kind(i))
      i += 1
    }
    val target =
      if (copy(dataKeyIdx) == null) "NULL" // the audited writer refuses it
      else if (kind(dataKeyIdx) == 1)
        copy(dataKeyIdx).asInstanceOf[UTF8String].toString
      else copy(dataKeyIdx).toString
    pending.getOrElseUpdate(target,
      scala.collection.mutable.ArrayBuffer.empty) += copy
  }

  /** UPDATE (and MERGE's matched-update) = the old version's
    * deletion-vector entry + the new version appended. */
  override def update(metadata: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    delete(metadata, id)
    insert(row)
  }

  override def commit(): WriterCommitMessage = {
    // flush UPDATE's new versions FIRST, through the same audited
    // writer every data path uses (framing guard, per-key stats,
    // sketches) — one append file per (key, task)
    val inserts: Option[KeyedCommitMessage] =
      if (pending.isEmpty) None
      else {
        val kw = new KeyedDataWriter(declared, key, s"$path/$genName",
          taskId, conf, codec)
        pending.valuesIterator.foreach(_.foreach(vals => kw.write(
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals))))
        Some(kw.commit().asInstanceOf[KeyedCommitMessage])
      }
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf.value)
    val out = acc.toSeq.map { case (raw, bits) =>
      val count = bits.cardinality().toLong
      // underscore prefix: invisible to the frame decoders (the Hadoop
      // convention PageReader already honors), so a DV can live beside
      // its key's data files — including inside an UPDATE's append gen
      val name = s"_dv-$count-$taskId"
      val rel = s"$genName/k=$raw/$name"
      val p = new org.apache.hadoop.fs.Path(path, rel)
      val os = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16)
      // CONTAINER CHOICE (r17): contiguous runs (the predicate-delete
      // shape) write RUN-LENGTH `start-end` lines, singletons bare; a
      // DENSE SCATTERED vector (many short runs — every-other-row
      // deletes) would degrade to a line per run, so past the density
      // threshold the whole vector writes as ONE base64 bitmap line
      // (`B<base64 of BitSet bytes>` — ~1 bit per ordinal vs ~8 bytes
      // per run). The loaders read all three forms
      // ([[KeyedSource.loadDeleted]], [[KeyedSource.dvRangesOf]]).
      try {
        var runs = 0
        var i = bits.nextSetBit(0)
        while (i >= 0) { runs += 1; i = bits.nextSetBit(bits.nextClearBit(i)) }
        val maxOrd = bits.length() // one past the highest set bit
        if (runs > 64 && runs.toLong > (maxOrd.toLong >> 5)) {
          os.write('B')
          os.write(java.util.Base64.getEncoder.encode(bits.toByteArray))
          os.write('\n')
        } else {
          i = bits.nextSetBit(0)
          while (i >= 0) {
            val end = bits.nextClearBit(i) - 1
            val tok =
              if (end > i) s"$i-$end"
              else java.lang.Integer.toString(i)
            os.write(tok.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
            os.write('\n')
            i = bits.nextSetBit(end + 1)
          }
        }
      } finally os.close()
      (raw, rel, count)
    }
    KeyedDvMessage(out, inserts)
  }

  override def abort(): Unit = ()
  override def close(): Unit = ()
}
