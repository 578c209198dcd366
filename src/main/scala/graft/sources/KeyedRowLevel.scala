package graft.sources

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
final class KeyedRowLevelBuilder(declared: StructType, path: String,
    key: String, sortBy: Seq[String], retain: Int,
    info: RowLevelOperationInfo) extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new KeyedCowOperation(declared, path, key, sortBy, retain, info.command())
}

final class KeyedCowOperation(declared: StructType, path: String, key: String,
    sortBy: Seq[String], retain: Int, cmd: Command) extends RowLevelOperation {

  /** The scan instance Spark executes for this operation — its final
    * effective key set (static pushdown ∩ runtime group filter) IS the
    * affected-group set the commit replaces. Registered at scan build;
    * read at commit, which runs strictly after the query executed. */
  @volatile private[sources] var configuredScan: KeyedScan = _

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
      reportStats = true, asOf = None, cowHost = Some(this))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        val schema = info.schema()
        require(schema.fieldNames.sameElements(declared.fieldNames),
          s"graft-keyed $cmd must write the full layout schema " +
            s"${declared.simpleString}, got ${schema.simpleString}")
        new KeyedCowWrite(KeyedCowOperation.this, schema, path, key, sortBy,
          retain, info.queryId())
      }
    }
}

/** The copy-on-write replacement write: same clustered-by-key +
  * key-first-sorted distribution as the overwrite write (each affected
  * key lands wholly in one task as one file), same audited writer. */
final class KeyedCowWrite(op: KeyedCowOperation, schema: StructType,
    path: String, key: String, sortBy: Seq[String], retain: Int,
    queryId: String)
    extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}

  override def description(): String =
    s"GraftKeyedCowWrite path=$path key=$key"
  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.column(key)))
  override def requiredOrdering(): Array[SortOrder] =
    (key +: sortBy).map(c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray
  override def toBatch: BatchWrite =
    new KeyedCowBatchWrite(op, schema, path, key, sortBy, retain, queryId,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
}

final class KeyedCowBatchWrite(op: KeyedCowOperation, schema: StructType,
    path: String, key: String, sortBy: Seq[String], retain: Int,
    queryId: String, conf: org.apache.spark.util.SerializableConfiguration)
    extends BatchWrite {

  private def genName = s"_gen-$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KeyedCowWriterFactory(schema, key, s"$path/$genName", conf)

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
    val table = {
      val merged = Array.fill(schema.length)(new KmvSketch)
      msgs.foreach(_.sketches.zipWithIndex.foreach { case (hs, i) =>
        merged(i).addHashes(hs) })
      KeyedStats.TableNdv(entries.map(_.count).sum, merged.map(_.estimate))
    }
    KeyedSource.writeFile(fs, new org.apache.hadoop.fs.Path(gen, KeyedStats.SidecarFile),
      KeyedStats.render(schema, key, sidecarEntries, Some(table)))
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
      val head = log.head
      // SERIALIZABLE conflict check: the replacement rows were derived
      // from the scanned snapshot; any commit that moved the head since
      // invalidates them (write skew) — fail loudly, never rebase
      if (head.seq != scannedView.seq) throw new IllegalStateException(
        s"graft-keyed row-level commit at $path conflicts with a concurrent " +
          s"commit: rows were derived from snapshot ${scannedView.seq} but the " +
          s"head is now ${head.seq}; re-run the DML against the fresh table")
      priorGens = log.snapshots
        .flatMap(s => s.gen +: s.edits.valuesIterator.flatten.toSeq).toSet
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
      val snap = KeyedSource.Snapshot(head.seq + 1, head.gen, tombstones, edits)
      Some(KeyedSource.CommitLog(keep,
        KeyedSource.trimWindow(log.snapshots :+ snap, keep, log.tags),
        log.ops, log.tags))
    }.get
    val live = published.snapshots
      .flatMap(s => s.gen +: s.edits.valuesIterator.flatten.toSeq).toSet
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
    genDir: String, conf: org.apache.spark.util.SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] = {
    val inner = new KeyedDataWriter(schema, key, genDir, taskId, conf)
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
