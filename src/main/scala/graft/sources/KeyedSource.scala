package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 KEY-GROUPED source (`graft-keyed`) — the
  * storage-partitioned-join (SPJ) successor of q47's catalog-bucketed
  * layout, expressed at the CONNECTOR layer.
  *
  * q47 proves the layout lever through Spark's own catalog: bucketed
  * tables report hashpartitioning and a fact⋈fact join plans with zero
  * Exchange. That works only for tables Spark itself wrote. The DSv2
  * generalization — what Iceberg/Delta do in production — is a
  * connector whose Scan REPORTS its storage partitioning
  * ([[SupportsReportPartitioning]] returning [[KeyGroupedPartitioning]]
  * over `identity(keyColumn)`, one [[HasPartitionKey]] input partition
  * per stored key directory), so Catalyst aligns the two sides by
  * partition VALUE and deletes both shuffles from the join. At 100 TB
  * this is the join class broadcast cannot touch (neither side fits an
  * executor) where even the q45 salting answer still pays two
  * full-table shuffles; here the shuffle was paid ONCE at layout-write
  * time and every subsequent co-keyed join is exchange-free.
  *
  * Layout: `k=<value>/` subdirectories under the staged root, one per
  * distinct key value, US-framed records ([[PageSource]]'s x94
  * sentinel discipline — the row decode is [[PageReader]] itself, the
  * connectors share it). The key column is part of the DECLARED schema
  * (option `key` names it); for a high-cardinality join key the stager
  * materializes a bounded surrogate (`kb = doc_id % buckets`) and the
  * join carries `kb` alongside the true key — exactly how bucketed
  * SPJ tables key their layouts when the native bucket-transform
  * function catalog is not in play.
  *
  * Session prerequisite: `spark.sql.sources.v2.bucketing.enabled=true`
  * (off ⇒ the report is ignored and plans fall back to ordinary
  * shuffled joins — correctness unchanged, the layout lever unused).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-keyed")
  *     .option("path", stagedDir)
  *     .option("schema", "kb BIGINT, doc_id BIGINT, n_chars BIGINT")
  *     .option("key", "kb")
  *     .load()
  * }}}
  */
class KeyedSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-keyed"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType.fromDDL(Option(options.get("schema")).getOrElse(
      throw new IllegalArgumentException(
        "graft-keyed requires a DECLARED schema (option 'schema', DDL form)")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new KeyedTable(schema, properties.get("path"),
      Option(properties.get("key")).getOrElse(throw new IllegalArgumentException(
        "graft-keyed requires option 'key' (the layout's key column)")))

  override def supportsExternalMetadata(): Boolean = true
}

final class KeyedTable(declared: StructType, path: String, key: String)
    extends Table with SupportsRead {
  require(path != null, "graft-keyed requires option 'path' (the staged key directory)")
  require(declared.fieldNames.contains(key),
    s"key column '$key' must be part of the declared schema ${declared.simpleString}")
  override def name(): String = s"graft-keyed:$path"
  override def schema(): StructType = declared
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  // analysis-time Hadoop conf capture — same contract as PageTable
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeyedScanBuilder(declared, path, key,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
}

final class KeyedScanBuilder(full: StructType, path: String, key: String,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new KeyedScan(full, required, path, key, conf)
}

/** One `k=<v>/` directory ≙ one input partition carrying its key value
  * ([[HasPartitionKey]]); the scan reports [[KeyGroupedPartitioning]]
  * over `identity(key)` so two co-keyed scans join shuffle-free.
  *
  * The report degrades honestly: if column pruning removed the key
  * column, the clustering expression could not resolve against the
  * output and Spark would fall back to unknown partitioning on its
  * own — a co-keyed JOIN always projects the key, so the fallback
  * only fires for plans that never needed the alignment. */
final class KeyedScan(full: StructType, required: StructType, path: String,
    key: String, conf: org.apache.spark.util.SerializableConfiguration)
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftKeyed path=$path key=$key pruned=${required.fieldNames.mkString(",")}"

  private lazy val partitions: Array[InputPartition] = {
    val keyField = full(full.fieldIndex(key))
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf.value)
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("k="))
      .map { s =>
        val raw = s.getPath.getName.stripPrefix("k=")
        val v: Any = keyField.dataType match {
          case LongType => raw.toLong
          case StringType => UTF8String.fromString(raw)
          case other => throw new IllegalArgumentException(
            s"graft-keyed supports BIGINT and STRING keys, got $other")
        }
        KeyedPartition(s.getPath.toString, v)
      }
      .sortBy(_.pageDir)
      .toArray[InputPartition]
  }

  override def planInputPartitions(): Array[InputPartition] = partitions

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.identity(key)), partitions.length)

  override def createReaderFactory(): PartitionReaderFactory =
    new KeyedReaderFactory(full, required, conf)
}

/** Serializable key-directory partition; `partitionKey` is the stored
  * key VALUE — what Spark aligns the two join sides by. */
final case class KeyedPartition(pageDir: String, keyValue: Any)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](keyValue))
}

final class KeyedReaderFactory(full: StructType, required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  // row decode IS PageReader — the connectors share the US-framed
  // line format and the index-addressed split
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PageReader(partition.asInstanceOf[KeyedPartition].pageDir, full, required, conf)
}

object KeyedSource {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  /** Stage `df` under `out` as a `k=<v>/` keyed layout (US-framed,
    * one file per key — the write-once shuffle that every later
    * co-keyed join amortizes). The key column must be BIGINT or a
    * STRING over [A-Za-z0-9_.-] (it becomes a directory name); the
    * framing guard matches [[PageSource.stageDocuments]]. */
  def stageKeyed(spark: SparkSession, df: DataFrame, out: String,
      key: String): String = {
    val cols = df.schema.fieldNames.toSeq
    require(cols.contains(key), s"key '$key' not in ${cols.mkString(",")}")
    val badKey = df.schema(key).dataType match {
      case LongType => lit(false)
      case StringType => !col(key).rlike("^[A-Za-z0-9_.-]+$")
      case other => throw new IllegalArgumentException(
        s"graft-keyed supports BIGINT and STRING keys, got $other")
    }
    val bad = (badKey +: cols.map(c => col(c).isNull ||
        col(c).cast("string").contains(PageSource.US) ||
        col(c).cast("string").contains("\u001E") ||
        col(c).cast("string").contains("\n") || col(c).cast("string").contains("\r")))
      .reduce(_ || _)
    df.select(
        when(bad, raise_error(concat(lit("graft-keyed framing violation at key="),
            col(key).cast("string"))))
          .otherwise(concat_ws(PageSource.US, cols.map(col): _*)).as("value"),
        col(key).cast("string").as("k"))
      // shuffle by key BEFORE the dynamic-partition write — the key
      // space is the write parallelism and each key gets exactly one
      // file (same rationale as PageSource.stageDocuments)
      .repartition(col("k"))
      .write.mode("overwrite").partitionBy("k").text(out)
    out
  }
}
