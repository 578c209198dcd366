package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata catalog (TESTDATA.md / FIXTURES.md §A): explicit StructTypes
  * for every table — never `inferSchema`. At 100 TB an inferred read
  * costs a footer-sampling job over the whole listing before the real
  * scan; a declared schema plans immediately and lets Catalyst prune
  * columns/partitions against it.
  *
  * The reference pushes projection and filters to its source
  * (`/root/reference/lambda/extraction/lambda_function.py:146-161`);
  * here the same behaviors are Catalyst's ColumnPruning /
  * PushDownPredicates against these parquet scans.
  */
object Tables {

  val region = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** The NANOS-generation events schema: `ts` as INT64 TIMESTAMP(NANOS),
    * which Spark's parquet reader rejects natively; with the legacy conf
    * it surfaces as nanos-since-epoch Long and we truncate to micros —
    * exactly what DuckDB's micro-precision TIMESTAMP does on the same
    * file, keeping oracle parity. Division must be integral (`div`): a
    * Long→Double round-trip at 1.7e18 ns loses precision.
    *
    * The physical type of `ts` is a DRIVER choice that has already
    * changed once (TIMESTAMP(NANOS) → TIMESTAMP(MICROS,
    * isAdjustedToUTC=false)), so readers must not bake one generation
    * in: [[eventsTsType]] detects the stored type from one footer and
    * [[normalizeEventTs]] maps any generation to the single engine
    * contract — micro-precision TimestampType under the UTC session.
    */
  val eventsRaw = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings = StructType(Seq(
    StructField("vec_id", LongType),
    // file scans force containsNull = true on read regardless of what
    // is declared here — FuseDotProductRule stays sound under that by
    // being null-element-exact, not by relying on this type
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> eventsRaw,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Invalidation stamp for a detected-file memo: mtime + length. For
    * a DIRECTORY the stamp folds per-child status in (max child mtime
    * + total child length + child count, one listStatus round-trip):
    * a dir's own mtime only moves on entry create/delete, so an
    * in-place part-file rewrite inside it would otherwise slip under
    * the stamp — the exact staleness window the stamp exists to close
    * (ADVICE r9). Honest residual hole, now reduced to: regenerating a
    * file with identical length within one mtime tick — no producer
    * here does that, and the stamp stays one metadata round-trip where
    * the memoized work costs a footer read or a count job. */
  private[graft] def fileStamp(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val st = fs.getFileStatus(p)
    if (st.isDirectory) {
      val kids = fs.listStatus(p)
      val maxM = (st.getModificationTime +: kids.map(_.getModificationTime).toSeq).max
      s"$path@$maxM:${kids.map(_.getLen).sum}:${kids.length}"
    } else s"$path@${st.getModificationTime}:${st.getLen}"
  }

  // keyed by PATH with the stamp INSIDE the value: inserting a new
  // generation replaces the old entry instead of accumulating one dead
  // entry per observed stamp over a long session (ADVICE r9)
  private val tsTypeMemo =
    scala.collection.concurrent.TrieMap.empty[String, (String, DataType)]

  /** Test hook: the memo's current key set. Pins the bounded-growth
    * contract (one entry per PATH, stamps replace in place) — a
    * refactor back to stamp-keyed entries grows this per regeneration
    * and fails MemoStalenessSpec. */
  private[graft] def tsTypeMemoKeys: Set[String] = tsTypeMemo.keySet.toSet

  /** The stored logical type of `ts` in the event files under `path`
    * (a file or a directory of files): one driver-side footer read,
    * memoized per (path, stamp) — metadata-cheap even at 100 TB, where
    * inferring the WHOLE schema per query would not be. The stamp in
    * the value is the invalidation: the driver has regenerated the
    * testdata with a DIFFERENT stored type once already, and a
    * path-only cache would keep declaring the stale generation's
    * schema over the new file — the silent 1000× misread this
    * detection exists to prevent. One FS stat per call is cheaper
    * than the footer read the memo avoids. Generations seen so far:
    * INT64 TIMESTAMP(NANOS) surfaces as LongType (under the session's
    * `nanosAsLong`), TIMESTAMP(MICROS, isAdjustedToUTC=false) as
    * TimestampNTZType, UTC micros (our own sinks) as TimestampType.
    */
  private[graft] def eventsTsType(spark: SparkSession, path: String): DataType = {
    val stamp = fileStamp(spark, path)
    tsTypeMemo.get(path) match {
      case Some((s, dt)) if s == stamp => dt
      case _ =>
        val dt = spark.read.parquet(path).schema("ts").dataType
        tsTypeMemo.put(path, (stamp, dt))
        dt
    }
  }

  /** [[eventsRaw]] with `ts` declared as the detected stored type, so
    * the scan never relies on runtime coercion between parquet logical
    * types (declared-Long over a MICROS column silently yields micros
    * reinterpreted as nanos — a 1000× error, not a crash). */
  private[graft] def eventsSchemaFor(dt: DataType): StructType =
    StructType(eventsRaw.fields.map(f =>
      if (f.name == "ts") f.copy(dataType = dt) else f))

  /** Normalize a detected-generation `ts` to the engine contract:
    * micro-precision TimestampType. The NTZ→LTZ cast is wall-clock
    * exact because every graft session pins spark.sql.session.timeZone
    * to UTC (Verify/Bench/test builders). */
  private[graft] def normalizeEventTs(df: DataFrame, dt: DataType): DataFrame =
    dt match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Load one testdata table with its declared schema. `events` comes
    * back with `ts` already converted to micro-precision TimestampType
    * whatever generation the driver wrote (see [[eventsTsType]]).
    *
    * Reading NANOS-generation `events` requires `spark.sql.legacy
    * .parquet.nanosAsLong=true` in the session (set once by the
    * Verify/Bench/test session builders — a loader must not mutate
    * shared session state as a side effect of a table name).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      val path = s"$sfDir/events.parquet"
      val dt = eventsTsType(spark, path)
      normalizeEventTs(spark.read.schema(eventsSchemaFor(dt)).parquet(path), dt)
    } else
      spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")

  /** Events at or after `isoUtc`, with the predicate applied to the
    * STORED `ts` representation *before* the timestamp conversion. A
    * filter on the derived column cannot reach the scan (no pushdown
    * through `timestamp_micros(x div 1000)` or a type cast), so at
    * 100 TB it reads every row-group; comparing the stored value
    * directly pushes down and prunes row-groups on parquet min/max
    * stats. The literal is converted once on the driver, typed to the
    * stored generation.
    */
  def eventsSince(spark: SparkSession, sfDir: String, isoUtc: String): DataFrame = {
    val instant = java.time.Instant.parse(isoUtc)
    val path = s"$sfDir/events.parquet"
    val dt = eventsTsType(spark, path)
    val pivot = dt match {
      // exact nanos: epochMilli * 1e6 would silently drop
      // sub-millisecond fractions of the pivot, off-by-up-to-1ms on
      // the filter boundary
      case LongType =>
        lit(instant.getEpochSecond * 1000000000L + instant.getNano)
      case TimestampNTZType =>
        lit(java.time.LocalDateTime.ofInstant(instant, java.time.ZoneOffset.UTC))
      case _ => lit(java.sql.Timestamp.from(instant))
    }
    normalizeEventTs(
      spark.read.schema(eventsSchemaFor(dt)).parquet(path)
        .filter(col("ts") >= pivot),
      dt)
  }
}
