package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.annotation.tailrec

/** Paginated-source ingestion (SURVEY.md §2.1 S1): the reference pages
  * a REST endpoint with limit/offset until `next` is null
  * (`/root/reference/lambda/extraction/lambda_function.py:142-183`) and
  * only then persists. The engine twin keeps the page loop where it
  * belongs — on the driver, tiny control plane — and puts every byte of
  * payload through the executor data plane:
  *
  *   1. `fetchAll` drains a pluggable page fetcher (offset → page of
  *      JSON records + next offset) with bounded accumulation,
  *   2. the accumulated page payloads are parallelized and parsed with
  *      a DECLARED schema on executors (`spark.read.json` over an
  *      RDD[String] — never driver-side JSON parsing of record bodies).
  *
  * At real scale the fetcher is usually replaced by files staged per
  * page (`raw_data/to_processed/`, see Stages) and this module's read
  * path degenerates to `spark.read.schema(...).json(dir)` — the loop
  * exists for live-API parity, and its tests document the pagination
  * semantics (ordering, termination, empty-page handling).
  */
object Paginated {

  /** One page of raw records plus the next offset (None = done) —
    * mirrors the reference's `{items, next}` response envelope. */
  final case class Page(records: Seq[String], next: Option[Long])

  /** Drain the pager from offset 0. `maxPages` bounds the loop —
    * a malformed `next` chain must not spin forever (the reference
    * trusts the API; we don't). */
  def fetchAll(fetchPage: Long => Page, maxPages: Int = 10000): Seq[String] = {
    @tailrec
    def loop(offset: Long, pages: Int, acc: Vector[String]): Vector[String] = {
      if (pages >= maxPages)
        throw new IllegalStateException(s"pagination exceeded $maxPages pages")
      val page = fetchPage(offset)
      val next = acc ++ page.records
      page.next match {
        case Some(n) if n > offset => loop(n, pages + 1, next)
        case Some(n) =>
          throw new IllegalStateException(s"non-monotone pagination: $offset -> $n")
        case None => next
      }
    }
    loop(0L, 0, Vector.empty)
  }

  /** Parse drained records into a DataFrame with a declared schema —
    * parsing happens on executors, the driver only carries the raw
    * strings it already had to hold for the HTTP exchange. */
  def toDataFrame(spark: SparkSession, records: Seq[String], schema: StructType,
      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else math.max(1, math.min(records.size / 1000 + 1, spark.sparkContext.defaultParallelism))
    import spark.implicits._
    val ds = spark.createDataset(records)(Encoders.stringEnc).repartition(n)
    spark.read.schema(schema).json(ds)
  }

  private object Encoders {
    val stringEnc: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
  }
}
