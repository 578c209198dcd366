package graft

import graft.sources.Paginated
import graft.sources.Paginated.Page
import org.apache.spark.sql.types._

class PaginatedSpec extends SparkSpec {

  // in-memory fake of a limit/offset API: 25 records, page size 10
  private val total = 25
  private val pageSize = 10
  private def fakeApi(offset: Long): Page = {
    val recs = (offset until math.min(offset + pageSize, total.toLong))
      .map(i => s"""{"id":$i,"name":"rec_$i"}""")
    val next = if (offset + pageSize < total) Some(offset + pageSize) else None
    Page(recs, next)
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("fetchAll drains every page exactly once, in order") {
    val recs = Paginated.fetchAll(fakeApi)
    assert(recs.length == total)
    assert(recs.head.contains("\"id\":0") && recs.last.contains("\"id\":24"))
  }

  test("executor-side parse with declared schema") {
    val df = Paginated.toDataFrame(spark, Paginated.fetchAll(fakeApi), schema)
    assert(df.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(df.count() == total)
    assert(df.selectExpr("sum(id)").collect()(0).getLong(0) == (0 until total).sum)
  }

  test("empty source yields an empty, well-typed frame") {
    val df = Paginated.toDataFrame(spark,
      Paginated.fetchAll(_ => Page(Seq.empty, None)), schema)
    assert(df.isEmpty && df.schema.length == 2)
  }

  test("non-monotone and runaway pagination are rejected") {
    intercept[IllegalStateException] {
      Paginated.fetchAll(offset => Page(Seq("{}"), Some(offset))) // stuck cursor
    }
    intercept[IllegalStateException] {
      Paginated.fetchAll(offset => Page(Seq("{}"), Some(offset + 1)), maxPages = 5)
    }
  }
}
