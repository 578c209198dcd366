package graft

import graft.functions.Text
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The native hash kernels (graft.plans.TextHashKernels) must be
  * bit-identical to the HOF formulations they replace — that identity
  * is what keeps the dedup queries' DuckDB oracles valid after the
  * swap-in. Checked over the real sf0.001 documents (both the
  * interpreted eval and the codegen path run, since results flow
  * through joins/aggregates) plus literal edge cases. */
class NativeKernelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sh = Tables.load(spark, sf0001, "documents")
    .withColumn("tk", Text.tokens(col("text")))
    .withColumn("sh", Text.shingles(col("tk")))
    .filter(size(col("sh")) > 0)
    .select("doc_id", "sh")

  test("graft_shingles == HOF shingles (distinct, first-occurrence order, empty under n)") {
    val docs = Tables.load(spark, sf0001, "documents")
      .withColumn("tk", Text.tokens(col("text")))
    val mismatch = docs.select(
      Text.shinglesNative(col("tk")).as("native"),
      Text.shingles(col("tk")).as("hof"))
      .filter(!(col("native") <=> col("hof"))).count()
    assert(mismatch == 0)
    // under-n edge: empty array, not null
    val short = Seq((1L, "a b")).toDF("id", "text")
      .select(Text.shinglesNative(Text.tokens(col("text"))).as("sh")).head()
    assert(!short.isNullAt(0) && short.getSeq[String](0).isEmpty)
  }

  test("graft_md5_longs == HOF md5/conv pipeline (mod M and raw)") {
    val mismatch = sh.select(
      Text.md5LongsNative(col("sh"), Text.MinhashMod).as("native"),
      Text.tokenHashesPortable(col("sh")).as("hof"),
      Text.md5LongsNative(col("sh"), 0L).as("nativeRaw"),
      transform(col("sh"),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")).as("hofRaw"))
      .filter(!(col("native") <=> col("hof")) || !(col("nativeRaw") <=> col("hofRaw")))
      .count()
    assert(mismatch == 0)
  }

  test("graft_gram_md5 == HOF sequence/slice/md5 sliding grams (byte-equal hex)") {
    // the x49 staging swap (r19): native kernel vs the exact HOF chain
    // it replaced, over the real corpus filtered to size >= n (the one
    // shape both forms are specified for — sequence(1, len-9) descends
    // below it and no caller feeds that)
    val docs = Tables.load(spark, sf0001, "documents")
      .withColumn("tk", Text.tokens(col("text")))
      .filter(size(col("tk")) >= 10)
    val mismatch = docs.select(
      Text.gramMd5Native(col("tk"), 10).as("native"),
      transform(sequence(lit(1), size(col("tk")) - 9),
        i => md5(concat_ws(" ", slice(col("tk"), i, lit(10))))).as("hof"))
      .filter(!(col("native") <=> col("hof"))).count()
    assert(mismatch == 0)
    // under-n edge: empty array, not null (callers filter anyway)
    val short = Seq((1L, "a b")).toDF("id", "text")
      .select(Text.gramMd5Native(Text.tokens(col("text")), 10).as("g")).head()
    assert(!short.isNullAt(0) && short.getSeq[String](0).isEmpty)
  }

  test("graft_minhash == minhashFromHashes over the same base hashes") {
    val hs = sh.withColumn("hs", Text.md5LongsNative(col("sh"), Text.MinhashMod))
    val mismatch = hs.select(
      Text.minhashNative(col("hs"), 16).as("native"),
      Text.minhashFromHashes(col("hs"), 16).as("hof"))
      .filter(!(col("native") <=> col("hof"))).count()
    assert(mismatch == 0)
  }

  test("graft_minhash rejects hashes not pre-reduced mod M (fail loud, not wrap)") {
    // raw md5 longs (up to 2^60) would silently wrap the slot multiply;
    // the kernel must throw instead of returning plausible garbage
    val raw = sh.withColumn("hs", Text.md5LongsNative(col("sh"), 0L))
    val e = intercept[Exception] {
      raw.select(Text.minhashNative(col("hs"), 16).as("mh")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("pre-reduced mod")))
  }

  test("graft_simhash == simhash60 (votes + packing)") {
    val mismatch = sh.select(
      Text.simhashNative(Text.md5LongsNative(col("sh"), 0L), 60).as("native"),
      Text.simhash60(col("sh")).as("hof"))
      .filter(!(col("native") <=> col("hof"))).count()
    assert(mismatch == 0)
  }

  test("empty feature arrays yield NULL signatures (no degenerate band)") {
    val rows = Seq((1L, Seq.empty[String]), (2L, Seq("a b c", "b c d")))
      .toDF("id", "sh")
      .select(
        Text.minhashNative(Text.md5LongsNative(col("sh"), Text.MinhashMod), 4).as("mh"),
        Text.simhashNative(Text.md5LongsNative(col("sh"), 0L), 60).as("sh60"))
      .orderBy(lit(1))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(!rows(1).isNullAt(0) && !rows(1).isNullAt(1))
  }

  test("rollingHashPortable: order-sensitive, stays under 2^40") {
    val fp = Seq((1L, "a b c d e"), (2L, "e d c b a"), (3L, "a b c d e"))
      .toDF("id", "text")
      .select(col("id"), Text.rollingHashPortable(Text.tokens(col("text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(3L))      // deterministic
    assert(fp(1L) != fp(2L))      // order-sensitive
    assert(fp.values.forall(v => v >= 0 && v < Text.RollingMod))
  }

  test("graft_minhash/graft_simhash reject non-literal width") {
    val e = intercept[Exception] {
      sh.select(call_function("graft_minhash",
        Text.md5LongsNative(col("sh"), Text.MinhashMod), col("doc_id"))).collect()
    }
    assert(e.getMessage.contains("NON_FOLDABLE_ARGUMENT") ||
      e.getMessage.toLowerCase.contains("foldable"))
  }
}
