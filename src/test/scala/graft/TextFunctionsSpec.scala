package graft

import graft.functions.Text
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .withColumn("tk", Text.tokens(col("text")))
      .withColumn("sh", Text.shingles(col("tk")))

  test("shingles: 3-gram windows, distinct, empty under 3 tokens") {
    val rows = docs("a b c d", "a b", "x y z x y z")
      .select("doc_id", "sh").orderBy("doc_id").collect()
    assert(rows(0).getSeq[String](1) == Seq("a b c", "b c d"))
    assert(rows(1).getSeq[String](1) == Seq.empty)
    // "x y z x y z": windows repeat once wrapped; distinct keeps 3
    assert(rows(2).getSeq[String](1).toSet == Set("x y z", "y z x", "z x y"))
  }

  test("minhashSignature: null for empty shingle sets, H slots otherwise") {
    val rows = docs("a b c d", "a b")
      .select(col("doc_id"), Text.minhashSignature(col("sh"), 8).as("sig"))
      .orderBy("doc_id").collect()
    assert(rows(0).getSeq[Long](1).length == 8)
    assert(rows(1).isNullAt(1))
  }

  test("portable minhash: deterministic, shared slots for near-identical docs") {
    val d = docs("a b c d e f g h", "a b c d e f g h", "q r s t u v w x")
      .withColumn("hs", Text.tokenHashesPortable(col("sh")))
      .select(col("doc_id"), Text.minhashFromHashes(col("hs"), 16).as("sig"))
      .orderBy("doc_id").collect()
    val (s0, s1, s2) = (d(0).getSeq[Long](1), d(1).getSeq[Long](1), d(2).getSeq[Long](1))
    assert(s0 == s1)                 // identical docs -> identical signature
    assert(s0 != s2)                 // disjoint shingles -> different signature
    assert(s0.forall(v => v >= 0 && v < Text.MinhashMod))
  }

  test("simhash60: deterministic, zero self-hamming, chunks cover the bits") {
    val d = docs("a b c d e f", "a b c d e f", "u v w x y z")
      .select(col("doc_id"), Text.simhash60(col("sh")).as("fp"))
      .withColumn("chunks", Text.simhashChunks(col("fp"), 6, 10))
      .withColumn("self_ham", Text.hamming(col("fp"), col("fp"), 60))
      .orderBy("doc_id").collect()
    assert(d(0).getLong(1) == d(1).getLong(1))
    assert(d(0).getLong(1) != d(2).getLong(1))
    assert(d.forall(_.getLong(3) == 0L))
    assert(d(0).getSeq[Long](2).forall(c => c >= 0 && c < 1024))
    // chunks reconstruct the fingerprint
    val fp = d(0).getLong(1)
    val rebuilt = d(0).getSeq[Long](2).zipWithIndex.map { case (c, j) => c << (j * 10) }
      .reduce(_ | _)
    assert(rebuilt == fp)
  }

  test("contentFingerprint: invariant under shingle-set-preserving reorder") {
    // both docs have distinct-shingle set {a b c, b c a, c a b}
    val rows = docs("a b c a b c", "b c a b c a", "a b c d")
      .select(col("doc_id"), Text.contentFingerprint(col("sh")).as("fp"))
      .orderBy("doc_id").collect()
    assert(rows(0).getString(1) == rows(1).getString(1))
    assert(rows(0).getString(1) != rows(2).getString(1))
  }

  test("rollingHash: order-sensitive and deterministic") {
    val r1 = docs("a b c", "c b a", "a b c")
      .select(col("doc_id"), Text.rollingHash(col("tk")).as("fp"))
      .orderBy("doc_id").collect()
    assert(r1(0).getLong(1) != r1(1).getLong(1)) // order matters
    assert(r1(0).getLong(1) == r1(2).getLong(1)) // deterministic
  }

  test("fast path (xxhash64): simhash64 + bandKeys mirror the portable family") {
    val d = docs("a b c d e f g h", "a b c d e f g h", "q r s t u v w x")
      .withColumn("fp64", Text.simhash64(col("sh")))
      .withColumn("sig", Text.minhashSignature(col("sh"), 16))
      .select(col("doc_id"), col("fp64"),
        Text.bandKeys(col("sig"), 4, 4).as("bands"),
        Text.simhashChunks(col("fp64"), 4, 16).as("chunks"))
      .orderBy("doc_id").collect()
    assert(d(0).getLong(1) == d(1).getLong(1))       // identical docs, identical simhash64
    assert(d(0).getSeq[Long](2) == d(1).getSeq[Long](2)) // ... and identical band keys
    assert(d(0).getSeq[Long](2).intersect(d(2).getSeq[Long](2)).isEmpty)
    assert(d(0).getSeq[Long](3).length == 4)         // 4x16-bit chunks
    assert(d(0).getSeq[Long](3).forall(c => c >= 0 && c < 65536))
  }

  test("bandKeysMd5: equal signatures share all bands, disjoint docs none") {
    val d = docs("a b c d e f g h", "a b c d e f g h", "q r s t u v w x")
      .withColumn("hs", Text.tokenHashesPortable(col("sh")))
      .withColumn("sig", Text.minhashFromHashes(col("hs"), 16))
      .select(col("doc_id"), Text.bandKeysMd5(col("sig"), 4, 4).as("bands"))
      .orderBy("doc_id").collect()
    assert(d(0).getSeq[String](1) == d(1).getSeq[String](1))
    assert(d(0).getSeq[String](1).intersect(d(2).getSeq[String](1)).isEmpty)
  }
}
