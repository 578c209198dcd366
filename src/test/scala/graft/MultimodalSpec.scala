package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, binary payload handling, the
  * expression-level stub featurizer, frame sampling shape, and the
  * typed mapPartitions decoder seam. The decode math is a STUB by
  * design (no codecs in this environment); the plumbing is real. */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = graft.sources.Tables.load(spark, sf0001, "documents").limit(12)
  private lazy val media = Multimodal.synthesize(docs).cache()

  test("synthesize: schema, typed metadata, deterministic payload") {
    // compare names + types (synthesized literals are non-nullable,
    // the declared schema is the permissive read-side shape)
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.map(f => f.name -> f.dataType.simpleString).toSeq
    assert(shape(media.schema) == shape(Multimodal.mediaSchema))
    val r = media.orderBy("doc_id").collect()
    assert(r.length == 12)
    assert(r.map(_.getAs[String]("media_type")).toSet.subsetOf(Set("image", "audio", "video")))
    // payload round-trips: bytes are the utf-8 text
    val d0 = docs.orderBy("doc_id").collect()(0).getAs[String]("text")
    assert(new String(r(0).getAs[Array[Byte]]("content"), "UTF-8") == d0)
  }

  test("stub feature extraction: map-side expressions, stable hashes") {
    val f = Multimodal.stubDecodeFeatures(media).orderBy("doc_id").collect()
    assert(f.length == 12)
    assert(f.forall(r => r.getAs[Int]("n_bytes") > 0))
    val again = Multimodal.stubDecodeFeatures(media).orderBy("doc_id").collect()
    assert(f.map(_.getAs[Long]("content_hash")).toSeq ==
      again.map(_.getAs[Long]("content_hash")).toSeq)
  }

  test("frame sampling: one row per (asset, frame)") {
    val frames = Multimodal.stubFrameSample(media, n = 3)
    assert(frames.count() == 12 * 3)
    assert(frames.groupBy("doc_id").count().filter(col("count") =!= 3).isEmpty)
  }

  test("x117: two-tier dedup manifest — prescreen dominates confirm, assets conserve") {
    val rows = SparkEntry.queries("x117_media_header_dedup")(spark, sf0001).collect()
    assert(rows.map(_.getAs[String]("media_type")).sorted.toSeq ==
      Seq("audio", "image", "video"))
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_assets")).sum == corpus)
    assert(rows.map(_.getAs[Long]("header_dup_assets")).sum > 0,
      "planted near-dup prefixes must collide at the header tier")
    rows.foreach { r =>
      // identical payloads share headers: the prescreen can only
      // over-flag, never miss a confirm-tier duplicate
      assert(r.getAs[Long]("header_dup_assets") >= r.getAs[Long]("payload_dup_assets"))
      assert(r.getAs[Long]("max_bytes") <= r.getAs[Long]("total_bytes"))
    }
  }

  test("decodePartitioned: typed mapPartitions seam with pluggable decoder") {
    val feats = Multimodal.decodePartitioned(spark, media, Multimodal.stubDecoder)
      .collect().sortBy(_.doc_id)
    assert(feats.length == 12)
    assert(feats.forall(_.features.length == 4))
    // decoder sees the real payload bytes
    val d0 = docs.orderBy("doc_id").collect()(0).getAs[String]("text")
    assert(feats(0).features.head == d0.getBytes("UTF-8").length.toFloat)
  }
}
