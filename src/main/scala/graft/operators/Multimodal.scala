package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.11 X5 extension): media
  * payloads as opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / frame-sample operator shapes a training
  * -data pipeline needs.
  *
  * The decode step itself is a clearly-marked STUB: no image/audio
  * codec ships in this environment, so `stubDecode*` produce
  * deterministic fake features from the raw bytes. Everything
  * AROUND the stub — schema, binary handling, partitioning, the typed
  * mapPartitions seam a real decoder plugs into, batch shape — is real
  * and tested. Swapping `Array[Byte] => Seq[Float]` for a JNI/codec
  * call is the only production change.
  */
object Multimodal {

  /** Media table schema: one row per asset, payload opaque binary,
    * metadata typed (never stringly). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** Deterministic synthetic media table derived from `documents`
    * (test stand-in: payload = utf-8 bytes of the text). */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit(16000).as("sample_rate")).as("meta"))

  /** Column-level STUB decode: per-asset features computed from raw
    * bytes with builtin expressions (map-side, codegen'd, no shuffle).
    * A real decoder cannot be expression-level — see
    * [[decodePartitioned]] for the seam it would use. */
  def stubDecodeFeatures(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("media_type"),
      length(col("content")).as("n_bytes"),
      xxhash64(col("content")).as("content_hash"),
      crc32(col("content")).as("content_crc"),
      col("meta.width").as("width"),
      col("meta.height").as("height"))

  /** Frame sampling STUB: `n` evenly-spaced 16-byte windows of the
    * payload stand in for decoded frames; output is one row per
    * (asset, frame index) — the exploded shape a video pipeline
    * produces. */
  def stubFrameSample(media: DataFrame, n: Int): DataFrame = {
    val len = length(col("content"))
    val offsets = sequence(lit(0), lit(n - 1))
    media.select(
      col("doc_id"),
      posexplode(transform(offsets, i =>
        xxhash64(substring_index(base64(col("content")), "=", 1).substr(
          (i * greatest(len / n, lit(1)) + 1).cast("int"), lit(16)))))
        .as(Seq("frame_idx", "frame_hash")))
  }

  final case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String, features: Seq[Float])

  /** The real-decoder seam: typed mapPartitions over binary payloads,
    * repartitioned by doc_id so decode work spreads evenly and each
    * task touches one partition's assets once. `decoder` is the
    * pluggable `Array[Byte] => Seq[Float]` — STUBBED in tests with a
    * deterministic byte-statistics featurizer; in production a codec
    * (JNI/native) initialized once per partition, which is exactly why
    * this is mapPartitions and not a per-row UDF. */
  def decodePartitioned(spark: SparkSession, media: DataFrame,
      decoder: Array[Byte] => Seq[Float]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "content").as[MediaRow]
      // explicit count (r19 ADVICE): decode is compute fan-out; a bare
      // repartition(col) coalesces to one task under advisory-sized
      // AQE coalescing, serializing the decoder this spread feeds
      .repartition(spark.sessionState.conf.numShufflePartitions, col("doc_id"))
      .mapPartitions { rows =>
        // per-partition init happens here (codec handles, buffers)
        rows.map(r => MediaFeatures(r.doc_id, r.media_type, decoder(r.content)))
      }
  }

  /** Deterministic stand-in decoder for tests: byte-count + first/last
    * byte + simple checksum, as floats. */
  val stubDecoder: Array[Byte] => Seq[Float] = bytes =>
    Seq(bytes.length.toFloat,
      bytes.headOption.getOrElse(0: Byte).toFloat,
      bytes.lastOption.getOrElse(0: Byte).toFloat,
      (bytes.foldLeft(0L)((a, b) => (a + b) & 0xffffL)).toFloat)
}
