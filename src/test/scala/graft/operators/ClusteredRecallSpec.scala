package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** ANN recall on a CLUSTERED corpus (r10 verdict #2).
  *
  * Every recall number the repo publishes (x35's 5-method table, the
  * nprobe/rerank dials) was measured on the driver's near-uniform
  * synthetic embeddings, where compressed methods (PQ/RP) sit at
  * chance by construction — the dial SHAPES were validated there, but
  * the VALUES said little about production corpora, which cluster.
  * This spec re-measures on a deterministic mixture-of-Gaussians
  * fixture at two scales and pins the resulting tables, so the
  * published recall story covers the geometry ANN indexes exist for.
  *
  * Fixture discipline matches the testdata conventions: same
  * embeddings schema (vec_id, embedding float[64], label), vec_id 0
  * is the query anchor, and every value is a SEEDLESS HASH of
  * (vec_id, dim, draw) — splitmix64 → uniform → Irwin-Hall(4)
  * approximate normal — so the corpus is a pure function of ids (no
  * RNG object, no seed to drift) and the pinned tables are exact,
  * not statistical. Labels are the true mixture components, sized so
  * the trained quantizers (corpusK, PQ codebooks) must discover
  * real structure: recall ABOVE the uniform-corpus chance level is
  * the clustering signal this spec exists to witness.
  */
class ClusteredRecallSpec extends graft.SparkSpec {

  private val Dim = 64
  private val Clusters = 10
  private val Sigma = 0.15

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  /** uniform in [0,1), a pure function of (id, dim, draw) */
  private def u(id: Long, d: Int, j: Int): Double =
    (mix(mix(mix(id) ^ d.toLong) ^ (j.toLong << 32)) >>> 11).toDouble / (1L << 53).toDouble
  /** centroid component for mixture component c, in [-1, 1) */
  private def cen(c: Int, d: Int): Double = 2.0 * u(1000000L + c, d, 0) - 1.0
  /** approx N(0,1): Irwin-Hall(4) recentred, std = sqrt(1/3) */
  private def gauss(id: Long, d: Int): Double =
    ((1 to 4).map(j => u(id, d, j)).sum - 2.0) / math.sqrt(1.0 / 3.0)

  private def fixture(n: Int): String = {
    val dir = graft.io.TempDirs.scratch(s"graft-mog-$n")
    val rows = (0L until n.toLong).map { id =>
      val c = ((mix(id ^ 7777L) % Clusters) + Clusters).toInt % Clusters
      val emb = (0 until Dim).map(d => (cen(c, d) + Sigma * gauss(id, d)).toFloat).toArray
      Row(id, emb, c)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), graft.sources.Tables.schemas("embeddings"))
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def recallTable(dir: String): Map[String, Double] =
    graft.SparkEntry.queries("x35_ann_recall")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap

  private def recallOf(dir: String, approx: DataFrame): Double = {
    val exact = LlmData.annExactTopK(spark, dir, 5).select(col("vec_id"))
    LlmData.recallRow(exact, approx, "m", 5).collect().head.getDouble(3)
  }

  // Pinned tables (recall@5 of the query anchor's exact top-5).
  // Uniform-corpus values for comparison (x73 scaladoc, BASELINE.md):
  // pq_adc 0.0, rerank 0.6@R=50; ivf/lsh tuned to ~1.0 by their dials.
  // On CLUSTERED geometry the trained methods earn their recall from
  // structure: IVF is exact at nprobe=2 at both scales, and the ONE
  // honest degradation — ADC's within-cluster blindness — is exactly
  // the published theory (4-byte codes resolve BETWEEN clusters, not
  // within; Jégou 2011), making the rerank depth R the occupancy-
  // scaled dial the dials test below pins.
  private val pinned = Map(
    500 -> Map("sign_lsh" -> 0.6, "sign_lsh_mp" -> 1.0, "ivf" -> 1.0,
      "pq_adc" -> 0.2, "pq_adc_rerank" -> 1.0),
    5000 -> Map("sign_lsh" -> 1.0, "sign_lsh_mp" -> 1.0, "ivf" -> 1.0,
      "pq_adc" -> 0.0, "pq_adc_rerank" -> 0.4))

  test("x35 recall table on the clustered fixture, two scales (pinned)") {
    for (n <- Seq(500, 5000)) {
      val dir = fixture(n)
      val t = recallTable(dir)
      info(s"n=$n: $t")
      assert(t == pinned(n),
        s"n=$n: the clustered-fixture recall table moved — re-derive and re-pin deliberately")
      LlmData.clearMemo(spark)
    }
  }

  test("nprobe and rerank-depth dials on the clustered fixture (pinned)") {
    for (n <- Seq(500, 5000)) {
      val dir = fixture(n)
      val np = Seq(1, 2, 4).map(p =>
        p -> recallOf(dir, LlmData.annIvfTopK(spark, dir, 5, p)))
      info(s"n=$n ivf nprobe: $np")
      // candidates grow as supersets in nprobe → recall is monotone;
      // at n=5000 the anchor's neighbors straddle a cell boundary and
      // nprobe=1 pays for it (0.2) — the dial's value, witnessed
      assert(np.map(_._2) == (if (n == 5000) Seq(0.2, 1.0, 1.0) else Seq(1.0, 1.0, 1.0)))
      val depths = Seq(10, 50, 200, 600).map(d =>
        d -> recallOf(dir, Curation.adcRerankTopK(spark, dir, 5, d)))
      info(s"n=$n adc rerank depth: $depths")
      assert(depths.map(_._2) == (if (n == 5000) Seq(0.0, 0.4, 0.4, 1.0)
        else Seq(0.2, 1.0, 1.0, 1.0)),
        s"n=$n: rerank-depth dial table moved")
      // the scale rule the fixed-R=50 registered config does NOT show:
      // within a cluster ADC ordering is near-uninformative, so the
      // shortlist must reach CLUSTER OCCUPANCY (N/Clusters = 500 here)
      // before exact re-rank can recover — R is a per-cell-occupancy
      // dial (R ≈ c·N/K), not a constant
      if (n == 5000) {
        assert(depths.toMap.apply(200) < 1.0 && depths.toMap.apply(600) == 1.0,
          "recovery must land between depth 200 and 600 ≈ cluster occupancy")
      }
      LlmData.clearMemo(spark)
    }
  }
}
