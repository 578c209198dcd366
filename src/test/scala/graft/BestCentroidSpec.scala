package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Rounding.pround
import graft.functions.Vectors

/** The native per-row centroid argmax (graft.plans.BestCentroidCid,
  * `graft_best_cid`) must equal the declarative
  * `array_max(transform(carr, c -> struct(cosine6, cid))).cid` form it
  * replaced in LlmData.assignDf — element-wise, including every null
  * edge the HOF chain produces. DistributedTrainSpec pins the
  * end-to-end literal-path parity; this suite pins the kernel's OWN
  * contract on crafted inputs the corpus never exercises. */
class BestCentroidSpec extends SparkSpec {

  /** The declarative twin: per-element cosine (un-hoisted norms) with
    * the exact pround/struct-ordering the literal path uses. `carr`
    * carries the kernel's packed shape (cid, ce, cn); the twin ignores
    * cn and recomputes both norms per element, which must not change a
    * single bit (hoisting only reuses identical double values). */
  private def declBest(v: Column, carr: Column): Column =
    array_max(transform(carr, c => struct(
      pround(Vectors.cosineDecl(v, c.getField("ce")), 6).as("ccos"),
      c.getField("cid").as("cid")))).getField("cid")

  private def kernelBest(v: Column, carr: Column): Column =
    call_function("graft_best_cid", v, carr)

  /** Rows of (label, v, carr) covering the edge lattice, built in SQL
    * so null ELEMENTS (not just null columns) are representable. */
  private lazy val edges = spark.sql(
    """SELECT * FROM VALUES
      |  ('plain',    array(1.0f, 0.0f),
      |   array(named_struct('cid', 1L, 'ce', array(1.0f, 0.0f), 'cn', 1.0d),
      |         named_struct('cid', 2L, 'ce', array(0.0f, 1.0f), 'cn', 1.0d))),
      |  ('tie_to_larger_cid', array(1.0f, 1.0f),
      |   array(named_struct('cid', 7L, 'ce', array(2.0f, 2.0f), 'cn', CAST(sqrt(8.0) AS DOUBLE)),
      |         named_struct('cid', 9L, 'ce', array(3.0f, 3.0f), 'cn', CAST(sqrt(18.0) AS DOUBLE)))),
      |  ('null_vector', CAST(NULL AS ARRAY<FLOAT>),
      |   array(named_struct('cid', 1L, 'ce', array(1.0f, 0.0f), 'cn', 1.0d),
      |         named_struct('cid', 5L, 'ce', array(0.0f, 1.0f), 'cn', 1.0d))),
      |  ('null_element_in_vector', array(1.0f, CAST(NULL AS FLOAT)),
      |   array(named_struct('cid', 1L, 'ce', array(1.0f, 0.0f), 'cn', 1.0d),
      |         named_struct('cid', 3L, 'ce', array(0.0f, 1.0f), 'cn', 1.0d))),
      |  ('dim_mismatch_one_centroid', array(1.0f, 0.0f),
      |   array(named_struct('cid', 1L, 'ce', array(1.0f), 'cn', 1.0d),
      |         named_struct('cid', 2L, 'ce', array(0.9f, 0.1f),
      |                      'cn', CAST(sqrt(0.9f * CAST(0.9f AS DOUBLE) + 0.1f * CAST(0.1f AS DOUBLE)) AS DOUBLE)))),
      |  ('empty_carr', array(1.0f, 0.0f),
      |   CAST(array() AS ARRAY<STRUCT<cid: BIGINT, ce: ARRAY<FLOAT>, cn: DOUBLE>>)),
      |  ('null_carr', array(1.0f, 0.0f),
      |   CAST(NULL AS ARRAY<STRUCT<cid: BIGINT, ce: ARRAY<FLOAT>, cn: DOUBLE>>)),
      |  ('null_struct_element', array(1.0f, 0.0f),
      |   array(CAST(NULL AS STRUCT<cid: BIGINT, ce: ARRAY<FLOAT>, cn: DOUBLE>),
      |         named_struct('cid', 4L, 'ce', array(1.0f, 0.0f), 'cn', 1.0d))),
      |  ('all_null_struct_elements', array(1.0f, 0.0f),
      |   array(CAST(NULL AS STRUCT<cid: BIGINT, ce: ARRAY<FLOAT>, cn: DOUBLE>)))
      |AS t(label, v, carr)""".stripMargin)

  test("kernel equals the declarative argmax on every crafted edge") {
    val both = edges.select(col("label"),
      kernelBest(col("v"), col("carr")).as("k"),
      declBest(col("v"), col("carr")).as("d")).collect()
    both.foreach { r =>
      val k = if (r.isNullAt(1)) null else r.getLong(1)
      val d = if (r.isNullAt(2)) null else r.getLong(2)
      assert(k == d, s"${r.getString(0)}: kernel=$k declarative=$d")
    }
  }

  test("specific edge values: poisoned rows take the largest cid, empty/null carr is null") {
    val m = edges.select(col("label"), kernelBest(col("v"), col("carr")).as("k"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(m("plain") == 1L)
    // equal rounded cosine (same direction): struct ordering ties to the LARGER cid
    assert(m("tie_to_larger_cid") == 9L)
    // a fully-poisoned row still assigns — to the largest cid, the
    // array_max-over-(null, cid)-structs result, NOT null
    assert(m("null_vector") == 5L)
    assert(m("null_element_in_vector") == 3L)
    // one unscorable centroid just loses; the scorable one wins
    assert(m("dim_mismatch_one_centroid") == 2L)
    assert(m("empty_carr") == null)
    assert(m("null_carr") == null)
    // a null struct element contributes (null ccos, null cid) and loses
    assert(m("null_struct_element") == 4L)
    // ...but when EVERY element is a null struct, the max is
    // (null, null) and the cid projected out is null
    assert(m("all_null_struct_elements") == null)
  }

  test("zero-norm centroid raises DIVIDE_BY_ZERO under ANSI, matching the Divide it replaces") {
    // the session runs Spark 4's default ANSI mode; a drop-in kernel
    // must throw where the declarative form's division throws, not
    // substitute a number
    val zero = spark.sql(
      """SELECT array(1.0f, 0.0f) AS v,
        |  array(named_struct('cid', 1L, 'ce', array(0.0f, 0.0f), 'cn', 0.0d)) AS carr
        |""".stripMargin)
    assume(spark.conf.get("spark.sql.ansi.enabled", "true") == "true")
    val viaKernel = intercept[Exception] {
      zero.select(kernelBest(col("v"), col("carr"))).collect()
    }
    val viaDecl = intercept[Exception] {
      zero.select(declBest(col("v"), col("carr"))).collect()
    }
    assert(viaKernel.getMessage.contains("DIVIDE_BY_ZERO"), viaKernel.getMessage)
    assert(viaDecl.getMessage.contains("DIVIDE_BY_ZERO"), viaDecl.getMessage)
    // r13 ADVICE: not just the message — the TYPE and error class must
    // match the declarative Divide's, so callers matching on
    // SparkThrowable.getCondition see no divergence. Both errors
    // surface wrapped in Spark's execution-failure envelope; compare
    // the root SparkThrowable on each chain.
    def rootSparkThrowable(t: Throwable): org.apache.spark.SparkThrowable = {
      val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
      chain.reverse.collectFirst { case s: org.apache.spark.SparkThrowable => s }.get
    }
    val k = rootSparkThrowable(viaKernel)
    val d = rootSparkThrowable(viaDecl)
    assert(k.getCondition == "DIVIDE_BY_ZERO", s"kernel condition: ${k.getCondition}")
    assert(k.getCondition == d.getCondition)
    assert(k.getClass == d.getClass,
      s"exception type must match the Divide's: ${k.getClass} vs ${d.getClass}")
  }

  test("kernel equals the declarative argmax over real embeddings (sf0.001, K=16 packed)") {
    val e = graft.sources.Tables.load(spark, sf0001, "embeddings")
    val packed = e.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .select(col("cid"), col("ce"), sqrt(Vectors.dotDecl(col("ce"), col("ce"))).as("cn"))
      .agg(collect_list(struct(col("cid"), col("ce"), col("cn"))).as("carr"))
    val both = e.crossJoin(broadcast(packed))
      .select(kernelBest(col("embedding"), col("carr")).as("k"),
        declBest(col("embedding"), col("carr")).as("d"))
    assert(both.filter(not(col("k") <=> col("d"))).isEmpty,
      "kernel and declarative argmax diverged on real embeddings")
  }
}
