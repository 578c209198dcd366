package graft

/** Plan-shape + invariant audits for the Curation module (x63–x66).
  * Values are oracle-checked by the driver; these pin the physical
  * shapes (map-side compute, no stray shuffles/joins) and the
  * mathematical invariants the oracle can't express. */
class CurationSpec extends SparkSpec {

  private def df(name: String) = SparkEntry.queries(name)(spark, sf0001)
  private def plan(name: String): String =
    df(name).queryExecution.executedPlan.toString

  test("x63: diversity is a map-side projection — one scan, no aggregation shuffle") {
    val p = plan("x63_token_diversity")
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(!p.contains("HashAggregate"), "per-doc score must not shuffle")
  }

  test("x63: token-stats kernel equals the declarative HOF counts on the real corpus") {
    import org.apache.spark.sql.functions._
    val both = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("tk", graft.functions.Text.tokens(col("text")))
      .select(col("doc_id"),
        call_function("graft_token_stats", col("tk")).as("st"),
        size(array_distinct(col("tk"))).cast("long").as("hof_distinct"),
        graft.operators.Curation.tokenSumsqHof(col("tk")).as("hof_sumsq"),
        array_max(transform(array_distinct(col("tk")),
          t => size(filter(col("tk"), x => x === t)))).cast("long").as("hof_max"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val st = r.getStruct(1)
      assert(st.getLong(0) == r.getLong(2),
        s"doc ${r.getLong(0)}: kernel distinct ${st.getLong(0)} != hof ${r.getLong(2)}")
      assert(st.getLong(1) == r.getLong(3),
        s"doc ${r.getLong(0)}: kernel sumsq ${st.getLong(1)} != hof ${r.getLong(3)}")
      assert(st.getLong(2) == r.getLong(4),
        s"doc ${r.getLong(0)}: kernel max_c ${st.getLong(2)} != hof ${r.getLong(4)}")
    }
  }

  test("x63: simpson bounds and degenerate cases hold") {
    val rows = df("x63_token_diversity").collect()
    rows.foreach { r =>
      val (n, d, s) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d <= n)
      assert(s >= 0.0 && s < 1.0)
      if (d == 1) assert(s == 0.0, s"single-token doc must score 0, got $s")
    }
  }

  test("x64: weighted top-50 plans a distributed heap, not a global sort") {
    assert(plan("x64_weighted_sample").contains("TakeOrderedAndProject"))
  }

  test("x65: PQ assignment is map-side — no join, one embeddings scan") {
    val p = plan("x65_pq_codes")
    assert(!p.contains("Join"), "codebook must ride the expression, not a join")
    // 2 scans total: one for the codebook collect is eager and gone by
    // plan time; the returned frame scans embeddings exactly once
    assert("Scan parquet".r.findAllIn(p).size == 1)
  }

  test("x65: codebook vectors quantize to themselves in every subspace") {
    val rows = df("x65_pq_codes").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    (1L to 8L).foreach { cid =>
      assert(rows(cid) == ((cid, cid, cid, cid)),
        s"codebook vec $cid must be its own nearest code, got ${rows(cid)}")
    }
  }

  test("x67: ADC search broadcasts the query table and plans a heap") {
    val p = plan("x67_ann_adc")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 4×8 distance table must broadcast")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("x67: ADC distances are non-negative and ascending") {
    val rows = df("x67_ann_adc").collect()
    assert(rows.length == 5)
    val ds = rows.map(_.getDouble(1))
    assert(ds.forall(_ >= 0.0))
    assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
  }

  test("x69: fuzzy matching blocks on deletion keys — no cartesian, no nested loop") {
    val p = plan("x69_symdel_fuzzy")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must be a key-equality join")
  }

  test("x69: every suggested correction is within edit distance 1") {
    val rows = df("x69_symdel_fuzzy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (typo, sug) = (r.getString(1), r.getString(2))
      // the confirm filter's own guarantee, re-checked independently
      assert(levenshtein(typo, sug) <= 1, s"$typo -> $sug")
    }
  }

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("x66: rarity is bounded below by 1 and vocabulary join stays one pass") {
    val rows = df("x66_rarity_score").collect()
    rows.foreach(r => assert(r.getDouble(2) >= 1.0,
      s"mean inverse frequency can't dip under 1: ${r}"))
  }

  test("pq kernel: native assignment is bit-equal to the declarative HOF argmin") {
    import org.apache.spark.sql.functions._
    val cb = graft.operators.Curation.trainPqCodebook(spark, sf0001)
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val both = graft.operators.Curation.withPqSubs(e)
      .select(col("vec_id"),
        graft.operators.Curation.pqAssignNative(col("embedding"), cb).as("ks"),
        array((0 to 3).map(s =>
          graft.operators.Curation.pqCodeHof(cb(s), s)): _*).as("hs"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"vec ${r.getLong(0)}: kernel ${r.getSeq[Long](1)} != hof ${r.getSeq[Long](2)}")
    }
  }

  test("pq kernel: assigned-code distances match the HOF rounded fold") {
    import org.apache.spark.sql.functions._
    val cb = graft.operators.Curation.trainPqCodebook(spark, sf0001)
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // HOF twin of graft_pq_dists: the d2 field of the argmin struct
    def hofD2(s: Int) = array_min(array(cb(s).map { case (cid, ce) =>
      struct(graft.operators.Curation.pqD2(col(s"sub$s"), ce).as("d2"),
        lit(cid).as("code"))
    }: _*)).getField("d2")
    val both = graft.operators.Curation.withPqSubs(e)
      .select(col("vec_id"),
        graft.operators.Curation.pqDistsNative(col("embedding"), cb).as("ks"),
        array((0 to 3).map(hofD2): _*).as("hs"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Double](1) == r.getSeq[Double](2),
        s"vec ${r.getLong(0)}: kernel ${r.getSeq[Double](1)} != hof ${r.getSeq[Double](2)}")
    }
  }

  test("pq kernel: NaN embeddings keep HOF parity (pround's floor->LONG rounds NaN to 0)") {
    import org.apache.spark.sql.functions._
    val cb = graft.operators.Curation.trainPqCodebook(spark, sf0001)
    import spark.implicits._
    // one clean vector, one with a NaN poisoning every subspace
    val rows = Seq(
      (1L, Array.fill(64)(0.5f)),
      (2L, Array.fill(64)(Float.NaN))
    ).toDF("vec_id", "embedding")
    def hofD2(s: Int) = array_min(array(cb(s).map { case (cid, ce) =>
      struct(graft.operators.Curation.pqD2(col(s"sub$s"), ce).as("d2"),
        lit(cid).as("code"))
    }: _*)).getField("d2")
    val both = graft.operators.Curation.withPqSubs(rows)
      .select(col("vec_id"),
        graft.operators.Curation.pqDistsNative(col("embedding"), cb).as("ks"),
        array((0 to 3).map(hofD2): _*).as("hs"),
        graft.operators.Curation.pqAssignNative(col("embedding"), cb).as("kc"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Double](1), r.getSeq[Double](2), r.getSeq[Long](3))).toMap
    val (cleanK, cleanH, _) = both(1L)
    assert(cleanK == cleanH, "clean vector must stay bit-equal")
    // Spark's floor() returns LONG, so pround(NaN) = 0L/1e6 = 0.0 —
    // the kernel must reproduce that quirk, not double-floor to NaN
    val (nanK, nanH, nanCodes) = both(2L)
    assert(nanK == nanH,
      s"NaN subspaces must match the HOF path exactly, got kernel=$nanK hof=$nanH")
    assert(nanH.forall(_ == 0.0),
      s"pround's floor->LONG must round NaN folds to 0.0, got $nanH")
    assert(nanCodes == Seq(1L, 1L, 1L, 1L),
      "all-equal distances must resolve to the smallest code (array_min total order)")
  }

  test("pq training: codebook keeps 1..8 keying per subspace and moves off the seeds") {
    val cb = graft.operators.Curation.trainPqCodebook(spark, sf0001)
    assert(cb.length == 4)
    cb.foreach { entries =>
      assert(entries.map(_._1) == (1L to 8L), "codes must stay 1..8 ascending")
      entries.foreach { case (_, ce) => assert(ce.length == 16) }
    }
    // trained centers are means, not the raw seed subvectors (Lloyd's
    // actually ran): at least one center differs from its seed
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id").between(1, 8))
      .select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .sortBy(_._1)
    val seedsUnchanged = cb(0).forall { case (cid, ce) =>
      e.find(_._1 == cid).exists(_._2.slice(0, 16) == ce)
    }
    assert(!seedsUnchanged, "subspace 0 centers identical to seeds — training is a no-op")
  }

  test("x70: distortion audit partitions the corpus per subspace and bounds hold") {
    val rows = df("x70_pq_distortion").collect()
    // ≤ 8 codes per subspace; a code can go unused at tiny SF
    assert(rows.length >= 4 && rows.length <= 32, s"got ${rows.length} cells")
    val total = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    (0 to 3).foreach { s =>
      val sub = rows.filter(_.getLong(0) == s)
      assert(sub.map(_.getLong(2)).sum == total,
        s"subspace $s member counts must partition the corpus")
    }
    rows.foreach { r =>
      val (mean, max) = (r.getDouble(3), r.getDouble(4))
      assert(mean >= 0.0 && max >= mean, s"0 <= mean <= max violated: $r")
    }
  }

  test("x72: indexed ADC probe returns exactly x67's rows") {
    val a = df("x67_ann_adc").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = df("x72_ann_adc_indexed").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq,
      "the materialized code table must reproduce the in-query assignment exactly")
  }
}
