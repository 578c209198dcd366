package graft

import org.apache.spark.sql.functions._

/** Invariant + plan-shape audits for the Shaping module (x110/x111).
  * Values are oracle-checked by the driver; these pin the properties
  * the oracle can't express: the cap's conservation/maximality laws,
  * the LM score's direction, and the physical shapes (broadcast LM
  * joins, bucket-level windows). */
class ShapingSpec extends SparkSpec {

  private def df(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("x111: per-source caps conserve and never exceed the budget") {
    val rows = df("x111_domain_cap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, nDocs, srcTok, cap, keptDocs, keptTok) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))
      assert(keptDocs <= nDocs, s"$src kept more docs than it has")
      assert(keptTok <= srcTok, s"$src kept more tokens than it has")
      assert(keptTok <= cap, s"$src kept $keptTok > cap $cap")
      if (srcTok <= cap)
        assert(keptTok == srcTok && keptDocs == nDocs,
          s"$src under cap must keep everything")
      else
        assert(keptTok > 0, s"$src over cap must still keep a prefix")
    }
  }

  test("x111: two-level prefix equals the single-window reference on the real corpus") {
    // Reference semantics: order each source's docs by (bucket, hash,
    // doc_id) and keep the maximal prefix with running tokens <= cap.
    // The registered two-level plan must reproduce it EXACTLY — the
    // bucket stage is an optimization, not an approximation.
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"), col("doc_id"),
        size(graft.functions.Text.tokens(col("text"))).cast("long").as("nt"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .withColumn("b", pmod(col("h"), lit(64L)))
    val cap = d.agg(expr("CAST(sum(nt) * 5 div 100 AS BIGINT)"))
      .head.getLong(0)
    val perSrc = d.orderBy("source", "b", "h", "doc_id").collect()
      .groupBy(_.getString(0))
    val expected = perSrc.map { case (src, rows) =>
      var run = 0L; var kd = 0L; var kt = 0L
      rows.foreach { r =>
        val nt = r.getLong(2)
        run += nt
        if (run <= cap) { kd += 1; kt += nt }
      }
      src -> ((kd, kt))
    }
    df("x111_domain_cap").collect().foreach { r =>
      val (kd, kt) = expected(r.getString(0))
      assert(r.getLong(4) == kd && r.getLong(5) == kt,
        s"${r.getString(0)}: two-level (${r.getLong(4)},${r.getLong(5)}) != reference ($kd,$kt)")
    }
  }

  test("x112: binned quality cap equals the score-ordered greedy reference") {
    val scores = df("x110_ngram_lm_filter").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"), col("doc_id"),
        size(graft.functions.Text.tokens(col("text"))).cast("long").as("nt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        scores.getOrElse(r.getLong(1), 0L)))
    val cap = d.map(_._3).sum * 5 / 100
    val expected = d.groupBy(_._1).map { case (src, rows) =>
      var run = 0L; var kd = 0L; var kt = 0L; var bar = Option.empty[Long]
      rows.sortBy(r => (-r._4, r._2)).foreach { r =>
        run += r._3
        if (run <= cap) {
          kd += 1; kt += r._3
          bar = Some(bar.fold(r._4)(math.min(_, r._4)))
        }
      }
      src -> ((kd, kt, bar))
    }
    df("x112_quality_cap").collect().foreach { r =>
      val (kd, kt, bar) = expected(r.getString(0))
      assert(r.getLong(4) == kd && r.getLong(5) == kt,
        s"${r.getString(0)}: (${r.getLong(4)},${r.getLong(5)}) != greedy ($kd,$kt)")
      assert(Option(r.get(6)).map(_.asInstanceOf[Long]) == bar,
        s"${r.getString(0)}: bar ${r.get(6)} != greedy $bar")
    }
  }

  test("x112: capped domains keep strictly better documents than the uniform x111 draw") {
    // same budget, merit order: the retained mean score of an over-cap
    // source under x112 must be >= the source's overall mean (the
    // uniform draw's expectation) — quality ordering must buy quality.
    val scores = df("x110_ngram_lm_filter").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val capped = df("x112_quality_cap").collect()
      .filter(r => r.getLong(5) < r.getLong(2))
    assert(capped.nonEmpty, "test corpus must cap at least one source")
    capped.foreach { r =>
      val bar = r.get(6).asInstanceOf[Long]
      val srcScores = spark.read.parquet(s"$sf0001/documents.parquet")
        .filter(col("source") === r.getString(0)).select("doc_id").collect()
        .map(x => scores.getOrElse(x.getLong(0), 0L))
      assert(bar >= srcScores.min,
        s"${r.getString(0)}: admission bar below the source's own minimum")
    }
  }

  test("x113: curriculum phases partition the corpus into strictly ordered bands") {
    val rows = df("x113_curriculum_phases").collect()
    assert(rows.length >= 2, "banding must be non-degenerate on the test corpus")
    // conservation: every document lands in exactly one phase
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    // disjoint, strictly ordered score ranges ⇒ strictly ordered means
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(4) < hi.getLong(3),
        s"phase ${lo.getInt(0)} hi ${lo.getLong(4)} must sit below phase ${hi.getInt(0)} lo ${hi.getLong(3)}")
      assert(lo.getLong(5) < hi.getLong(5), "mean_micro must ascend with phase")
    }
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(5) && r.getLong(5) <= r.getLong(4),
        "phase mean must sit inside its own band")
    }
  }

  test("x110: reference-language documents score higher under their own LM") {
    val rows = df("x110_ngram_lm_filter")
      .groupBy(col("lang") === "en").agg(avg("lm_micro")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(rows(true) > rows(false),
      s"en mean ${rows(true)} must exceed non-en mean ${rows(false)}")
  }

  test("x110: scores are valid micro-probability means and the gate matches them") {
    df("x110_ngram_lm_filter").collect().foreach { r =>
      val (nBg, micro, keep) = (r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(nBg > 0)
      assert(micro >= 0 && micro <= 1000000, s"micro out of range: $micro")
      assert(keep == (micro >= 33000L), "gate must be the documented bar")
    }
  }

  test("x110/x111 plan shapes: broadcast LM joins, no fact-sized document window in x111") {
    val p110 = df("x110_ngram_lm_filter")
      .queryExecution.executedPlan.toString
    assert(p110.contains("BroadcastHashJoin"), "LM tables must broadcast")
    assert(!p110.contains("SortMergeJoin"), "scoring must not shuffle-join")
    val p111 = df("x111_domain_cap").queryExecution.executedPlan.toString
    // document-level window only over the boundary bucket's join output,
    // never the raw scan: the window sits above the bnd join
    assert(p111.contains("BroadcastHashJoin") || p111.contains("BroadcastNestedLoopJoin"),
      "cap scalar and boundary-bucket frames must broadcast")
  }
}
