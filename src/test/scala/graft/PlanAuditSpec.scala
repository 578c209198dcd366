package graft

/** Physical-plan discipline audit (the 100 TB contract, SURVEY.md §4):
  * asserts the *shape* of the executed plans, not their outputs —
  * broadcast joins stay broadcast, top-k never plans a global sort,
  * predicates and projections reach the parquet scan, and the one
  * intentionally single-partition window stays post-aggregation.
  * A regression here is invisible to the value-level oracle but fatal
  * at scale. */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("q01: star join broadcasts dims and plans TakeOrderedAndProject") {
    val p = plan("q01_top10_star_join")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k must be a heap, not a global sort")
    assert(!p.contains("SortMergeJoin"), "fact side must not shuffle for dim joins")
  }

  test("q12: timestamp predicate pushed to the parquet scan") {
    val p = plan("q12_lineitem_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"expected pushed l_shipdate filter, got:\n${p.take(2000)}")
  }

  test("q17: recency predicate pushed to the raw nanos column") {
    val p = plan("q17_recency_filter")
    assert(p.contains("GreaterThanOrEqual(ts"),
      "eventsSince must push the comparison on the stored long, " +
        "not filter the derived timestamp post-scan")
  }

  test("q02: scan reads only the grouping column (column pruning)") {
    val p = plan("q02_pct_by_priority")
    assert(p.contains("ReadSchema: struct<o_orderpriority:string>"),
      "count-by-priority must prune every other column at the scan")
  }

  test("q14: deep star join plans partial aggregation before the shuffle") {
    val p = plan("q14_nation_revenue")
    // map-side partial agg halves the shuffle: two HashAggregate nodes
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q07: single-scan window — exactly one events scan, one from_json") {
    val p = plan("q07_incremental_antijoin")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      "the r1 double-scan regression must not return")
    assert("from_json".r.findAllIn(p).size <= 1, "one from_json pass")
  }

  test("x22: signatures shuffle, not payloads — spread is layout-conditional") {
    // single-file testdata layout: the one sanctioned payload shuffle
    // (the spread repartition over the 2-column projection) must exist,
    // or hashing serializes onto one task
    // REPARTITION_BY_NUM since r19: the spread pins its partition COUNT
    // (a bare repartition(col) is subject to AQE advisory-sized
    // coalescing, which would collapse the KB-scale corpus to one task
    // and serialize the tokenize kernel — see tokStaged)
    assert(plan("x22_minhash_lsh_pairs").contains("REPARTITION_BY_NUM"),
      "single-file layout needs the spread repartition")
    // multi-file layout: the (doc_id, text) payload must never shuffle —
    // every remaining exchange carries signatures/band keys only
    val tmp = graft.io.TempDirs.scratch("graft-layout")
    graft.sources.Tables.load(spark, sf0001, "documents").repartition(4)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val p = SparkEntry.queries("x22_minhash_lsh_pairs")(spark, tmp)
      .queryExecution.executedPlan.toString
    assert(!p.contains("REPARTITION_BY_NUM") && !p.contains("REPARTITION_BY_COL"),
      "a multi-file corpus must not shuffle the (doc_id, text) payload")
    // drop the tmp-layout signature tables this audit memoized
    graft.operators.LlmData.clearMemo(spark)
  }

  test("q20: staged map parse — at most one from_json in the plan") {
    val p = plan("q20_map_access")
    assert("from_json".r.findAllIn(p).size <= 1,
      "the r2/r3 double-parse regression (two JsonToStructs in one Project) must not return")
    // r12: the parse must sit ABOVE the global sort (project-after-sort).
    // With the parse below the sort, the range-partitioner's sampling
    // pass executes the Jackson parse a second time over every row —
    // measured 4× the whole query at sf1. Top-down plan text ⇒ the
    // parse's Project must print before the Sort node it follows.
    val iJson = p.indexOf("from_json")
    val iSort = p.indexOf("Sort [event_id")
    assert(iJson >= 0 && iSort >= 0 && iJson < iSort,
      s"from_json must evaluate after the sort (found json@$iJson sort@$iSort)")
  }

  test("sort-first family: the expensive projection evaluates above the global sort") {
    // r13: the q20 lesson applied family-wide. A map-side expensive
    // projection directly below a final orderBy is executed twice (the
    // range-partitioner's sampling pass + the real pass) at scan-stage
    // parallelism; these queries sort the raw rows first, so the
    // projection must print ABOVE (before, in top-down plan text) the
    // Sort node. x42 measured at sf3: 22.7 s project-then-sort vs
    // 1.6 s sort-then-project.
    val cases = Seq(
      ("x42_pii_scrub", "regexp_extract_all", "Sort [doc_id"),
      ("x29_token_regex", "regexp_extract_all", "Sort [doc_id"),
      ("x27_quality_score", "stop_ratio", "Sort [doc_id"),
      ("x52_gopher_rules", "mean_wlen", "Sort [doc_id"),
      ("x43_repetition_score", "graft_shingles", "Sort [doc_id"),
      ("x63_token_diversity", "graft_token_stats", "Sort [doc_id"),
      ("q10_scalar_funcs", "format_string", "Sort [o_orderkey"),
      ("q18_url_parse", "lpad", "Sort [doc_id"))
    cases.foreach { case (q, marker, sortPrefix) =>
      val p = plan(q)
      val iM = p.indexOf(marker)
      val iS = p.indexOf(sortPrefix)
      assert(iM >= 0 && iS >= 0 && iM < iS,
        s"$q: '$marker' must evaluate above the sort (marker@$iM sort@$iS)")
    }
  }

  test("x24: brute-force cosine broadcasts the query vector only") {
    val p = plan("x24_topk_cosine")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "single-row query vector must broadcast")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("x80/x81: RP projection runs on the fused kernel; both stages are heaps") {
    val p80 = plan("x80_rp_topk")
    assert(p80.contains("graft_dot"),
      "the 16 projection dots must hit the codegen'd kernel (literal sign rows " +
        "pin it directly — the declarative form would be constant-folded away)")
    assert(p80.contains("TakeOrderedAndProject"))
    val p81 = plan("x81_rp_rerank")
    assert(p81.contains("graft_dot"))
    assert("TakeOrderedAndProject".r.findAllIn(p81).length >= 2,
      "shortlist AND final cut must both be heaps, never global sorts")
    assert(!p81.contains("SortMergeJoin") && !p81.contains("Exchange hashpartitioning"),
      "two-stage RP retrieval must not shuffle — the heap carries the full vector")
  }

  test("x22: LSH candidates come from an equality join, not a cross product") {
    val p = plan("x22_minhash_lsh_pairs")
    assert(!p.contains("CartesianProduct"), "LSH must never plan all-pairs")
  }

  test("x83: neighbor candidates come from the bucket join; rank prunes as a group limit") {
    val p = plan("x83_knn_graph")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the kNN self-join must be an equality join on the bucket key")
    assert(p.contains("WindowGroupLimit"),
      "the constant k=3 rank filter must prune per-partition before the anchor shuffle")
  }

  test("x22/x23: signature math runs on the native kernels") {
    assert(plan("x22_minhash_lsh_pairs").contains("graft_minhash"),
      "minhash slots must use the codegen'd kernel, not interpreted HOF lambdas")
    assert(plan("x23_simhash_neardup").contains("graft_simhash"),
      "simhash votes must use the codegen'd kernel")
  }

  test("x34: IVF list assignment is map-side — no exchange before the probe join") {
    val p = plan("x34_ann_ivf")
    // the only acceptable exchange is the single-row broadcast of the
    // query vector; assignment over the literal quantizer must not
    // shuffle the embeddings side
    assert(!p.contains("SortMergeJoin"), "probe must broadcast, never sort-merge")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("x37: sample predicate is map-side — one shuffle (the stratum agg) only") {
    val p = plan("x37_stratified_sample")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "hash-bucket sampling must not shuffle payloads; only the per-lang agg exchanges")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial agg before the shuffle")
  }

  test("x39: benchmark shingle set broadcasts; corpus side never sort-merges") {
    val p = plan("x39_decontamination")
    assert(p.contains("BroadcastHashJoin"), "eval-set shingles must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "the corpus must be flagged in the scan stage, not shuffled to the join")
  }

  test("x79: the bloom membership test runs BEFORE the confirm join") {
    // the scale claim: the corpus side is prefiltered map-side by the
    // bloom literal, so only matches + the fpp share reach the join.
    // might_contain must appear as a Filter below the join, not above.
    // Unlike x39, x79 plants NO broadcast hint — its premise is a
    // benchmark too big for a hash relation, so the planner is free to
    // shuffle the confirm join (the registered 100 TB shape); whichever
    // join the planner picks, the prefilter must sit below it.
    val p = plan("x79_decontam_bloom")
    assert(p.contains("might_contain"), "the bloom prefilter must be in the plan")
    val joinAt = ("BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r
      .findFirstMatchIn(p).map(_.start)
      .getOrElse(fail("no equi-join in the x79 plan")))
    assert(p.indexOf("might_contain", joinAt) >= 0,
      "might_contain must sit below the join in the operator tree " +
        "(executedPlan prints children after parents)")
  }

  test("x38: packing reuses one exchange — window partitioning serves the agg") {
    val p = plan("x38_sequence_packing")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "hashpartitioning(source) must satisfy the (source, bin) aggregate — " +
        "a second exchange means the partitioning reuse broke")
    assert("Scan parquet".r.findAllIn(p).size == 1)
  }

  test("x41: rank filter pushes down as WindowGroupLimit (per-group top-k)") {
    val p = plan("x41_holdout_draw")
    assert(p.contains("WindowGroupLimit"),
      "the holdout draw must heap-select k per stratum before the shuffle, " +
        "never sort whole strata")
  }

  test("q25: range join bins to a hash join, never a nested loop") {
    val p = plan("q25_range_join")
    assert(p.contains("BroadcastHashJoin"),
      "bin-equality must plan a hash join (the whole point of day-binning)")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the interval predicate must be a residual filter, not the join condition")
  }

  test("x50: bigram top-k is a heap, and the pair agg is partial") {
    val p = plan("x50_bigram_vocab")
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 must never plan a global sort over the pair space")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "pair counting must partial-aggregate map-side before the shuffle")
  }

  test("x55: KMV k-minima select via WindowGroupLimit, never a full group sort") {
    val p = plan("x55_kmv_distinct")
    assert(p.contains("WindowGroupLimit"),
      "the rank<=k filter must become per-partition k-heaps before the shuffle — " +
        "that bound is what makes the sketch a sketch")
  }

  test("x71/x72: indexed ANN probes plan ZERO shuffle Exchange") {
    // the index-build/query split's whole point: the layout shuffle was
    // paid at write time, so the probe is scan + broadcast + heap —
    // the plan shape that makes "query many" cheap on a static corpus.
    // (BroadcastExchange is the query side and allowed.)
    val shuffle = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
    for (name <- Seq("x71_ann_ivf_indexed", "x72_ann_adc_indexed")) {
      val p = plan(name)
      assert(shuffle.findFirstIn(p).isEmpty,
        s"$name probe must not re-shuffle the indexed corpus:\n$p")
      assert(p.contains("TakeOrderedAndProject"),
        s"$name top-k must stay a distributed heap")
    }
  }

  test("x74: the append plan touches ONLY the new batch — one scan, no index read") {
    // incremental maintenance must stay incremental: assigning the new
    // batch is one scan of the new rows against the frozen-centroid
    // literal; a plan that also reads the base index (or the whole
    // corpus twice) silently turns a daily append into a full rebuild
    // at 100 TB.
    val df = graft.operators.LlmData.ivfAppendBatch(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"append must scan exactly the new batch once:\n$p")
    assert(!p.contains("graft_ivf_inc"),
      "append must not read the base index table")
    assert(!p.contains("Join"), "assignment is map-side against the centroid literal")
  }

  test("x74: the post-append probe still plans zero shuffle Exchange on a bucketed scan") {
    // the append wrote NEW per-bucket files next to the untouched base
    // files; the probe contract (x71's zero-Exchange broadcast+heap
    // shape) must survive that append, or maintenance quietly costs the
    // layout its whole point.
    SparkEntry.queries("x74_ann_ivf_append")(spark, sf0001).collect() // build + append
    val probe = graft.operators.LlmData.annIvfIncTopK(spark, sf0001, 5)
    val p = probe.queryExecution.executedPlan.toString
    val shuffle = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
    assert(shuffle.findFirstIn(p).isEmpty,
      s"post-append probe must not re-shuffle the indexed corpus:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "top-k must stay a distributed heap")
    val scans = probe.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.exists(_.relation.bucketSpec.exists(b =>
      b.bucketColumnNames == Seq("cid") && b.numBuckets == 16)),
      "probe must read the cid-bucketed catalog table incl. appended files")
  }

  test("x74: compacting the live incremental index preserves the probe — results, layout, plan") {
    // the full maintenance lifecycle bound together: build + append
    // (x74), COMPACT the real index table, probe again — same top-k,
    // per-bucket file count bounded, zero-Exchange plan intact. This
    // is the weekly production cycle, not three isolated ops.
    val q = SparkEntry.queries("x74_ann_ivf_append")
    q(spark, sf0001).collect() // ensure built + appended
    val tbl = graft.operators.LlmData.incIvfIndexTableName(sf0001)
    val before = graft.operators.LlmData.annIvfIncTopK(spark, sf0001, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val filesBefore = spark.table(tbl).inputFiles.length
    graft.io.Bucketing.compact(spark, tbl, "cid", 16, sorted = false)
    assert(spark.table(tbl).inputFiles.length <= 16 &&
      spark.table(tbl).inputFiles.length < filesBefore,
      "compaction must bound files at one per non-empty bucket")
    val probe = graft.operators.LlmData.annIvfIncTopK(spark, sf0001, 5)
    assert(probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == before,
      "compaction must not change probe results")
    val p = probe.queryExecution.executedPlan.toString
    assert("Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findFirstIn(p).isEmpty,
      s"compacted index must keep the zero-Exchange probe:\n$p")
  }

  test("appendBucketed: a mismatched bucket count fails loudly, never de-buckets") {
    // the doc claim pinned: appending under the wrong spec must be an
    // analysis error, not a silent layout rot that every downstream
    // zero-Exchange plan quietly loses
    SparkEntry.queries("x74_ann_ivf_append")(spark, sf0001).collect()
    val tbl = graft.operators.LlmData.incIvfIndexTableName(sf0001)
    val batch = graft.operators.LlmData.ivfAppendBatch(spark, sf0001)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      graft.io.Bucketing.appendBucketed(batch, tbl, "cid", 8, sorted = false)
    }
    assert(e.getMessage.toLowerCase.contains("bucket"),
      s"error should name the bucket-spec mismatch, got: ${e.getMessage.take(200)}")
  }

  test("x101: index scans keep their bucket layout and are never re-shuffled") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val q = SparkEntry.queries("x101_dedup_index_probe")(spark, sf0001)
    q.collect() // force the build-once tables to exist
    val p = SparkEntry.queries("x101_dedup_index_probe")(spark, sf0001)
      .queryExecution.sparkPlan
    def isIdx(f: FileSourceScanExec) =
      f.tableIdentifier.exists(_.table.startsWith("graft_dedup_"))
    val idxScans = p.collect { case f: FileSourceScanExec if isIdx(f) => f }
    assert(idxScans.size >= 3, s"probe must read all three index tables:\n$p")
    idxScans.foreach(f =>
      assert(f.outputPartitioning.isInstanceOf[HashPartitioning],
        s"index scan must report its bucket hashpartitioning " +
          s"(layout lost?): ${f.tableIdentifier}"))
    // a shuffle whose input is (unary ops over) an index scan means the
    // persisted layout failed to serve its join — exactly the silent
    // rot writeBucketed's scaladoc warns about; downstream shuffles of
    // DERIVED rows (candidate dedup, the final sort) are expected
    def reshufflesIndex(n: SparkPlan): Boolean = n match {
      case f: FileSourceScanExec => isIdx(f)
      case u if u.children.length == 1 => reshufflesIndex(u.children.head)
      case _ => false
    }
    val offenders = p.collect {
      case e: ShuffleExchangeExec if reshufflesIndex(e.child) => e
    }
    assert(offenders.isEmpty,
      s"corpus index rows must never re-shuffle in the probe:\n$p")
  }

  test("x103: batched ANN broadcasts the query set and heaps per query") {
    val p = plan("x103_batch_ann")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the K-row query set must broadcast:\n${p.take(2000)}")
    assert(p.contains("WindowGroupLimit"),
      "per-query top-5 must plan per-group heaps, not a full window sort")
    assert(!p.contains("CartesianProduct"),
      "the scan × query-set product must ride the broadcast, never a cartesian shuffle")
  }

  test("x75: the PQ append plan touches ONLY the new batch — one scan, no code-table read") {
    val df = graft.operators.Curation.pqAppendBatch(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"append must scan exactly the new batch once:\n$p")
    assert(!p.contains("graft_pq_inc"), "append must not read the base code table")
    assert(!p.contains("Join"), "encoding is map-side against the codebook literal")
  }

  test("x75: the post-append ADC shortlist probe plans zero shuffle Exchange") {
    SparkEntry.queries("x75_ann_adc_append")(spark, sf0001).collect() // build + append
    val probe = graft.operators.Curation.adcIncShortlist(spark, sf0001, 50)
    val p = probe.queryExecution.executedPlan.toString
    val shuffle = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
    assert(shuffle.findFirstIn(p).isEmpty,
      s"post-append code scan must not re-shuffle:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "shortlist must stay a distributed heap")
  }

  test("x71: the IVF index scan is bucketed on cid") {
    val df = SparkEntry.queries("x71_ann_ivf_indexed")(spark, sf0001)
    // sparkPlan, not executedPlan: AQE's AdaptiveSparkPlanExec is a
    // leaf node and would hide the scan from collectLeaves
    val scans = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.exists(_.relation.bucketSpec.exists(b =>
      b.bucketColumnNames == Seq("cid") && b.numBuckets == 16)),
      "probe must read the cid-bucketed catalog table, not an ad-hoc scan")
  }

  test("x71: the bucketed layout itself serves cid-keyed consumers shuffle-free") {
    // the probe's zero-Exchange comes from broadcast + heap (any
    // layout); THIS pins what bucketing buys — an index-maintenance
    // aggregation (per-list sizes) that groups on cid with no shuffle
    // because the scan reports hashpartitioning(cid)
    SparkEntry.queries("x71_ann_ivf_indexed")(spark, sf0001) // ensure index built
    val listStats = spark
      .table(graft.operators.LlmData.ivfIndexTableName(sf0001))
      .groupBy("cid").count()
    val p = listStats.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"cid-keyed aggregation over the bucketed index must plan no shuffle:\n$p")
  }

  test("q45: the salted shuffle actually materializes — join keys include the salt") {
    val p = plan("q45_skew_salted_join")
    // without the shuffle_hash pin Spark broadcasts the 15K-row dim at
    // this SF and the skew mitigation under test never runs
    assert(!p.contains("BroadcastHashJoin"),
      "q45 must exercise the shuffle path (the 100 TB shape), not a broadcast")
    assert(p.contains("__salt"),
      "the shuffle/join keys must carry the salt — that IS the mitigation")
  }

  test("q47: bucketed fact⋈fact joins and aggregates with ZERO Exchange") {
    val p = plan("q47_bucketed_join")
    assert(p.contains("Bucketed: true"),
      "both fact scans must use the bucket layout")
    assert(!p.contains("Exchange"),
      s"co-located join + keyed agg must plan no shuffle at all:\n${p.take(2000)}")
    assert(p.contains("SortMergeJoin"),
      "the merge hint must pin the fact⋈fact strategy the layout serves")
  }

  test("q54: storage-partitioned join plans ZERO Exchange off the connector's report") {
    val p = plan("q54_storage_partitioned_join")
    assert("GraftKeyed".r.findAllIn(p).size == 2,
      "both join sides must read the keyed DSv2 layout")
    assert(!p.contains("Exchange"),
      s"connector-reported KeyGroupedPartitioning must delete every shuffle " +
        s"(join AND keyed agg):\n${p.take(2000)}")
    assert(p.contains("SortMergeJoin"),
      "the merge hint must pin the fact⋈fact strategy the layout serves")
    // r14 ordering report: the layouts are staged sortBy=doc_id and the
    // scans report the stored order, so the SMJ also plans ZERO Sort —
    // shuffle AND sort both paid once at write time ("- Sort [" cannot
    // match the SortMergeJoin node name)
    assert(!p.contains("- Sort ["),
      s"write-time order must delete the SMJ's per-partition sorts:\n${p.take(2000)}")
  }

  test("q62: TopN is fully pushed in the REGISTERED plan — Sort deleted, budget in the scan") {
    // KeyedTopNSpec pins the mechanism on its own layouts; this leg
    // pins the registered query's exact shape (the Project sits ABOVE
    // the Limit there — the pushdown must still fire through it)
    val p = plan("q62_keyed_topn_pushdown")
    assert(p.contains("topN=20"),
      s"the scan must carry the pushed TopN:\n${p.take(2000)}")
    assert(!p.contains("TakeOrderedAndProject") && !p.contains("- Sort ["),
      s"ORDER BY stored-prefix LIMIT k must delete every sort operator:\n${p.take(2000)}")
    // budget planning: directories are planned in key order only until
    // the sidecar-counted rows cover the limit — derive the expected
    // count from the corpus itself so the leg holds at any SF
    val perKey = graft.sources.Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id % 16 AS kb").groupBy("kb").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = {
      var remaining = 20L
      var n = 0
      (0L until 16L).foreach { k =>
        if (remaining > 0 && perKey.contains(k)) { n += 1; remaining -= perKey(k) }
      }
      n
    }
    val parts = SparkEntry.queries("q62_keyed_topn_pushdown")(spark, sf0001)
      .rdd.getNumPartitions
    assert(parts == expected && expected < 16,
      s"the sidecar budget must plan $expected of 16 directories, got $parts")
  }

  test("x106: label predicate is pushed to the scan and the cut is a heap") {
    // filtered ANN's whole contract: pre-filter reaches the parquet
    // scan (row-group pruning before any dot product at 100 TB) and
    // the cut never plans a global sort
    val p = plan("x106_filtered_ann")
    assert(p.contains("In(label, [2,5])"),
      s"expected pushed label IN-filter, got:\n${p.take(2000)}")
    assert(p.contains("TakeOrderedAndProject"),
      "filtered top-k must be a heap, not a global sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("q49: date predicate prunes at the partition listing, not the data") {
    val p = plan("q49_partition_prune")
    assert(p.contains("PartitionFilters: [isnotnull(event_date") &&
      p.contains(" = 2024-01-15)"),
      s"expected partition-level date pruning, got:\n${p.take(3000)}")
    assert(p.contains("InMemoryFileIndex(1 paths)"),
      "exactly ONE partition directory may survive the listing")
    // the partition column must never degrade to a data filter: a
    // derived-at-read date (CAST(ts AS DATE) = ...) reads EVERY file
    assert(p.contains("DataFilters: []") && p.contains("PushedFilters: []"),
      "the one-day query needs zero row-level filtering after the prune")
  }

  test("q51: runtime dim filter prunes fact partitions dynamically (DPP)") {
    // static pruning is impossible by construction (no literal date
    // anywhere in the query) — the fact scan must carry a
    // DynamicPruningSubquery planted by the PartitionPruning rule
    val p = plan("q51_dynamic_partition_prune")
    assert(p.contains("dynamicpruningexpression"),
      s"expected a DynamicPruningSubquery in the fact scan's PartitionFilters, got:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"),
      "the dim join must broadcast so the pruning subquery reuses the broadcast")

    // measured delta (the part a plan string can't show): the IDENTICAL
    // query executed with DPP on vs off — partitions/files actually
    // opened, from the scan's own runtime metrics. AQE off for the
    // measurement so the executed tree is directly traversable; the
    // string assert above already covers the AQE-on path.
    import org.apache.spark.sql.execution.FileSourceScanExec
    def factScan(dpp: Boolean): (Long, Long) = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", dpp.toString)
      try {
        val df = SparkEntry.queries("q51_dynamic_partition_prune")(spark, sf0001)
        df.collect()
        val scan = df.queryExecution.executedPlan.collectWithSubqueries {
          case f: FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains("graft_p_events")) => f
        }.head
        (scan.metrics("numPartitions").value, scan.metrics("numFiles").value)
      } finally {
        spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.enabled")
        spark.conf.unset("spark.sql.adaptive.enabled")
      }
    }
    val (partsOn, filesOn) = factScan(dpp = true)
    val (partsOff, filesOff) = factScan(dpp = false)
    // expected counts derived from the data, not hardcoded
    import org.apache.spark.sql.functions.{col, to_date}
    val days = graft.sources.Tables.load(spark, sf0001, "events")
      .select(to_date(col("ts")).as("d")).distinct()
      .collect().map(_.getDate(0).toLocalDate)
    val focusDays = days.count(_.getDayOfMonth % 10 == 5)
    assert(partsOn == focusDays,
      s"DPP-on scan must open exactly the $focusDays focus-day partitions, opened $partsOn")
    assert(partsOff == days.length,
      s"DPP-off scan must open every one of the ${days.length} day partitions, opened $partsOff")
    assert(filesOn < filesOff,
      s"DPP must cut files scanned: on=$filesOn off=$filesOff")
    info(s"files scanned with DPP: $filesOn of $filesOff; partitions $partsOn of $partsOff")
  }

  test("global sweep: no registered query ever plans a CartesianProduct") {
    // the one unconditional rule of the 100 TB contract: the quadratic
    // operator must never appear — candidate generation is always a
    // key-equality or broadcast join. (BroadcastNestedLoopJoin over a
    // single-row broadcast, e.g. the x24 query vector, is acceptable
    // and distinct from CartesianProduct.)
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filter(name => plan(name).contains("CartesianProduct"))
    assert(offenders.isEmpty, s"cartesian plans: ${offenders.mkString(", ")}")
  }

  test("global sweep: no unpartitioned Window over pre-aggregation (fact-sized) input") {
    // an empty-partition window collapses to a SinglePartition sort —
    // every row through one task, the window shape that cannot scale.
    // It is legitimate ONLY over post-aggregation inputs (bounded by
    // group cardinality, e.g. q02's 5-row pct-of-total); over a scan-
    // sized input it is a defect (the r9 q39 rewrite removed the one
    // instance: exact ntile via bin-partitioned ranks + offsets).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, GlobalLimit, Join, LocalLimit, LocalRelation, LogicalPlan, OneRowRelation, Union, Range => LRange, Window => LWindow}
    import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
    // bounded input = the window's direct input SPINE proves bounded
    // cardinality: an Aggregate (group cardinality), a Limit (top-k
    // heap, x64's rank-of-50), or a driver-declared relation
    // (Range/LocalRelation). Multiplicity-introducing nodes need BOTH
    // factors bounded: an outer join is bounded only if both sides
    // are (left-rows × match-multiplicity — q42's 30-day calendar
    // left-joining aggregated knots passes; the same calendar joining
    // RAW events would not), and a Generate (explode) is bounded only
    // over a driver-declared row set (literal fanout — q42's
    // sequence(); explode over data keeps data cardinality even when
    // an Aggregate sits below, e.g. explode(collect_list)).
    // Range is driver-declared but its cardinality is a free
    // parameter — spark.range(10e9) under an unpartitioned window is
    // exactly the scale-fatal shape this sweep exists to catch, so a
    // Range only counts as bounded when its DECLARED row count is
    // calendar-scale (q42's 30-day spine), not merely literal-typed.
    def smallRange(r: LRange): Boolean = r.numElements <= BigInt(100000)
    def driverDeclared(p: LogicalPlan): Boolean = p match {
      case r: LRange => smallRange(r)
      case _: LocalRelation | _: OneRowRelation => true
      case _: Generate => false
      case u if u.children.size == 1 => driverDeclared(u.children.head)
      case _ => false
    }
    def boundedBelow(p: LogicalPlan): Boolean = p match {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit => true
      case r: LRange => smallRange(r)
      case _: LocalRelation | _: OneRowRelation => true
      case g: Generate => driverDeclared(g.child)
      // multiplicity-sound join rules: inner/outer output ≤ product
      // (bounded × bounded = bounded); semi/anti output ≤ left rows
      case j: Join if j.joinType == Inner || j.joinType == LeftOuter ||
          j.joinType == RightOuter || j.joinType == FullOuter =>
        boundedBelow(j.left) && boundedBelow(j.right)
      case j: Join if j.joinType == LeftSemi || j.joinType == LeftAnti =>
        boundedBelow(j.left)
      // a union of bounded arms is bounded (x93's seeded frame:
      // observed-langs aggregate unioned with the anti-joined targets)
      case un: Union => un.children.forall(boundedBelow)
      case u if u.children.size == 1 => boundedBelow(u.children.head)
      case _ => false
    }
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val bad = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty && !boundedBelow(w.child) => w
        }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned window over unaggregated input: ${offenders.mkString(", ")}")
  }

  test("q39: exact ntile rides bin-partitioned ranks — no single-partition fact sort") {
    val p = plan("q39_ntile_buckets")
    // the window must carry a partition spec (the range bin), so no
    // exchange anywhere in the plan may collapse to one partition
    // (the old ntile form printed Window above Sort above Exchange
    // SinglePartition — assert on the node, not on line adjacency)
    assert(!p.contains("Exchange SinglePartition"),
      s"q39 must not plan any single-partition exchange, got:\n${p.take(2000)}")
    assert(p.contains("Window") && p.contains("hashpartitioning(bin"),
      s"per-bin window expected, got:\n${p.take(2000)}")
  }

  test("q28: bloom mask ships broadcast; the fact side never sort-merge-joins") {
    val p = plan("q28_bloomjoin")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "mask + dim must broadcast to the fact scan")
    assert(!p.contains("SortMergeJoin"),
      "the whole point of the bloom reduction is that orders never shuffles to join")
    // the probe must be the O(1) indexed form, not a list scan
    assert(!p.contains("array_contains"), "probe must be shift-and-mask, not a linear scan")
  }

  test("q31: every PageRank iteration joins the share table by broadcast") {
    val p = plan("q31_pagerank")
    // 3 iterations -> 3 share⋈edges joins; a sort-merge join here means
    // the full edge list re-sorts every round. The broadcast is an
    // EXPLICIT hint: the join inputs are cached InMemoryRelations AQE
    // cannot re-plan through, so without it the plan silently kept SMJ
    // above sf0.001 (caught at sf0.1 — r6's q31 warm-run anomaly).
    assert(!p.contains("SortMergeJoin"),
      "per-iteration share join must broadcast (share is node-sized, edges stay put)")
    assert("HashAggregate".r.findAllIn(p).size >= 6,
      "each iteration needs a partial+final agg pair on dst")
  }

  test("q31: the second invocation rides the memoized edge-list cache") {
    // the warm-run contract the bench relies on: sym/deg persist once
    // per (session, corpus), so iteration >= 2 and every later
    // invocation must read InMemoryTableScan, not re-run the lineitem
    // scan + distinct (BENCH_DETAIL's cold/warm spread is only
    // plan-meaningful if this holds)
    val first = plan("q31_pagerank")
    assert(first.contains("InMemoryTableScan"),
      "iterations past the first must already read the persisted edge list")
    val second = plan("q31_pagerank")
    assert(second.contains("InMemoryTableScan"),
      "repeat invocations must hit the session memo, not rebuild the graph")
    assert(!second.contains("SortMergeJoin"),
      "the cached-input plan must keep the broadcast joins (no stats-blind SMJ fallback)")
  }

  test("x62: second invocation keeps broadcast degree joins over the cached graph (bench SF)") {
    // The q31 lesson, applied where it recurred: x62's candidate edge
    // list and oriented graph are memoized InMemoryRelations, which AQE
    // cannot re-plan through — so this audit probes the EXECUTED plan of
    // the SECOND invocation at sf0.1 (the bench SF; the r6 q31 audit at
    // sf0.001 famously could not see the SMJ fallback) and pins both
    // halves of the warm contract: the memo is genuinely hit, and the
    // node-sized degree joins stay broadcast instead of re-sorting the
    // cached candidate list on every run (r7 driver artifact: warm
    // 6.08 s > cold 5.70 s until the hints landed).
    assume(sf01Exists, s"bench corpus $sf01 not present on this box")
    val run = () => {
      val df = SparkEntry.queries("x62_dedup_triangles")(spark, sf01)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val firstPlan = run()
    assert(firstPlan.contains("InMemoryTableScan"),
      "downstream joins must read the persisted candidate graph, not rebuild it")
    val secondPlan = run()
    assert(secondPlan.contains("InMemoryTableScan"),
      "repeat invocations must hit the session memo, not re-run the band join")
    assert(!secondPlan.contains("SortMergeJoin"),
      "cached-input joins must keep the broadcast hints (no stats-blind SMJ fallback)")
    assert("BroadcastHashJoin".r.findAllIn(secondPlan).size >= 2,
      "both degree joins must broadcast the node-sized side")
  }

  test("q32: each funnel stage pushes its event_type slice to the scan") {
    val p = plan("q32_funnel")
    // three stages -> three sliced scans; reading all events for every
    // stage would triple the 100 TB scan cost
    for (stage <- Seq("view", "click", "purchase"))
      assert(p.contains(s"EqualTo(event_type,$stage)"),
        s"stage predicate '$stage' must reach the parquet scan")
    // frontier tables are |users|-sized: at audit SF they must broadcast
    assert(!p.contains("SortMergeJoin"),
      "per-user frontiers must hash-join (broadcast at this SF), never sort events")
  }

  test("x36: component labels converge without collecting row data") {
    // the driver loop reads one scalar per round; the result itself
    // must come back as a distributed frame, not a collect
    val df = SparkEntry.queries("x36_neardup_components")(spark, sf0001)
    assert(df.queryExecution.executedPlan.toString.nonEmpty)
    assert(df.columns.toSeq == Seq("doc_id", "component", "is_survivor"))
  }
}
