package graft.operators

import graft.Q
import graft.functions.Rounding.{duckRound, pround, sumCents}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational module (q33+): the SQL analytics surface beyond
  * the reference's own queries that any warehouse replacement is
  * expected to carry — set operations, CUBE, exact percentiles,
  * conditional/ordered-arg aggregates, correlated subqueries, running
  * windows, ntile bucketing, ordered string aggregation.
  *
  * Same oracle-parity discipline as [[Relational]] (literal pivots,
  * total deterministic ORDER BY, exact or pround'ed doubles, identical
  * aliases both sides) and the same 100 TB framing: every query here is
  * one or two shuffles with map-side partials, no driver-side loops, no
  * UDFs.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** q33 — INTERSECT (set semantics): customers that placed BOTH an
    * urgent and a low-priority order. Catalyst plans INTERSECT as
    * distinct-aggregate + left-semi hash join — two scans of orders
    * with the priority filters pushed to parquet, then one shuffle per
    * side on the join key; no row explosion anywhere, so the shape is
    * scale-safe as-is. */
  private def q33 = Q(
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        .intersect(
          o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey"))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
           |INTERSECT
           |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
           |ORDER BY o_custkey""".stripMargin),
    "INTERSECT as distinct + semi join; filters pushed to both scans")

  /** q34 — CUBE over (returnflag, linestatus): all 4 grouping
    * combinations in ONE Expand (4 replicas per input row) feeding one
    * partial+final hash agg — one shuffle total, same physical shape
    * as q21's ROLLUP / q26's GROUPING SETS; the 100 TB knob is the
    * replica count (2^dims), which is why this stays at 2 dims.
    * grouping() ints disambiguate NULL group keys from NULL data. */
  private def q34 = Q(
    (s, dir) => t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc("g_flag"), asc("g_status"),
        asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           |  count(*) AS n, sum(l_quantity) AS sum_qty
           |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
           |ORDER BY g_flag, g_status,
           |  l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
    "CUBE: one Expand + one hash agg; l_quantity integer-valued so the double sum is exact")

  /** q35 — exact interpolated percentiles per group. Spark's
    * `percentile` and DuckDB's `quantile_cont` share the textbook
    * (1-d)*lo + d*hi interpolation; l_quantity is integer-valued and
    * the quartile fractions are exact binary (.25/.5/.75), so both
    * engines produce bit-identical doubles. Exact percentile sorts
    * per group — the scale escape hatch is approx_percentile (t-digest
    * sketch, map-side mergeable), same call shape, used when the
    * group's value set no longer fits the agg buffer. */
  private def q35 = Q(
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.75)).as("p75"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, count(*) AS n,
           |  quantile_cont(l_quantity, 0.25) AS p25,
           |  quantile_cont(l_quantity, 0.5) AS p50,
           |  quantile_cont(l_quantity, 0.75) AS p75
           |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
    "exact interpolated quartiles; approx_percentile is the same-shape sketch path at scale")

  /** q36 — conditional + ordered-arg aggregates: FILTER-style counts,
    * bool_and/bool_or, and a DETERMINISTIC max_by via a composite
    * integer ordinal (cents * 10^15 + orderkey — ties on price resolve
    * by key, so the arg-max is total; a bare max_by(x, price) is a
    * parity landmine because tie-breaking is engine-internal). The
    * ordinal rides DECIMAL(38,0) on Spark / HUGEINT on DuckDB — 64-bit
    * arithmetic would either collide (narrow multiplier: injectivity
    * needs orderkey < multiplier, broken at TPC-H SF >= 2 for 10^7) or
    * overflow (wide multiplier), while 128-bit stays injective up to
    * orderkey < 10^15 ≈ SF 10^8. All partial-aggregable single-pass
    * map-side combines. */
  private def q36 = Q(
    (s, dir) => {
      val ord = round(col("o_totalprice") * 100, 0).cast("decimal(38,0)") *
        lit(1000000000000000L).cast("decimal(38,0)") + col("o_orderkey")
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          count(when(col("o_totalprice") > 200000, lit(1))).as("n_big"),
          pround(count(when(col("o_totalprice") > 200000, lit(1)))
            .cast("double") / count(lit(1)), 4).as("frac_big"),
          bool_and(col("o_totalprice") > 0).as("all_pos"),
          bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
          max_by(col("o_orderkey"), ord).as("best_order"))
        .orderBy("o_orderstatus")
    },
    Some(s"""SELECT o_orderstatus, count(*) AS n,
            |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
            |  ${duckRound(
               "count(*) FILTER (WHERE o_totalprice > 200000) * 1.0 / count(*)", 4)}
            |    AS frac_big,
            |  bool_and(o_totalprice > 0) AS all_pos,
            |  bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
            |  max_by(o_orderkey,
            |         CAST(round(o_totalprice * 100, 0) AS HUGEINT)
            |           * 1000000000000000 + o_orderkey) AS best_order
            |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin),
    "FILTER counts, bool_and/bool_or, total-ordered max_by; all one-pass partial aggregates")

  /** q37 — correlated EXISTS / NOT EXISTS subqueries through the SQL
    * front end: customers with at least one 300k+ order and no
    * low-priority order. Catalyst decorrelates both predicates into a
    * left-semi and a left-anti hash join on c_custkey (RewritePredicate
    * Subquery) — the point of the query is that the DECLARED form is a
    * subquery and the PHYSICAL form is the same two-join pipeline q16/
    * q07 build by hand, i.e. nothing here is per-row re-execution. */
  private def q37 = Q(
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("q37_customer")
      t(s, dir, "orders").createOrReplaceTempView("q37_orders")
      s.sql("""SELECT c_custkey, c_name FROM q37_customer c
              |WHERE EXISTS (SELECT 1 FROM q37_orders o
              |              WHERE o.o_custkey = c.c_custkey
              |                AND o.o_totalprice > 300000)
              |  AND NOT EXISTS (SELECT 1 FROM q37_orders o
              |                  WHERE o.o_custkey = c.c_custkey
              |                    AND o.o_orderpriority = '5-LOW')
              |ORDER BY c_custkey""".stripMargin)
    },
    Some("""SELECT c_custkey, c_name FROM customer c
           |WHERE EXISTS (SELECT 1 FROM orders o
           |              WHERE o.o_custkey = c.c_custkey
           |                AND o.o_totalprice > 300000)
           |  AND NOT EXISTS (SELECT 1 FROM orders o
           |                  WHERE o.o_custkey = c.c_custkey
           |                    AND o.o_orderpriority = '5-LOW')
           |ORDER BY c_custkey""".stripMargin),
    "correlated EXISTS/NOT EXISTS decorrelated to semi + anti hash joins")

  /** q38 — running + sliding window frames per user: cumulative event
    * value and a 4-row moving average, both over the cents-integer sum
    * so frame accumulation order can't produce float drift (the frame
    * count divides AFTER the exact integer sum). One shuffle on
    * user_id; frames evaluate in a single sort within the partition.
    * Window ordering carries the event_id tie-break (ts alone is not
    * provably unique). */
  private def q38 = Q(
    (s, dir) => {
      val cents = round(col("value") * 100, 0).cast("long")
      val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val running = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sliding = ord.rowsBetween(-3, Window.currentRow)
      t(s, dir, "events")
        .withColumn("c", cents)
        .select(col("event_id"), col("user_id"), col("ts"),
          (sum("c").over(running) / 100.0).as("running_sum"),
          pround(sum("c").over(sliding) /
            (count(lit(1)).over(sliding) * 100.0), 4).as("mov_avg"))
        .orderBy("user_id", "ts", "event_id")
    },
    Some(s"""SELECT event_id, user_id, ts,
            |  sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w1 / 100.0 AS running_sum,
            |  ${duckRound(
               "sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w2 * 1.0 / " +
                 "(count(*) OVER w2 * 100.0)", 4)} AS mov_avg
            |FROM events
            |WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id
            |              ROWS UNBOUNDED PRECEDING),
            |       w2 AS (PARTITION BY user_id ORDER BY ts, event_id
            |              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            |ORDER BY user_id, ts, event_id""".stripMargin),
    "running + sliding frames on one user_id sort; cents-exact accumulation")

  /** q39 — ntile quartile bucketing over a total order (price, key):
    * the histogram-equalized binning a mixture sampler uses to stratify
    * by a continuous column — EXACT, with no unpartitioned window.
    *
    * `ntile(4) OVER (ORDER BY ...)` plans a SinglePartition sort of
    * the fact table — the one window shape that cannot scale (every
    * row through one task). This form keeps ntile's exact output
    * contract while sorting only WITHIN range bins:
    *
    *   1. approx_percentile-style sample cuts (31 doubles of index
    *      metadata) split the price domain into ~32 range bins. The
    *      cuts set PARALLELISM ONLY — any cut set, however skewed the
    *      sample, yields the same final answer.
    *   2. Each row's bin is a map-side indicator sum (order-consistent
    *      with the total order: price ties always share a bin).
    *   3. Per-bin counts (≤32 metadata rows, the Lloyd's-collect
    *      precedent) give exact global rank offsets; the global rank
    *      of a row is its bin offset + its row_number within the bin
    *      (window PARTITIONED by bin — parallel, spill-safe).
    *   4. ntile's bucket is pure arithmetic on (rank, N): the first
    *      N%4 buckets take N/4+1 rows, the rest N/4 — integer `div`
    *      (not `/`, which detours through double).
    *
    * Identical results to the ntile form (the oracle still runs real
    * ntile), shuffles the fact table once on bin, never on one task.
    * Degenerate distributions (all prices equal) collapse to one bin —
    * exactly the single-sorted-run ntile itself would need. */
  private def q39 = Q(
    (s, dir) => {
      val o = t(s, dir, "orders")
      val cuts = o.stat.approxQuantile("o_totalprice",
        (1 until 32).map(_ / 32.0).toArray, 0.01).distinct.sorted
      val binExpr = cuts.foldLeft(lit(0)) { (acc, c) =>
        acc + when(col("o_totalprice") >= lit(c), 1).otherwise(0) }
      val binned = o.select(col("o_totalprice"), col("o_orderkey"))
        .withColumn("bin", binExpr)
      val counts = binned.groupBy("bin").agg(count(lit(1)).as("bn"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val n = counts.map(_._2).sum
      val offsets = counts.scanLeft(0 -> 0L) {
        case ((_, acc), (b, c)) => b -> (acc + c) }
      val offExpr = counts.zip(offsets).foldLeft(lit(0L)) {
        case (acc, ((b, _), (_, off))) =>
          when(col("bin") === b, off).otherwise(acc) }
      val (base, rem) = (n / 4, n % 4)
      binned
        .withColumn("rank",
          offExpr + row_number().over(
            Window.partitionBy("bin").orderBy("o_totalprice", "o_orderkey")))
        .withColumn("bucket", expr(
          s"CAST(CASE WHEN rank <= ${(base + 1) * rem} " +
            s"THEN (rank - 1) div ${base + 1} + 1 " +
            s"ELSE $rem + (rank - ${(base + 1) * rem} - 1) div ${math.max(base, 1L)} + 1 " +
            "END AS INT)"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
        .orderBy("bucket")
    },
    Some("""SELECT bucket, count(*) AS n,
           |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
           |FROM (SELECT o_totalprice,
           |        ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
           |      FROM orders)
           |GROUP BY 1 ORDER BY bucket""".stripMargin),
    "ntile(4) quartile bins + per-bin stats; sample-derived cut points at scale")

  /** q40 — ordered string aggregation: nations per region as one sorted
    * CSV cell. collect_list is order-nondeterministic by contract, so
    * the sort happens INSIDE the row (array_sort before array_join) —
    * the only way a distributed engine can promise a stable string agg
    * without a single-partition sort. Broadcast dim⋈dim join. */
  private def q40 = Q(
    (s, dir) => t(s, dir, "region")
      .join(broadcast(t(s, dir, "nation")),
        col("r_regionkey") === col("n_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_nations"),
        array_join(array_sort(collect_list("n_name")), ",").as("nations"))
      .orderBy("r_name"),
    Some("""SELECT r_name, count(*) AS n_nations,
           |  string_agg(n_name, ',' ORDER BY n_name) AS nations
           |FROM region JOIN nation ON r_regionkey = n_regionkey
           |GROUP BY 1 ORDER BY r_name""".stripMargin),
    "ordered string_agg via in-row array_sort; deterministic without a global sort")

  /** q41 — NOT IN versus NOT EXISTS under NULLs, the classic ANSI
    * three-valued-logic trap: one NULL in the NOT IN list makes the
    * predicate UNKNOWN for every probe row (0 rows survive), while the
    * anti-join reading keeps matching. Both variants in one output so
    * the semantic cliff is an oracle-checked VALUE. Physically BOTH
    * variants lower to Catalyst's null-aware anti join (the trailing
    * `true` on the BroadcastHashJoin) because o_custkey is
    * nullable-TYPED — NAAJ is broadcast-only by design, so at scale the
    * fix is `WHERE x IS NOT NULL` (or a non-nullable schema) in the
    * subquery, restoring the shuffle-able plain anti join. */
  private def q41 = Q(
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("q41_customer")
      t(s, dir, "orders").createOrReplaceTempView("q41_orders")
      s.sql("""SELECT 'clean_list' AS variant, count(*) AS n
              |FROM q41_customer
              |WHERE c_custkey NOT IN
              |  (SELECT o_custkey FROM q41_orders WHERE o_orderpriority = '5-LOW')
              |UNION ALL
              |SELECT 'null_poisoned' AS variant, count(*) AS n
              |FROM q41_customer
              |WHERE c_custkey NOT IN
              |  (SELECT CASE WHEN o_totalprice > 100000 THEN NULL
              |               ELSE o_custkey END
              |   FROM q41_orders WHERE o_orderpriority = '5-LOW')
              |ORDER BY variant""".stripMargin)
    },
    Some("""SELECT 'clean_list' AS variant, count(*) AS n
           |FROM customer
           |WHERE c_custkey NOT IN
           |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
           |UNION ALL
           |SELECT 'null_poisoned' AS variant, count(*) AS n
           |FROM customer
           |WHERE c_custkey NOT IN
           |  (SELECT CASE WHEN o_totalprice > 100000 THEN NULL
           |               ELSE o_custkey END
           |   FROM orders WHERE o_orderpriority = '5-LOW')
           |ORDER BY variant""".stripMargin),
    "NOT IN three-valued logic: clean list = anti hash join, NULL-poisoned list = null-aware anti join")

  /** q42 — time-series linear interpolation (q27's gap fill
    * reconstructs COUNTS as zero; this reconstructs a VALUE series
    * between knots — the resample→interpolate step that aligns sparse
    * signals before feature extraction). The daily series is
    * deliberately downsampled to every-3rd-day knots (a sparse sensor
    * read), then every calendar day gets prev/next knot via
    * ignoreNulls window frames and the interior days interpolate in
    * pure INTEGER cents: prev + ((next−prev)·pos) div len — no float
    * until the final single division, so both engines reconstruct
    * bit-identically. Ends carry the nearest knot. The windows are
    * global but POST-aggregation (30 rows, the q27/W1 discipline);
    * the heavy work — the daily aggregation — shuffles once on day. */
  private def q42 = Q(
    (s, dir) => {
      val knots = t(s, dir, "events")
        .select(to_date(col("ts")).as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy("day").agg(sum("cents").as("v"))
        .filter(dayofmonth(col("day")) % 3 === 0)
      val calendar = s.range(1)
        .select(explode(sequence(
          to_date(lit("2024-01-01")), to_date(lit("2024-01-30")))).as("day"))
      val w = Window.orderBy("day")
      val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      calendar.join(knots, Seq("day"), "left")
        .select(col("day"), col("v"),
          last(col("v"), ignoreNulls = true).over(back).as("pv"),
          last(when(col("v").isNotNull, col("day")), ignoreNulls = true)
            .over(back).as("pd"),
          first(col("v"), ignoreNulls = true).over(fwd).as("nv"),
          first(when(col("v").isNotNull, col("day")), ignoreNulls = true)
            .over(fwd).as("nd"))
        .select(col("day"), col("v").isNotNull.as("is_knot"),
          (when(col("v").isNotNull, col("v"))
            .when(col("pv").isNotNull && col("nv").isNotNull,
              col("pv") + expr(
                "((nv - pv) * datediff(day, pd)) div datediff(nd, pd)"))
            .when(col("pv").isNotNull, col("pv"))
            .otherwise(col("nv")) / 100.0).as("interp_value"))
        .orderBy("day")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(ts AS DATE) AS day,
           |         sum(CAST(round(value * 100, 0) AS BIGINT)) AS v
           |  FROM events GROUP BY 1),
           |knots AS (SELECT * FROM daily WHERE extract(day FROM day) % 3 = 0),
           |calendar AS (
           |  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
           |                                     INTERVAL 1 DAY)) AS DATE) AS day),
           |j AS (SELECT c.day, k.v,
           |        last_value(k.v IGNORE NULLS) OVER
           |          (ORDER BY c.day ROWS UNBOUNDED PRECEDING) AS pv,
           |        last_value(CASE WHEN k.v IS NOT NULL THEN c.day END IGNORE NULLS)
           |          OVER (ORDER BY c.day ROWS UNBOUNDED PRECEDING) AS pd,
           |        first_value(k.v IGNORE NULLS) OVER
           |          (ORDER BY c.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
           |        first_value(CASE WHEN k.v IS NOT NULL THEN c.day END IGNORE NULLS)
           |          OVER (ORDER BY c.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
           |      FROM calendar c LEFT JOIN knots k ON c.day = k.day)
           |SELECT day, (v IS NOT NULL) AS is_knot,
           |  (CASE WHEN v IS NOT NULL THEN v
           |        WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
           |          pv + ((nv - pv) * date_diff('day', pd, day))
           |               // date_diff('day', pd, nd)
           |        WHEN pv IS NOT NULL THEN pv
           |        ELSE nv END) / 100.0 AS interp_value
           |FROM j ORDER BY day""".stripMargin),
    "linear interpolation between every-3rd-day knots: integer cents arithmetic, ignoreNulls frames, post-agg windows")

  /** q43 — UNPIVOT (wide→long reshaping, q30's inverse) through the
    * native Dataset.unpivot: the wide per-status quantity columns melt
    * back to (flag, status, qty) rows. Physically an Expand (one
    * replica per value column) over the already-aggregated wide table —
    * rows × value-columns, bounded by the aggregate's cardinality, so
    * the reshape costs nothing at any scale; absent combinations
    * surface as NULL and are filtered to mirror the UNION-ALL oracle. */
  private def q43 = Q(
    (s, dir) => {
      val wide = t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("l_linestatus") === "O", col("l_quantity"))).as("qty_O"),
          sum(when(col("l_linestatus") === "F", col("l_quantity"))).as("qty_F"))
      wide.unpivot(
          Array(col("l_returnflag")),
          Array(col("qty_O"), col("qty_F")),
          "status_col", "qty")
        .filter(col("qty").isNotNull)
        .select(col("l_returnflag"),
          substring(col("status_col"), 5, 1).as("l_linestatus"), col("qty"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""WITH wide AS (SELECT l_returnflag,
           |  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_O,
           |  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_F
           |  FROM lineitem GROUP BY 1)
           |SELECT l_returnflag, 'O' AS l_linestatus, qty_O AS qty
           |FROM wide WHERE qty_O IS NOT NULL
           |UNION ALL
           |SELECT l_returnflag, 'F' AS l_linestatus, qty_F AS qty
           |FROM wide WHERE qty_F IS NOT NULL
           |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    "native Dataset.unpivot: post-aggregate Expand, the PIVOT inverse")

  /** q44 — semi-structured JSON through Spark 4's VARIANT type:
    * parse_json once (no declared schema — the schema-on-read path for
    * payloads that drift), typed variant_get extraction, then ordinary
    * relational aggregation. Versus q11's from_json(declared struct):
    * VARIANT defers the schema decision to the extraction site and
    * keeps unknown fields queryable — the trade is a binary-encoded
    * column instead of a struct Catalyst can prune into. Extraction is
    * map-side in the scan stage either way. */
  private def q44 = Q(
    (s, dir) => t(s, dir, "events")
      .select(col("event_type"),
        variant_get(parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(when(col("k") >= 50, lit(1))).as("n_big"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
           |  count(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50)
           |    AS n_big,
           |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
           |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin),
    "VARIANT schema-on-read: parse_json + typed variant_get, aggregation over extracted fields")

  /** q48 — Z-order data-layout pruning audit: the multi-dimensional
    * clustering a 100 TB warehouse uses to make file-level min/max
    * statistics prune on MORE THAN ONE predicate column (the layout
    * trick behind Delta/Iceberg `ZORDER BY` — public technique, Morton
    * 1966 interleave). Both dimensions are quantized to 8 bits against
    * their measured corpus range (scalar min/max aggregate broadcast —
    * exact integer `div`, engine-portable), the Morton code interleaves
    * the bits map-side (8 shift/mask terms, codegen'd — no UDF), and
    * rows land in 64 "files" two ways: by z-value range (the z-order
    * layout) and by the first dimension alone (the linear-sort layout a
    * naive pipeline gets). The query then plays query planner: for a
    * fixed 2-D predicate (both quantized dims in [112,143] — the middle
    * eighth of each axis) it computes, from per-file min/max stats
    * alone, how many files each layout scans and how many ROWS those
    * files hold. The z-order layout's files are 32×32 blocks of the
    * quantized plane, so both predicates prune (4/64 files survive);
    * the linear layout prunes only on dim 1 (8/64 files, each spanning
    * the full dim-2 range — ~2× the rows read). Shape: one scan, a
    * 2-row explode per input row (both layouts in one pass), one
    * 128-group aggregate with map-side partials, one 2-group rollup —
    * no global sort anywhere (file assignment is arithmetic on the
    * z-value, NOT a rank). At 100 TB the identical plan writes the
    * layout instead of auditing it: the z-value is the range-partition
    * key of a write, and the audit columns are the skipping stats the
    * writer records per file. */
  private def q48 = Q(
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      val st = li.agg(
        min("pk").as("pk0"), max("pk").as("pk1"),
        min("sk").as("sk0"), max("sk").as("sk1"))
      val qd = li.crossJoin(broadcast(st))
        .withColumn("q1", expr(
          "CAST(((pk - pk0) * 256) div (pk1 - pk0 + 1) AS BIGINT)"))
        .withColumn("q2", expr(
          "CAST(((sk - sk0) * 256) div (sk1 - sk0 + 1) AS BIGINT)"))
      val zv = (0 until 8).map { i =>
        shiftright(col("q1"), i).bitwiseAND(1) * lit(1L << (2 * i)) +
          shiftright(col("q2"), i).bitwiseAND(1) * lit(1L << (2 * i + 1))
      }.reduce(_ + _)
      val files = qd
        .withColumn("zv", zv)
        .select(explode(array(
          struct(lit("zorder").as("layout"),
            expr("CAST(zv div 1024 AS BIGINT)").as("f")),
          struct(lit("linear").as("layout"),
            expr("CAST(q1 div 4 AS BIGINT)").as("f")))).as("lf"),
          col("q1"), col("q2"))
        .select(col("lf.layout").as("layout"), col("lf.f").as("f"),
          col("q1"), col("q2"))
        .groupBy("layout", "f")
        .agg(min("q1").as("n1"), max("q1").as("x1"),
          min("q2").as("n2"), max("q2").as("x2"),
          count(lit(1)).as("cnt"))
      val scan = col("n1") <= 143 && col("x1") >= 112 &&
        col("n2") <= 143 && col("x2") >= 112
      files.groupBy("layout")
        .agg(count(lit(1)).as("files_total"),
          count(when(scan, lit(1))).as("files_scanned"),
          coalesce(sum(when(scan, col("cnt"))), lit(0L)).as("rows_scanned"))
        .orderBy("layout")
    },
    Some("""WITH st AS (SELECT min(l_partkey) AS pk0, max(l_partkey) AS pk1,
           |              min(l_suppkey) AS sk0, max(l_suppkey) AS sk1 FROM lineitem),
           |q AS (SELECT ((l_partkey - pk0) * 256) // (pk1 - pk0 + 1) AS q1,
           |        ((l_suppkey - sk0) * 256) // (sk1 - sk0 + 1) AS q2
           |      FROM lineitem CROSS JOIN st),
           |z AS (SELECT q1, q2, CAST(list_sum(list_transform(range(0, 8), i ->
           |        ((q1 >> i) & 1) * (CAST(1 AS BIGINT) << (2 * i)) +
           |        ((q2 >> i) & 1) * (CAST(1 AS BIGINT) << (2 * i + 1)))) AS BIGINT) AS zv
           |      FROM q),
           |f AS (SELECT 'zorder' AS layout, zv // 1024 AS f, q1, q2 FROM z
           |      UNION ALL SELECT 'linear', q1 // 4, q1, q2 FROM z),
           |fs AS (SELECT layout, f, min(q1) AS n1, max(q1) AS x1,
           |         min(q2) AS n2, max(q2) AS x2, count(*) AS cnt
           |       FROM f GROUP BY layout, f)
           |SELECT layout, CAST(count(*) AS BIGINT) AS files_total,
           |  CAST(count(*) FILTER (WHERE n1 <= 143 AND x1 >= 112
           |    AND n2 <= 143 AND x2 >= 112) AS BIGINT) AS files_scanned,
           |  CAST(coalesce(sum(cnt) FILTER (WHERE n1 <= 143 AND x1 >= 112
           |    AND n2 <= 143 AND x2 >= 112), 0) AS BIGINT) AS rows_scanned
           |FROM fs GROUP BY layout ORDER BY layout""".stripMargin),
    "z-order layout audit: Morton-interleaved 2-D file assignment vs linear sort, file-stat pruning compared under a 2-D predicate")

  val queries: Map[String, Q] = Map(
    "q33_intersect" -> q33,
    "q34_cube" -> q34,
    "q35_percentiles" -> q35,
    "q36_conditional_agg" -> q36,
    "q37_exists_subquery" -> q37,
    "q38_running_window" -> q38,
    "q39_ntile_buckets" -> q39,
    "q40_string_agg" -> q40,
    "q41_not_in_nulls" -> q41,
    "q42_interpolate" -> q42,
    "q43_unpivot" -> q43,
    "q44_variant" -> q44,
    "q48_zorder_prune" -> q48)
}
