package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance over the keyed connector's CDC surface
  * (r17 — the consumer that turns the changes table from "readable"
  * into "useful"): a downstream ADDITIVE rollup
  * (`GROUP BY k: count(*), sum(c)…`) is kept current by applying each
  * commit interval's net row delta instead of recomputing over the
  * corpus.
  *
  * The algebra is the classic delta rule for distributive aggregates:
  * every changes row carries `_change_type ∈ {insert, delete}`
  * ([[graft.sources.KeyedChanges]] — updates arrive as delete+insert
  * pairs, compactions net to zero), so with sign s = ±1 the group's
  * count moves by Σs and each sum by Σ s·c. Groups whose maintained
  * count reaches zero DROP from the view — exactly what the recompute
  * would answer. AVG needs no support — it derives from the
  * maintained sum/count pair.
  *
  * MIN/MAX (r18 — the r17 verdict's #6): inserts maintain
  * monotonically (`least(prev, min-of-inserts)`), but a DELETE
  * hitting a group's current extreme is not decomposable — the new
  * extreme lives only in the group's surviving rows. The repair is
  * the DV stats-patch discipline at view grain
  * ([[maintainRollupFull]]): detect exactly the groups whose
  * interval deletes touched a maintained extreme (a join of the
  * delete rows against the previous view — delta-sized), and
  * re-aggregate ONLY those groups from the current table state.
  * When the group key is the layout key, that re-read is an exact
  * pushed key-IN prune — bounded by the affected groups, never the
  * corpus, the same bound the DV patch pays at commit time.
  *
  * JOINS (r18): a two-table view `rollup(A ⋈ B)` maintains through
  * the signed delta-join [[joinDelta]]:
  * `Δ(A⋈B) = ΔA⋈B_old ∪ A_new⋈ΔB` (the standard expansion —
  * using OLD B against ΔA and NEW A against ΔB counts the ΔA⋈ΔB
  * cross term exactly once), whose output is itself a signed changes
  * relation that [[maintainRollup]]/[[maintainRollupFull]] consume
  * unchanged — delta composition, the DBToaster shape.
  *
  * At 100 TB: a refresh costs O(interval delta) + a join against the
  * rollup (group-domain-sized, broadcastable) — the changes scan
  * plans only changed keys' partitions and reports the layout's key
  * grouping, so a rollup PARTITIONED the same way applies its delta
  * with zero Exchange (the CDC-apply SPJ pinned in KeyedChangesSpec).
  * Works identically one batch interval at a time (q75) or per
  * micro-batch on the changes STREAM (IvmSpec's foreachBatch leg). */
object Ivm {

  /** Full recompute of the maintained shape — the bootstrap and the
    * equivalence oracle: `group…, n_rows, sum_<c>…`. */
  def rollup(rows: DataFrame, group: Seq[String], sums: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      sums.map(c => sum(col(c)).as(s"sum_$c"))
    rows.groupBy(group.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Apply one changes-table interval (or micro-batch) to a maintained
    * rollup. `changes` must carry the group/sum columns plus
    * `_change_type`; `prev` must be the [[rollup]] shape. */
  def maintainRollup(prev: DataFrame, changes: DataFrame,
      group: Seq[String], sums: Seq[String]): DataFrame = {
    val sign = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    val deltaAggs = sum(sign).as("_d_n") +:
      sums.map(c => sum(col(c) * sign).as(s"_d_$c"))
    val delta = changes.groupBy(group.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    // full outer: a delta may create a brand-new group (all-insert) or
    // drain an existing one to zero (all-delete)
    val outCols = group.map(col) ++
      ((coalesce(col("n_rows"), lit(0L)) + coalesce(col("_d_n"), lit(0L)))
        .as("n_rows") +:
        sums.map(c => (coalesce(col(s"sum_$c"), lit(0L)) +
          coalesce(col(s"_d_$c"), lit(0L))).as(s"sum_$c")))
    prev.join(delta, group, "full_outer")
      .select(outCols: _*)
      .where(col("n_rows") > 0)
  }

  /** Full recompute including extremes — the bootstrap and equivalence
    * oracle for [[maintainRollupFull]]: `group…, n_rows, sum_<c>…,
    * min_<m>, max_<m>…`. */
  def rollupFull(rows: DataFrame, group: Seq[String], sums: Seq[String],
      minMax: Seq[String]): DataFrame = {
    val aggs = (count(lit(1)).as("n_rows") +:
      sums.map(c => sum(col(c)).as(s"sum_$c"))) ++
      minMax.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c")))
    rows.groupBy(group.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Maintain a [[rollupFull]] view across one changes interval,
    * extremes included. `current` must be the table state AT THE
    * INTERVAL'S END (the same snapshot `changes`' upper bound names —
    * an asOf read pins it even while the table moves on); it is read
    * ONLY for the groups whose deletes touched a maintained extreme,
    * so with a layout-key group the repair scan is an exact pushed
    * key-IN over the affected directories. Everything additive rides
    * [[maintainRollup]] unchanged; insert-only extreme motion is
    * monotone (`least`/`greatest`, null-skipping). */
  def maintainRollupFull(prev: DataFrame, changes: DataFrame,
      current: DataFrame, group: Seq[String], sums: Seq[String],
      minMax: Seq[String]): DataFrame = {
    if (minMax.isEmpty) return maintainRollup(prev, changes, group, sums)

    // ONE aggregate over the changes interval computes every per-group
    // signal at once (r20 — the r19 plan ran three separate
    // scans/aggregates over `changes` and re-joined `prev` three
    // times): the additive delta, the monotone insert extremes, AND
    // the delete-side extremes the repair detection needs. Conditional
    // aggregation (min/max over `when(...)`) replaces the
    // insert/delete pre-filters; nulls skip, so a group with no
    // inserts (or no deletes) resolves exactly like the old join-miss.
    val isIns = col("_change_type") === "insert"
    val isDel = col("_change_type") === "delete"
    val sign = when(isIns, lit(1L)).otherwise(lit(-1L))
    val deltaAggs = (sum(sign).as("_d_n") +:
      sums.map(c => sum(col(c) * sign).as(s"_d_$c"))) ++
      minMax.flatMap(c => Seq(
        min(when(isIns, col(c))).as(s"_ins_min_$c"),
        max(when(isIns, col(c))).as(s"_ins_max_$c"),
        min(when(isDel, col(c))).as(s"_del_min_$c"),
        max(when(isDel, col(c))).as(s"_del_max_$c")))
    val delta = changes.groupBy(group.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)

    // full outer: a delta may create a brand-new group (all-insert) or
    // drain an existing one to zero (all-delete)
    val joined = prev.join(delta, group, "full_outer")

    // repair detection: a delete row whose value EQUALS the group's
    // maintained extreme may have been its last witness. Per-group
    // form of the old per-row predicate: ∃ delete row v == min_c
    // ⟺ min(delete values) ≤ min_c (every live value is ≥ the
    // maintained min, so ≤ only holds at equality; the inequality form
    // additionally repairs — exactly, via re-aggregation — any group
    // whose inputs ever violated that invariant). Delta-sized, never
    // the corpus.
    val touchesExtreme = minMax.map(c =>
      col(s"_del_min_$c") <= col(s"min_$c") ||
        col(s"_del_max_$c") >= col(s"max_$c"))
      .reduce(_ || _)
    val affected = joined
      .where(col("n_rows").isNotNull && touchesExtreme)
      .select(group.map(col): _*)

    // bounded repair: re-aggregate ONLY the affected groups from the
    // interval-end state (left-semi keeps the probe on the big side;
    // `affected` is delta-bounded and broadcasts)
    val reAggs = minMax.flatMap(c => Seq(
      min(col(c)).as(s"_re_min_$c"), max(col(c)).as(s"_re_max_$c")))
    val repaired = current
      .join(broadcast(affected), group, "left_semi")
      .groupBy(group.map(col): _*).agg(reAggs.head, reAggs.tail: _*)

    val outCols = group.map(col) ++
      ((coalesce(col("n_rows"), lit(0L)) + coalesce(col("_d_n"), lit(0L)))
        .as("n_rows") +:
        sums.map(c => (coalesce(col(s"sum_$c"), lit(0L)) +
          coalesce(col(s"_d_$c"), lit(0L))).as(s"sum_$c"))) ++
      minMax.flatMap(c => Seq(
        // a repaired group answers from its re-aggregation (which
        // already saw the interval's inserts — `current` is the
        // interval-end state); otherwise monotone merge of the
        // previous extreme and the inserts' (least/greatest skip
        // nulls, so brand-new and insert-free groups both resolve)
        when(col(s"_re_min_$c").isNotNull, col(s"_re_min_$c"))
          .otherwise(least(col(s"min_$c"), col(s"_ins_min_$c")))
          .as(s"min_$c"),
        when(col(s"_re_max_$c").isNotNull, col(s"_re_max_$c"))
          .otherwise(greatest(col(s"max_$c"), col(s"_ins_max_$c")))
          .as(s"max_$c")))
    joined
      .join(repaired, group, "left_outer")
      .select(outCols: _*)
      .where(col("n_rows") > 0)
  }

  /** Signed delta of a two-table equi-join — the incremental form of
    * `A ⋈ B`: `Δ(A⋈B) = ΔA ⋈ B_old  ∪  A_new ⋈ ΔB` (old B against
    * ΔA, new A against ΔB — the ΔA⋈ΔB cross term lands exactly once).
    * Inputs are the two tables' changes relations (layout columns +
    * `_change_type`; either may be empty) and the old/new states of
    * the OTHER side; output is a signed changes relation over the
    * join's columns, ready for [[maintainRollup]] /
    * [[maintainRollupFull]]. A change row keeps its own sign through
    * the join (the joined-to side contributes unsigned state rows).
    * Column hygiene: `joinCols` must be the shared equi-key names;
    * remaining column names must not collide across the two tables
    * (the q01 star shape — fact measures ⋈ dim attributes). */
  def joinDelta(changesA: DataFrame, bOld: DataFrame,
      aNew: DataFrame, changesB: DataFrame,
      joinCols: Seq[String]): DataFrame = {
    val left = changesA.join(bOld, joinCols)
    val right = aNew.join(changesB, joinCols)
    // align columns by name (join order differs between the two legs)
    val cols = left.columns.toSeq
    left.select(cols.map(col): _*)
      .unionByName(right.select(cols.map(col): _*))
  }
}
