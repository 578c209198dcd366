package graft.operators

import graft.Q
import graft.functions.{Text, Vectors}
import graft.functions.Rounding.{duckRound, pround}
import graft.io.Bucketing
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** Curation operators beyond LlmData's x20–x62: diversity scoring,
  * weighted corpus sampling, embedding compression (product
  * quantization), and corpus-frequency rarity scoring.
  *
  * Parity discipline (same as [[LlmData]]): NO transcendentals — every
  * score is exact integer arithmetic plus at most one correctly-rounded
  * double division, so Spark and DuckDB agree bit-for-bit without
  * tolerance bands. Aggregation-order hazards are designed out by
  * summing INTEGERS (order-free) before the single division.
  */
object Curation {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** md5-derived 60-bit uniform hash of a long id — the repo-standard
    * engine-portable randomness source (same construction as x37/x41).
    * Promoted to the operators package so new draw sites (x96's
    * cluster draw, the x100/x101 ingest split) call the ONE named
    * helper instead of re-inlining the construction — the FIXTURES
    * "use these, don't re-derive" rule. */
  private[operators] def idHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  private[operators] def duckIdHash(expr: String): String =
    s"CAST('0x' || substr(md5(CAST($expr AS VARCHAR)), 1, 15) AS BIGINT)"

  /** Declarative twin of graft_token_stats, retained as the kernel's
    * executable specification (CurationSpec asserts integer equality
    * on the real corpus): Σc² via a per-distinct-token count fold —
    * O(distinct × len) interpreted, which is why the registered query
    * runs the O(len) kernel instead. */
  private[graft] def tokenSumsqHof(tk: Column): Column =
    aggregate(
      transform(array_distinct(tk), w => size(filter(tk, x => x === w)).cast("long")),
      lit(0L), (acc, c) => acc + c * c)

  /** x63 — Simpson diversity of the token distribution per document:
    * 1 − Σc²/n², the collision probability complement — a
    * repetition-concentration quality signal ORTHOGONAL to x43 (which
    * scores ordered shingle reuse; this scores the unordered frequency
    * profile, catching "the same 5 words shuffled forever" that shingle
    * dedup misses). Σc² is an exact integer, so the score is one double
    * division — no float accumulation anywhere, immune to the engines'
    * differing distinct-list orders. Entirely map-side (scan-stage
    * projection, no shuffle); the frequency profile comes from the
    * graft_token_stats kernel — ONE O(len) hash-map pass per document,
    * where the declarative form pays O(distinct × len) interpreted
    * dispatches (quadratic in document length: survivable on 100-token
    * test docs, a scan-stage killer on real articles). */
  private def x63 = Q(
    // sort first, count after (the q20 lesson, applied family-wide in
    // r13 — see x27's note in LlmData)
    (s, dir) => {
      t(s, dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .withColumn("tk", Text.tokens(col("text")))
        .withColumn("n", size(col("tk")).cast("long"))
        .withColumn("st", call_function("graft_token_stats", col("tk")))
        .select(col("doc_id"),
          col("n").as("n_tokens"),
          col("st.n_distinct").as("n_distinct"),
          (lit(1.0) - col("st.sumsq").cast("double") /
            (col("n") * col("n")).cast("double")).as("simpson"))
    },
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |m AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n,
           |        list_transform(list_distinct(w),
           |          x -> CAST(len(list_filter(w, y -> y = x)) AS BIGINT)) AS cs
           |      FROM toks)
           |SELECT doc_id, n AS n_tokens,
           |  CAST(len(cs) AS BIGINT) AS n_distinct,
           |  1.0 - CAST(list_reduce(list_transform(cs, c -> c * c),
           |               (a, b) -> a + b) AS DOUBLE) / CAST(n * n AS DOUBLE)
           |    AS simpson
           |FROM m ORDER BY doc_id""".stripMargin),
    "Simpson token diversity: exact integer Σc², one division; map-side, no shuffle")

  /** x64 — weighted sampling without replacement (exponential-race
    * form): each doc draws a uniform 60-bit hash key and races with
    * key/weight — higher weight ⇒ stochastically smaller race value ⇒
    * more likely into the sample. The race value stays INTEGER (bigint
    * division) so both engines rank identical values; the float
    * ln(u)/w race is a one-line swap where exact cross-engine parity
    * isn't required. Top-50 is TakeOrderedAndProject (distributed
    * heap, no global sort); the rank window runs on 50 rows. This is
    * the corpus-mixture primitive x37's per-stratum rates can't
    * express: smooth weighting by a continuous column (here n_chars —
    * longer docs proportionally more likely). */
  private def x64 = Q(
    (s, dir) => {
      val top = t(s, dir, "documents")
        // `div` (IntegralDivide) keeps the quotient exact bigint — `/`
        // would detour through a 53-mantissa-bit double and disagree
        // with the oracle's `//` on a few percent of 60-bit hashes
        .withColumn("idh", idHash(col("doc_id")))
        .select(col("doc_id"), col("n_chars"),
          expr("idh div greatest(n_chars, 1L)").as("race"))
        .orderBy("race", "doc_id")
        .limit(50)
      top.select(
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy("race", "doc_id")).as("rank"),
          col("doc_id"), col("n_chars"), col("race"))
        .orderBy("rank")
    },
    Some(s"""SELECT row_number() OVER (ORDER BY race, doc_id) AS rank,
            |  doc_id, n_chars, race
            |FROM (SELECT doc_id, n_chars,
            |        ${duckIdHash("doc_id")} // greatest(n_chars, 1) AS race
            |      FROM documents)
            |ORDER BY race, doc_id LIMIT 50""".stripMargin),
    "weighted sample: integer exponential race, distributed top-k heap")

  // ── shared PQ pipeline (x65 codes / x67 ADC / x70 distortion / x72
  //    indexed probe / x35's pq_adc recall row) ───────────────────────
  // ONE definition of the trained codebook, the subvector distance, and
  // the assignment argmin — the code table x67 searches, the distortion
  // x70 audits, and the recall x35 measures are all definitionally the
  // ones x65 publishes.

  /** Trained per-subspace codebook: [subspace 0..3] → n × (code,
    * 16-dim center). Codes are POSITIONAL — 1..n in seed vec_id order,
    * stable across training (empty clusters keep their previous
    * center) — so the native kernel's positional argmin (code =
    * index+1) is exact. On the gapless full corpus (seeds 1..8)
    * positional == seed vec_id; the hist slice (x75) has a gap, which
    * is why keying is positional on both engines. */
  private[graft] type PqCodebook = IndexedSeq[Seq[(Long, IndexedSeq[Double])]]

  // lazy + def below: Curation and LlmData reference each other
  // (LlmData's x35 oracle embeds duckPqChain; these registries are
  // LlmData's class). Eager vals on both sides would make object
  // initialization ORDER-dependent — whichever object initializes
  // first re-enters the other mid-init and reads a null val, splicing
  // the literal string "null" into an oracle. lazy vals + a pure def
  // make the cross-references safe from either entry point.
  private lazy val pqMemo =
    new LlmData.SessionRegistry[TrieMap[String, (String, PqCodebook)]]
  private lazy val pqIndexMemo = new LlmData.SessionRegistry[TrieMap[String, (String, String)]]

  /** Release hook (called from LlmData.clearMemo — one lifecycle for
    * the whole operator surface). */
  private[operators] def clearPqMemo(s: SparkSession): Unit = {
    pqMemo.remove(s)
    pqIndexMemo.remove(s)
  }

  private[operators] def pqMemoPopulated(s: SparkSession): Boolean =
    pqMemo.has(s) || pqIndexMemo.has(s)

  /** Per-subspace Lloyd's training (the x34 playbook applied to PQ):
    * seed each subspace's 8 centers from the first-8 embeddings'
    * subvectors, then 2 rounds of {kernel argmin assignment → per-dim
    * integer MICRO-UNIT means}. The collect is bounded by 4×8×16 = 512
    * index-metadata rows per round, never data — and unlike the IVF
    * coarse quantizer (whose width now tracks the corpus via
    * LlmData.corpusK, forcing a distributed path above LiteralKMax),
    * this bound never erodes: PQ's per-subspace code count is fixed by
    * the code WIDTH (3 bits ⇒ 8 entries), a compression-rate choice
    * independent of corpus size. Memoized per (session,
    * corpus): x65/x67/x70/x72/x35 all train once. The DuckDB twin
    * ([[duckPqChain]]) replays the identical rounds, so a trained
    * center is reproduced bit-for-bit: micro-unit sums are exact
    * integers (order-free), and the mean is sm/n/10⁶ in correctly-
    * rounded IEEE double on both engines. */
  private[graft] def trainPqCodebook(s: SparkSession, dir: String): PqCodebook =
    LlmData.stampedValue(pqMemo, s, dir, dir)(
      trainPqCodebookOn(t(s, dir, "embeddings")))

  /** Codebook trained on the HISTORICAL slice only, then FROZEN — the
    * PQ twin of LlmData's trainedCentroidsHist, for x75's incremental
    * code-table maintenance (new batches are encoded against this,
    * never retrained per append; x75 measures the recall drift that
    * decides a retrain). */
  private[graft] def trainPqCodebookHist(s: SparkSession, dir: String): PqCodebook =
    LlmData.stampedValue(pqMemo, s, dir + "#hist", dir)(
      trainPqCodebookOn(t(s, dir, "embeddings").filter(LlmData.histVec)))

  /** The Lloyd's loop itself, over an arbitrary training frame. */
  private def trainPqCodebookOn(e: DataFrame): PqCodebook = {
        var cb: PqCodebook = {
          val rows = e.filter(col("vec_id").between(1, 8))
            .select(col("vec_id"), col("embedding")).collect()
            .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toIndexedSeq)
            .sortBy(_._1).toIndexedSeq
          // codes are POSITIONAL (1..n in seed vec_id order) — identical
          // to vec_id keying on the full corpus (seeds 1..8), but the
          // hist slice's seed set has a gap (no vec_id 7) and the
          // kernel's argmin returns positions, so positional keying is
          // what keeps training round 2 reading its own round-1 sums
          // (the oracle's pc0 re-keys with row_number the same way)
          (0 to 3).map(ss => rows.zipWithIndex.map { case ((_, v), i) =>
            (i + 1).toLong -> v.slice(ss * 16, ss * 16 + 16) }.toSeq).toIndexedSeq
        }
        for (_ <- 1 to 2) {
          val sums = e
            .select(col("embedding"),
              posexplode(pqAssignNative(col("embedding"), cb)).as(Seq("s", "code")))
            .select(col("s"), col("code"),
              posexplode(slice(Vectors.toDouble(col("embedding")),
                col("s") * 16 + 1, lit(16))).as(Seq("pos", "v")))
            .groupBy("s", "code", "pos")
            .agg(sum(floor(col("v") * 1000000.0 + 0.5)).as("sm"),
              count(lit(1)).as("n"))
            .collect()
          val byKey = sums.groupBy(r => (r.getInt(0), r.getLong(1)))
          cb = cb.zipWithIndex.map { case (entries, ss) =>
            entries.map { case (cid, old) =>
              cid -> byKey.get((ss, cid)).fold(old)(rows =>
                rows.sortBy(_.getInt(2)).map(r =>
                  (r.getLong(3).toDouble / r.getLong(4)) / 1000000.0).toIndexedSeq)
            }
          }
        }
        cb
  }

  /** Flattened [s][code][dim] literal for the native kernel. */
  private def flatCb(cb: PqCodebook): Seq[Double] =
    for { entries <- cb; (_, ce) <- entries; x <- ce } yield x

  /** Native assignment: array of 4 codes (1..8), one tight codegen'd
    * loop per row (graft.plans.PqAssign) — bit-equal to the HOF
    * [[pqCodeHof]] path (CurationSpec asserts it), ~30× fewer
    * interpreted dispatches. The codebook rides along as a literal
    * (index metadata, 512 doubles). */
  private[graft] def pqAssignNative(emb: Column, cb: PqCodebook): Column =
    call_function("graft_pq_assign", emb, typedlit(flatCb(cb)),
      lit(cb.head.size), lit(16))

  /** Native rounded L2² to the ASSIGNED code per subspace (for the
    * distortion audit — same loop, dists output). */
  private[graft] def pqDistsNative(emb: Column, cb: PqCodebook): Column =
    call_function("graft_pq_dists", emb, typedlit(flatCb(cb)),
      lit(cb.head.size), lit(16))

  /** Stage the 4 widened 16-dim subvectors as their own columns ONCE
    * per row (used on the single-row query side, and by the spec's
    * HOF-vs-kernel parity check). The 8 per-codebook-entry folds for a
    * subspace then read the staged attribute instead of re-evaluating
    * slice(transform(embedding)) — higher-order functions are
    * interpreted, so without staging the widening ran 32× per row
    * (CollapseProject keeps the staging Project because the aliases
    * are non-cheap and multiply referenced). */
  private[graft] def withPqSubs(df: DataFrame): DataFrame =
    (0 to 3).foldLeft(df)((d, s) =>
      d.withColumn(s"sub$s", slice(Vectors.toDouble(col("embedding")), s * 16 + 1, 16)))

  /** Sequential-fold L2² of a staged subvector column against a literal
    * 16-dim subvector, rounded at 6dp — the exact fold the DuckDB twin
    * replays and the native kernel reproduces. */
  private[graft] def pqD2(a: Column, b: IndexedSeq[Double]): Column =
    pround(aggregate(zip_with(a, typedlit(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _), 6)

  /** Declarative argmin code for subspace `s` over the staged `sub{s}`
    * column: array_min struct ordering = smallest d2, ties to the
    * smallest code (oracle: ORDER BY d2, code). Retained as the
    * kernel's executable specification — CurationSpec asserts
    * kernel == HOF on the real corpus. */
  private[graft] def pqCodeHof(entries: Seq[(Long, IndexedSeq[Double])], s: Int): Column =
    array_min(array(entries.map { case (cid, ce) =>
      struct(pqD2(col(s"sub$s"), ce).as("d2"), lit(cid).as("code"))
    }: _*)).getField("code")

  /** DuckDB twin of one PQ Lloyd's round: assignment (rounded-d2
    * argmin, ties to smallest code) then per-dim micro-unit means;
    * empty clusters keep their center via the LEFT JOIN coalesce. */
  private def duckSubD2(sv: String, ce: String, x: String = ""): String =
    duckRound(s"(SELECT sum(($sv[d.i] - $ce[d.i]) * ($sv[d.i] - $ce[d.i])) " +
      s"FROM ${x}pdim d)", 6)

  private def duckPqLloyd(r: Int, cin: String, cout: String,
      x: String = ""): String =
    s"""${x}pq$r AS (SELECT b.vec_id, b.s, b.sv, c.code,
       |        ${duckSubD2("b.sv", "c.ce", x)} AS d2
       |      FROM ${x}psub b JOIN $cin c ON b.s = c.s),
       |${x}pa$r AS (SELECT s, code, sv, row_number() OVER (
       |        PARTITION BY vec_id, s ORDER BY d2, code) AS rn FROM ${x}pq$r),
       |${x}pm$r AS (SELECT a.s, a.code, d.i AS pos,
       |        CAST(sum(CAST(floor(a.sv[d.i] * 1000000.0 + 0.5) AS BIGINT))
       |          AS BIGINT) AS sm,
       |        count(*) AS n
       |      FROM ${x}pa$r a CROSS JOIN ${x}pdim d WHERE a.rn = 1
       |      GROUP BY a.s, a.code, d.i),
       |${x}pn$r AS (SELECT s, code,
       |        list(CAST(sm AS DOUBLE) / n / 1000000.0 ORDER BY pos) AS ce
       |      FROM ${x}pm$r GROUP BY s, code),
       |$cout AS (SELECT c.s, c.code, coalesce(n.ce, c.ce) AS ce
       |      FROM $cin c LEFT JOIN ${x}pn$r n ON c.s = n.s AND c.code = n.code)"""
      .stripMargin

  /** DuckDB twin of the full PQ chain: subvectors (`psub`), seeded
    * codebook (`pc0`), two training rounds (→ `pc2`), final rounded
    * distances (`pd`), assignment ranks (`pr`), the pivoted code table
    * (`pcodes`), and the query's ADC distance rows (`pqd`). Shared by
    * the x65/x67/x70/x72 oracles and x35's pq_adc arm so they can
    * never diverge. All names p-prefixed to coexist with duckIvfChain
    * in one WITH (x35). */
  private[operators] def duckPqChain: String = duckPqChainFor("embeddings", "")

  /** The PQ chain over relation `src` with every CTE name prefixed by
    * `x`, so two differently-trained chains coexist in one WITH (x75
    * replays the historical-slice training next to the full-corpus
    * one — the duckIvfChainFor pattern). For `x = ""` on the gapless
    * full corpus the pc0 row_number re-key is the identity mapping, so
    * every pre-x75 oracle's RESULT is unchanged (re-verified by
    * whole-family parity). */
  private[operators] def duckPqChainFor(src: String, x: String): String =
    s"""${x}pdim AS (SELECT unnest(range(1, 17)) AS i),
       |${x}psub AS (SELECT e.vec_id, ss.s,
       |        list_transform(range(1, 17),
       |          i -> CAST(e.embedding[ss.s * 16 + i] AS DOUBLE)) AS sv
       |      FROM $src e
       |      CROSS JOIN (SELECT unnest(range(0, 4)) AS s) ss),
       |${x}pc0 AS (SELECT s, row_number() OVER (
       |          PARTITION BY s ORDER BY vec_id) AS code, sv AS ce
       |        FROM ${x}psub WHERE vec_id BETWEEN 1 AND 8),
       |${duckPqLloyd(1, s"${x}pc0", s"${x}pc1", x)},
       |${duckPqLloyd(2, s"${x}pc1", s"${x}pc2", x)},
       |${x}pd AS (SELECT b.vec_id, b.s, c.code,
       |        ${duckSubD2("b.sv", "c.ce", x)} AS d2
       |      FROM ${x}psub b JOIN ${x}pc2 c ON b.s = c.s),
       |${x}pr AS (SELECT vec_id, s, code, d2, row_number() OVER (
       |        PARTITION BY vec_id, s ORDER BY d2, code) AS rn FROM ${x}pd),
       |${x}pcodes AS (SELECT vec_id,
       |    max(CASE WHEN s = 0 THEN code END) AS c0,
       |    max(CASE WHEN s = 1 THEN code END) AS c1,
       |    max(CASE WHEN s = 2 THEN code END) AS c2,
       |    max(CASE WHEN s = 3 THEN code END) AS c3
       |  FROM ${x}pr WHERE rn = 1 GROUP BY vec_id),
       |${x}pqd AS (SELECT s, code, d2 FROM ${x}pd WHERE vec_id = 0)""".stripMargin

  /** x65 — product-quantization code assignment with a TRAINED
    * codebook: the embedding is cut into 4×16-dim subvectors, each
    * assigned to its nearest of 8 per-subspace Lloyd's-trained centers
    * by rounded L2² — compressing 64 floats (256 B) to 4 bytes for the
    * memory-resident ANN index a 100 TB embedding corpus needs (at
    * scale the IVF lists of x34 hold PQ codes, not raw vectors).
    * Assignment is the native kernel (one codegen'd loop/row) — pure
    * map-side scan-stage compute; ties break to the smallest code on
    * both engines. */
  private def x65 = Q(
    (s, dir) => {
      val cb = trainPqCodebook(s, dir)
      t(s, dir, "embeddings")
        .select(col("vec_id"), pqAssignNative(col("embedding"), cb).as("codes"))
        .select(col("vec_id"),
          col("codes").getItem(0).as("c0"), col("codes").getItem(1).as("c1"),
          col("codes").getItem(2).as("c2"), col("codes").getItem(3).as("c3"))
        .orderBy("vec_id")
    },
    Some(s"""WITH $duckPqChain
            |SELECT vec_id, c0, c1, c2, c3 FROM pcodes ORDER BY vec_id""".stripMargin),
    "product quantization: 4×16-dim subspaces, 8-entry TRAINED codebook (2 Lloyd's rounds, micro-unit means), native argmin kernel")

  /** Query-side ADC distance table: dt_s[code] = rounded d2(q_sub_s,
    * center) — one bounded single-row frame (4×8 doubles), broadcast.
    * 32 interpreted folds on ONE row — negligible; the corpus side
    * never touches a fold. */
  private def adcQueryTable(s: SparkSession, dir: String, cb: PqCodebook): DataFrame = {
    def dt(s0: Int): Column =
      array(cb(s0).map { case (_, ce) => pqD2(col(s"sub$s0"), ce) }: _*)
    withPqSubs(t(s, dir, "embeddings").filter(col("vec_id") === 0))
      .select(dt(0).as("dt0"), dt(1).as("dt1"), dt(2).as("dt2"), dt(3).as("dt3"))
  }

  private def adcDistance: Column =
    (element_at(col("dt0"), col("codes").getItem(0).cast("int")) +
      element_at(col("dt1"), col("codes").getItem(1).cast("int")) +
      element_at(col("dt2"), col("codes").getItem(2).cast("int")) +
      element_at(col("dt3"), col("codes").getItem(3).cast("int"))).as("adc")

  /** Shared ADC top-k pipeline (x67 and x35's pq_adc recall arm). */
  private[graft] def adcTopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    val cb = trainPqCodebook(s, dir)
    t(s, dir, "embeddings")
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), pqAssignNative(col("embedding"), cb).as("codes"))
      .crossJoin(broadcast(adcQueryTable(s, dir, cb)))
      .select(col("vec_id"), adcDistance)
      .orderBy(asc("adc"), asc("vec_id"))
      .limit(k)
  }

  /** DuckDB twin of [[adcTopK]] (requires [[duckPqChain]] in scope). */
  private[operators] def duckAdcTopK(k: Int): String =
    s"""SELECT c.vec_id,
       |  ((q0.d2 + q1.d2) + q2.d2) + q3.d2 AS adc
       |FROM pcodes c
       |JOIN pqd q0 ON q0.s = 0 AND q0.code = c.c0
       |JOIN pqd q1 ON q1.s = 1 AND q1.code = c.c1
       |JOIN pqd q2 ON q2.s = 2 AND q2.code = c.c2
       |JOIN pqd q3 ON q3.s = 3 AND q3.code = c.c3
       |WHERE c.vec_id <> 0
       |ORDER BY adc, c.vec_id LIMIT $k""".stripMargin

  /** x67 — ANN over PQ codes by asymmetric distance (ADC): the query
    * precomputes a 4×8 distance table (its rounded L2² to every
    * trained center per subspace — one bounded single-row frame,
    * broadcast), and each corpus vector's approximate distance is four
    * O(1) table lookups by its x65 codes summed in a FIXED left-assoc
    * order (parity: float addition isn't associative, so the oracle
    * adds in the same written order). This is the scan shape that makes
    * 100 TB ANN affordable: the per-vector work is one native
    * assignment loop plus 4 byte-indexed lookups, and the raw vectors
    * never leave storage. Top-5 is a distributed heap. Recall vs the
    * exact top-k is measured in x35's pq_adc row. */
  private def x67 = Q(
    (s, dir) => adcTopK(s, dir, 5),
    Some(s"WITH $duckPqChain\n${duckAdcTopK(5)}"),
    "PQ asymmetric-distance ANN: broadcast 4×8 query table, native code assignment, per-vector cost = 4 indexed lookups")

  /** x70 — PQ distortion audit, per subspace per code ("measure, don't
    * guess" for the trained codebook — the x68 discipline applied to
    * PQ): member count, mean and worst rounded L2² to the assigned
    * center. The K/subspace-count tuning dial: a subspace whose max_d2
    * dwarfs its mean says its 8 codes under-cover that 16-dim slice.
    * Uses the SAME kernel assignment x65 publishes. Micro-unit integer
    * sums keep the means order-free and engine-exact. (The two kernel
    * calls each run the full argmin loop — a fused codes+dists struct
    * output would halve that, but at 512 flops × 2 per row the audit
    * is shuffle-dominated, not worth a third kernel datatype.) */
  private def x70 = Q(
    (s, dir) => {
      val cb = trainPqCodebook(s, dir)
      t(s, dir, "embeddings")
        .select(pqAssignNative(col("embedding"), cb).as("cs"),
          pqDistsNative(col("embedding"), cb).as("ds"))
        .select(posexplode(col("cs")).as(Seq("s", "code")), col("ds"))
        .select(col("s").cast("long").as("s"), col("code"),
          round(element_at(col("ds"), col("s") + 1) * 1000000.0, 0)
            .cast("long").as("d2_micro"))
        .groupBy("s", "code")
        .agg(count(lit(1)).as("n_members"),
          (sum("d2_micro").cast("double") /
            (count(lit(1)) * 1000000.0)).as("mean_d2"),
          (max("d2_micro").cast("double") / 1000000.0).as("max_d2"))
        .orderBy("s", "code")
    },
    Some(s"""WITH $duckPqChain
            |SELECT CAST(s AS BIGINT) AS s, code, count(*) AS n_members,
            |  CAST(sum(CAST(round(d2 * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
            |    / (count(*) * 1000000.0) AS mean_d2,
            |  CAST(max(CAST(round(d2 * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
            |    / 1000000.0 AS max_d2
            |FROM pr WHERE rn = 1
            |GROUP BY s, code ORDER BY s, code""".stripMargin),
    "PQ distortion audit: per-subspace per-code mean/worst rounded L2² in exact micro-units; shares x65's trained assignment")

  /** x72 — ADC probe over a MATERIALIZED code table (the index-build/
    * query split, PQ side): x65's codes are persisted once per
    * (session, corpus) as a catalog table — at 100 TB the 4-byte codes
    * are the memory-resident index while raw vectors stay in cold
    * storage — and the registered query is the PROBE ONLY: code-table
    * scan + broadcast 4×8 distance table + distributed heap, zero
    * ShuffleExchange (pinned by PlanAuditSpec — a property of the
    * broadcast+heap probe shape; what the split buys is reading codes
    * instead of re-assigning them). The table buckets on vec_id so
    * id-keyed maintenance (joining codes back to raw vectors bucketed
    * the same way, e.g. for re-rank materialization) co-locates. Same
    * semantics and oracle as x67.
    */
  private def x72 = Q(
    (s, dir) => {
      val cb = trainPqCodebook(s, dir)
      val tbl = LlmData.tableOnce(pqIndexMemo, s, dir)({
          val name = "graft_pq_codes_" + dir.replaceAll("[^A-Za-z0-9]", "_")
          Bucketing.writeBucketed(
            t(s, dir, "embeddings").filter(col("vec_id") =!= 0)
              .select(col("vec_id"),
                pqAssignNative(col("embedding"), cb).as("codes")),
            name, "vec_id", 8, sorted = false)
          name
        })
      Bucketing.table(s, tbl)
        .crossJoin(broadcast(adcQueryTable(s, dir, cb)))
        .select(col("vec_id"), adcDistance)
        .orderBy(asc("adc"), asc("vec_id"))
        .limit(5)
    },
    Some(s"WITH $duckPqChain\n${duckAdcTopK(5)}"),
    "ADC probe over a persisted PQ code table: zero-Exchange probe plan, codes built once per corpus")

  /** Two-stage ADC retrieval (x73 and x35's pq_adc_rerank arm): ADC
    * shortlist of `depth` (default R=50, the registered/oracle'd
    * configuration), exact cosine re-rank of the survivors. `depth` is
    * the recall dial AdcDialSpec measures at the bench SF — recall is
    * monotone in it (anything that displaces a true top-k member from
    * a grown shortlist's re-rank must itself be a true top-k member). */
  private[graft] def adcRerankTopK(s: SparkSession, dir: String, k: Int,
      depth: Int = 50): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.join(broadcast(adcTopK(s, dir, depth).select(col("vec_id"))), "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        LlmData.cosine6(col("embedding"), col("qe")).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** DuckDB twin of [[adcRerankTopK]] (requires [[duckPqChain]]). */
  private[operators] def duckAdcRerankTopK(k: Int): String =
    s"""SELECT e.vec_id,
       |  ${duckRound(LlmData.duckCosine("e.embedding", "q.qe"), 6)} AS cos
       |FROM embeddings e
       |JOIN (${duckAdcTopK(50)}) sl ON e.vec_id = sl.vec_id
       |CROSS JOIN (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
       |ORDER BY cos DESC, e.vec_id LIMIT $k""".stripMargin

  /** x73 — ADC + exact re-rank, the PRODUCTION deployment shape of PQ
    * (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011 — IVFADC with re-ranking): stage 1 scans the
    * 4-byte code table by asymmetric distance and keeps a SHORTLIST
    * (R=50); stage 2 fetches raw vectors for the shortlist only and
    * re-ranks by exact cosine. At 100 TB this is why PQ exists — the
    * exact scorer touches R rows, not the corpus, and the corpus scan
    * is 4 lookups/row over codes that fit in memory. The recall lever
    * is measurable in x35: direct ADC top-5 recall is 0.0 on this
    * corpus (4-byte codes on near-uniform synthetic vectors carry no
    * fine ranking power — the honest number), re-ranked it recovers to
    * 0.6 at R=50; R is the dial (1.0 by R=200 at sf0.01). */
  private def x73 = Q(
    (s, dir) => adcRerankTopK(s, dir, 5),
    Some(s"WITH $duckPqChain\n${duckAdcRerankTopK(5)}"),
    "two-stage retrieval: ADC shortlist (R=50) + exact-cosine re-rank of survivors only")

  /** x66 — corpus-rarity score (mean inverse unigram frequency): the
    * cheap importance signal curation pipelines use to up-weight
    * documents carrying rare vocabulary (the rational stand-in for
    * unigram log-prob — ratios instead of logs, same ranking power,
    * exact parity). Per-token rarity = (N·1000) div count(token) stays
    * INTEGER, so the per-doc sum is order-free; one division at the
    * end. Plan: one shuffle to count the vocabulary, one hash join of
    * tokens⋈counts (vocab side is groupBy output — small relative to
    * the token stream), one shuffle back to doc grain. N rides a
    * broadcast single-row cross join, not a literal. */
  private def x66 = Q(
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
      val cnt = toks.groupBy("w").agg(count(lit(1)).as("c"))
      val tot = toks.agg(count(lit(1)).as("n_total"))
      toks.join(cnt, "w")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), expr("(n_total * 1000) div c").as("r"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum("r").as("r_milli"))
        .select(col("doc_id"), col("n_tokens"),
          (col("r_milli").cast("double") /
            (col("n_tokens") * 1000.0)).as("rarity"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
           |              FROM documents),
           |cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
           |tot AS (SELECT count(*) AS n_total FROM toks)
           |SELECT t.doc_id, count(*) AS n_tokens,
           |  CAST(sum((tot.n_total * 1000) // cnt.c) AS DOUBLE)
           |    / (count(*) * 1000.0) AS rarity
           |FROM toks t JOIN cnt ON t.w = cnt.w CROSS JOIN tot
           |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin),
    "mean inverse unigram frequency: integer milli-rarity sum, one division; vocab join + doc re-agg")

  /** x69 — SymSpell-style fuzzy token matching (deletion-neighborhood
    * blocking): candidate pairs come from EQUALITY on 1-deletion
    * variant keys — O(len) keys per word, a hash join, never an
    * all-pairs edit-distance scan (the blocking trick that makes fuzzy
    * entity resolution feasible at corpus scale) — then the exact
    * levenshtein ≤ 1 confirm runs only inside the blocked candidates.
    * The synthetic vocabulary has no natural near-misses, so the query
    * SEEDS one deterministic typo per ≥4-char vocab word (drop the 2nd
    * char — explicitly: the op under test is the fuzzy join, not the
    * corpus) and recovers the best correction by support count;
    * `recovered` reports whether the true source word won — an
    * oracle-checked accuracy value. Ranking is total ((c, w) ties
    * broken lexically); every step is string ops + integer counts. */
  private def x69 = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      def keysOf(w: Column): Column = array_union(
        transform(sequence(lit(1), length(w)),
          i => concat(w.substr(lit(1), i - 1), w.substr(i + 1, length(w)))),
        array(w))
      val v = t(s, dir, "documents")
        .select(explode(Text.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .filter(length(col("w")) >= 3)
      val vk = v.select(col("w"), col("c"), explode(keysOf(col("w"))).as("key"))
      val typos = v.filter(length(col("w")) >= 4)
        .select(col("w").as("orig"),
          concat(col("w").substr(lit(1), lit(1)),
            col("w").substr(lit(3), length(col("w")))).as("typo"))
      val cand = typos
        .select(col("orig"), col("typo"), explode(keysOf(col("typo"))).as("key"))
        .join(vk, "key")
        .filter(col("w") =!= col("typo") &&
          levenshtein(col("typo"), col("w")) <= 1)
        .select("orig", "typo", "w", "c").distinct()
      cand
        .withColumn("rn", row_number().over(
          Window.partitionBy("orig", "typo").orderBy(desc("c"), asc("w"))))
        .filter(col("rn") === 1)
        .select(col("orig"), col("typo"), col("w").as("suggestion"),
          col("c").as("sup_count"), (col("w") === col("orig")).as("recovered"))
        .orderBy("orig", "typo")
    },
    Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
           |v AS (SELECT w, count(*) AS c FROM toks GROUP BY 1 HAVING len(w) >= 3),
           |vk AS (SELECT w, c, unnest(list_distinct(list_append(
           |         list_transform(range(1, len(w) + 1),
           |           i -> substr(w, 1, CAST(i - 1 AS INTEGER))
           |                || substr(w, CAST(i + 1 AS INTEGER))), w))) AS key
           |       FROM v),
           |ty AS (SELECT w AS orig,
           |         substr(w, 1, 1) || substr(w, 3) AS typo
           |       FROM v WHERE len(w) >= 4),
           |tk AS (SELECT orig, typo, unnest(list_distinct(list_append(
           |         list_transform(range(1, len(typo) + 1),
           |           i -> substr(typo, 1, CAST(i - 1 AS INTEGER))
           |                || substr(typo, CAST(i + 1 AS INTEGER))), typo))) AS key
           |       FROM ty),
           |cand AS (SELECT DISTINCT t.orig, t.typo, v.w, v.c
           |         FROM tk t JOIN vk v ON t.key = v.key
           |         WHERE v.w <> t.typo AND levenshtein(t.typo, v.w) <= 1),
           |r AS (SELECT orig, typo, w, c, row_number() OVER (
           |        PARTITION BY orig, typo ORDER BY c DESC, w) AS rn
           |      FROM cand)
           |SELECT orig, typo, w AS suggestion, c AS sup_count,
           |  (w = orig) AS recovered
           |FROM r WHERE rn = 1 ORDER BY orig, typo""".stripMargin),
    "SymSpell fuzzy join: 1-deletion key blocking (hash join, never all-pairs), exact levenshtein confirm, support-ranked correction")

  // ── Incremental PQ code-table maintenance (x75) ────────────────────
  /** The NEW batch encoded against the frozen historical codebook —
    * map-side only (the codebook rides as a literal), one scan of the
    * new rows, no read of the base code table (PlanAuditSpec pins the
    * shape — the PQ twin of LlmData.ivfAppendBatch). */
  private[graft] def pqAppendBatch(s: SparkSession, dir: String): DataFrame =
    pqFrozenEncode(s, dir)(t(s, dir, "embeddings").filter(LlmData.newVec))

  /** Map-side encode closure against the frozen historical codebook —
    * the PQ `assign` for
    * [[graft.streaming.EventStream.ivfStreamingAppend]] (key =
    * "vec_id", buckets = 8, matching [[incPqIndexTable]]'s spec).
    * Training happens once here (memoized); every micro-batch then
    * pays one native-kernel scan of its own rows. */
  private[graft] def pqFrozenEncode(s: SparkSession, dir: String): DataFrame => DataFrame = {
    val cb = trainPqCodebookHist(s, dir)
    df => df.select(col("vec_id"), pqAssignNative(col("embedding"), cb).as("codes"))
  }

  /** The historical-slice base code table — THE single definition of
    * the base shape (hist filter, no query vector, vec_id-bucketed
    * ×8): [[incPqIndexTable]]'s first phase and the streaming spec's
    * identical-base comparison both call it, so the two can never
    * drift. */
  private[graft] def pqWriteBaseIndex(s: SparkSession, dir: String, tbl: String): Unit =
    Bucketing.writeBucketed(
      pqFrozenEncode(s, dir)(
        t(s, dir, "embeddings").filter(LlmData.histVec && col("vec_id") =!= 0)),
      tbl, "vec_id", 8, sorted = false)

  private[graft] def incPqIndexTableName(dir: String): String =
    "graft_pq_inc_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Build-then-append lifecycle for the PQ code table, once per
    * (session, corpus): base codes from the historical corpus under
    * the frozen hist codebook, new batch APPENDED under the same
    * bucket spec — base files untouched. */
  private def incPqIndexTable(s: SparkSession, dir: String): String =
    LlmData.tableOnce(pqIndexMemo, s, dir + "#inc") {
      val tbl = incPqIndexTableName(dir)
      pqWriteBaseIndex(s, dir, tbl)
      Bucketing.appendBucketed(
        pqAppendBatch(s, dir), tbl, "vec_id", 8, sorted = false)
      tbl
    }

  /** ADC shortlist over the incrementally-maintained code table —
    * x72's zero-Exchange probe shape (scan + broadcast distance table
    * + distributed heap), reading base AND appended code files. */
  private[graft] def adcIncShortlist(s: SparkSession, dir: String,
      r: Int): DataFrame = {
    val cb = trainPqCodebookHist(s, dir)
    Bucketing.table(s, incPqIndexTable(s, dir))
      .crossJoin(broadcast(adcQueryTable(s, dir, cb)))
      .select(col("vec_id"), adcDistance)
      .orderBy(asc("adc"), asc("vec_id"))
      .limit(r)
  }

  /** Two-stage retrieval over the incremental index: ADC shortlist
    * (R=50) + exact-cosine re-rank of survivors only — x73's
    * production shape on the appended code table. */
  private[graft] def adcRerankIncTopK(s: SparkSession, dir: String,
      k: Int): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.join(broadcast(adcIncShortlist(s, dir, 50).select(col("vec_id"))), "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        LlmData.cosine6(col("embedding"), col("qe")).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** x75 — incremental PQ code-table maintenance: the PQ half of the
    * append-mostly story (x74 is the IVF half). The daily operation is
    * "encode the new batch against the FROZEN codebook and append to
    * the bucketed code table" — never a rebuild, never a retrain as a
    * side effect. The registered result is the retrain-decision
    * metric: recall@5 of two-stage retrieval (ADC shortlist R=50 +
    * exact re-rank, the x73 production shape) over the incremental
    * table vs the full-retrain pipeline, both against exact top-k.
    * Oracle replays BOTH trainings (h-prefixed chain trains on the
    * historical slice, new-batch codes assigned against its round-2
    * codebook). */
  private def x75 = Q(
    (s, dir) => {
      val exact = LlmData.exactTop5Ids(s, dir)
      LlmData.recallRow(exact, adcRerankTopK(s, dir, 5),
          "pq_rerank_full_retrain", 5)
        .unionByName(LlmData.recallRow(exact, adcRerankIncTopK(s, dir, 5),
          "pq_rerank_incremental", 5))
        .orderBy("method")
    },
    Some(s"""WITH hsrc AS (SELECT * FROM embeddings WHERE vec_id % 10 <> 7),
            |${duckPqChainFor("hsrc", "h")},
            |$duckPqChain,
            |hnsub AS (SELECT e.vec_id, ss.s,
            |        list_transform(range(1, 17),
            |          i -> CAST(e.embedding[ss.s * 16 + i] AS DOUBLE)) AS sv
            |      FROM embeddings e
            |      CROSS JOIN (SELECT unnest(range(0, 4)) AS s) ss
            |      WHERE e.vec_id % 10 = 7),
            |hnd AS (SELECT b.vec_id, b.s, c.code,
            |        ${duckSubD2("b.sv", "c.ce", "h")} AS d2
            |      FROM hnsub b JOIN hpc2 c ON b.s = c.s),
            |hnr AS (SELECT vec_id, s, code, row_number() OVER (
            |        PARTITION BY vec_id, s ORDER BY d2, code) AS rn FROM hnd),
            |hncodes AS (SELECT vec_id,
            |    max(CASE WHEN s = 0 THEN code END) AS c0,
            |    max(CASE WHEN s = 1 THEN code END) AS c1,
            |    max(CASE WHEN s = 2 THEN code END) AS c2,
            |    max(CASE WHEN s = 3 THEN code END) AS c3
            |  FROM hnr WHERE rn = 1 GROUP BY vec_id),
            |hall AS (SELECT vec_id, c0, c1, c2, c3 FROM hpcodes
            |         WHERE vec_id <> 0
            |         UNION ALL
            |         SELECT vec_id, c0, c1, c2, c3 FROM hncodes),
            |hsl AS (SELECT c.vec_id,
            |          ((q0.d2 + q1.d2) + q2.d2) + q3.d2 AS adc
            |        FROM hall c
            |        JOIN hpqd q0 ON q0.s = 0 AND q0.code = c.c0
            |        JOIN hpqd q1 ON q1.s = 1 AND q1.code = c.c1
            |        JOIN hpqd q2 ON q2.s = 2 AND q2.code = c.c2
            |        JOIN hpqd q3 ON q3.s = 3 AND q3.code = c.c3
            |        ORDER BY adc, c.vec_id LIMIT 50),
            |hrr AS (SELECT e.vec_id,
            |          ${duckRound(LlmData.duckCosine("e.embedding", "q.qe"), 6)} AS cos
            |        FROM embeddings e
            |        JOIN hsl ON e.vec_id = hsl.vec_id
            |        CROSS JOIN (SELECT embedding AS qe FROM embeddings
            |                    WHERE vec_id = 0) q
            |        ORDER BY cos DESC, e.vec_id LIMIT 5),
            |rr5 AS (${duckAdcRerankTopK(5)}),
            |exact5 AS (SELECT vec_id FROM (${LlmData.duckExactTopK(5)})),
            |r AS (
            |  SELECT 'pq_rerank_full_retrain' AS method, 5 AS k,
            |         count(*) AS hits
            |  FROM rr5 JOIN exact5 USING (vec_id)
            |  UNION ALL
            |  SELECT 'pq_rerank_incremental' AS method, 5 AS k,
            |         count(*) AS hits
            |  FROM hrr JOIN exact5 USING (vec_id))
            |SELECT method, k, hits,
            |  ${duckRound("hits * 1.0 / 5.0", 6)} AS recall
            |FROM r ORDER BY method""".stripMargin),
    "incremental PQ maintenance: new batch encoded against the frozen codebook and appended to the bucketed code table; two-stage recall drift vs full retrain")

  val queries: Map[String, Q] = Map(
    "x63_token_diversity" -> x63,
    "x64_weighted_sample" -> x64,
    "x65_pq_codes" -> x65,
    "x66_rarity_score" -> x66,
    "x67_ann_adc" -> x67,
    "x69_symdel_fuzzy" -> x69,
    "x70_pq_distortion" -> x70,
    "x72_ann_adc_indexed" -> x72,
    "x73_ann_adc_rerank" -> x73,
    "x75_ann_adc_append" -> x75)
}
