package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis / dedup building blocks for the LLM-data-pipeline
  * operators (SURVEY.md §2.11). Everything here is built from codegen'd
  * builtin + higher-order functions — no UDFs — so per-document feature
  * extraction stays map-side (zero shuffle) and inside whole-stage
  * codegen. That is the property that makes these viable at 100 TB:
  * signatures/fingerprints are computed in the scan stage, and only the
  * (tiny) signatures ever shuffle.
  *
  * Two hash families:
  *   - xxhash64-based (fast path): cheapest per-row hashing Spark has;
  *     not reproducible outside Spark, so exercised by unit tests.
  *   - md5-based (portable path): bit-identical in any engine with md5
  *     (DuckDB included), so the LSH pipeline over them is fully
  *     oracle-checkable. ~3× the hash cost; same plan shape.
  *
  * Fixed-width constructions (bands, 16-bit chunks, 64 bit positions)
  * are generated with Scala-side Int loops into `array(...)` columns:
  * the widths are compile-time constants, and Int-indexed builtins
  * (`slice`, `shiftright`) stay on their codegen'd literal overloads.
  */
object Text {

  /** Whitespace tokenization (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Gopher-style composite rule gate over a staged token column —
    * the ONE definition shared by the batch query (x52) and the
    * streaming quality monitor, so the two surfaces can never drift.
    * Returns a struct (n_words, mean_wlen, n_stop, rep_frac, keep);
    * thresholds compare the ROUNDED ratios so every engine replaying
    * the rules gates on identical values. The token-mode pass is
    * O(distinct × len) per document — bounded by document length. */
  def gopherGate(tk: Column): Column = {
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "on")
    val nW = size(tk).cast("long")
    val sumLen = aggregate(transform(tk, t => length(t).cast("long")),
      lit(0L), (a, x) => a + x)
    val mean = Rounding.pround(sumLen.cast("double") / nW, 6)
    val nStop = size(filter(tk, t => t.isin(stops: _*))).cast("long")
    // top-token count via the graft_token_stats kernel: one O(len)
    // hash-map pass — the declarative array_distinct+filter form is
    // O(distinct × len) interpreted PER ROW (quadratic in document
    // length; the same hazard x63 moved off of). Exact integer either
    // way, so batch (x52), streaming monitor, and oracle stay equal;
    // CurationSpec pins kernel ≡ HOF on the real corpus.
    val rep = Rounding.pround(
      call_function("graft_token_stats", tk).getField("max_c")
        .cast("double") / nW, 6)
    struct(
      nW.as("n_words"), mean.as("mean_wlen"), nStop.as("n_stop"),
      rep.as("rep_frac"),
      (nW.between(20, 400) && mean >= 3.0 && mean <= 10.0 &&
        nStop >= 2 && rep <= 0.2).as("keep"))
  }

  /** Distinct n-token shingles, mirroring DuckDB
    * `range(1, len(w)-(n-2))` semantics: docs with < n tokens yield an
    * empty set. Token vocabulary is tiny, so 1-token sets don't
    * discriminate — shingles are the dedup feature everywhere below.
    *
    * PERF: pass a *materialized token column attribute* (e.g. staged
    * via `.withColumn("tk", Text.tokens(...))`), never an inline
    * `tokens(...)` expression: `toks` is referenced inside the
    * per-element lambda, and Spark evaluates outer expressions
    * embedded in higher-order-function lambdas once per element — an
    * inlined split() would re-tokenize the document for every shingle
    * position. (A multi-referenced alias is not collapsed into the
    * consumer, so the attribute is computed once per row.)
    */
  def shingles(toks: Column, n: Int = 3): Column = {
    val idx = sequence(lit(1), size(toks) - (n - 1))
    val mk = transform(idx, i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))
    when(size(toks) >= n, array_distinct(mk))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature (fast path): H independent hash slots; slot i is
    * min over shingles of xxhash64(shingle, i). Computed per row with
    * nested higher-order functions — no explode, no shuffle. Empty
    * shingle sets yield a NULL signature (not an all-null array): short
    * docs must drop out of banding instead of all colliding into one
    * quadratic candidate bucket.
    */
  def minhashSignature(sh: Column, numHashes: Int = 32): Column =
    when(size(sh) > 0,
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(sh, s => xxhash64(s, i)))))
      .otherwise(lit(null).cast("array<bigint>"))

  /** LSH band keys over a minhash signature: `bands` keys, each hashing
    * `rows = numHashes/bands` consecutive slots. Equal band key ⇒
    * candidate near-dup pair. Band count is a constant, so the keys are
    * a Scala-built `array(...)` of Int-sliced hashes.
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    // propagate NULL signatures: hashing a null slice yields a CONSTANT
    // (xxhash64 seed), which would band every short doc into one
    // quadratic candidate bucket — the exact blowup the null contract
    // exists to prevent
    when(sig.isNotNull,
      array((0 until bands).map(b => xxhash64(slice(sig, b * rows + 1, rows))): _*))
      .otherwise(lit(null).cast("array<bigint>"))

  /** Modulus for the portable affine MinHash family: 2^31 - 1. Affine
    * products stay under 2^62, so the math never overflows a signed
    * 64-bit value — ANSI-mode-safe in Spark and identical in DuckDB
    * BIGINT arithmetic. */
  val MinhashMod: Long = 2147483647L

  /** Per-slot affine multipliers/offsets (Scala-side constants, shared
    * with the oracle-SQL builder so both engines use literally the
    * same hash family). */
  def affineA(i: Int): Long = {
    val a = (1103515245L * (i + 1)) % MinhashMod
    if (a == 0L) 1L else a
  }
  def affineB(i: Int): Long = (12345L * i + 6789L) % MinhashMod

  /** Portable per-shingle base hash: first 15 hex chars of md5 parsed
    * as a long, reduced mod 2^31-1. One md5 per shingle — the slots
    * below derive from this via cheap affine rehashes (the classic
    * one-hash-k-permutations MinHash; 16× less hashing than
    * hash-per-slot at identical statistical behavior).
    * DuckDB twin: `CAST('0x'||substr(md5(s),1,15) AS BIGINT) % M`.
    */
  def tokenHashesPortable(sh: Column): Column =
    transform(sh, s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long") % MinhashMod)

  /** MinHash signature from precomputed base hashes: slot i = min over
    * (h * A_i + B_i) mod M. Pass a *materialized* (cached) hash column
    * so the md5 pass runs once, not once per slot.
    *
    * Loop-shaped on purpose: slots come from a `transform` over a
    * slot-index sequence with the affine constants in array literals
    * (constant-folded to static arrays), so codegen emits ONE loop
    * body instead of `numHashes` unrolled min-fold subtrees — Janino
    * compile time is the dominant cold cost of the LSH queries. */
  def minhashFromHashes(hs: Column, numHashes: Int): Column = {
    val as = array((0 until numHashes).map(i => lit(affineA(i))): _*)
    val bs = array((0 until numHashes).map(i => lit(affineB(i))): _*)
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(hs, h =>
        (h * element_at(as, i + 1) + element_at(bs, i + 1)) % MinhashMod)))
  }

  /** Portable band keys: md5 over the comma-joined band slice (longs
    * render identically via concat_ws / array_to_string). NULL
    * signatures propagate (see bandKeys). */
  def bandKeysMd5(sig: Column, bands: Int, rows: Int): Column =
    when(sig.isNotNull,
      array((0 until bands).map(b =>
        md5(concat_ws(",", slice(sig, b * rows + 1, rows)))): _*))
      .otherwise(lit(null).cast("array<string>"))

  /** SimHash kernel: per feature hash, bit votes +1/-1; the sign of
    * each accumulated vote becomes the bit. One sequential fold
    * producing an n-slot vote array, then a weighted-OR fold packs the
    * sign bits — the vote array is referenced exactly once (no
    * expression-tree blowup).
    *
    * Loop-shaped: the bit test is `h & weight_j != 0` with the bit
    * weights in a constant-folded array literal, zipped against the
    * vote accumulator — one codegen loop body rather than `bits`
    * unrolled shift terms (cold Janino time, not row throughput, is
    * what the unrolled form costs).
    */
  private def simhashOf(hashes: Column, bits: Int): Column = {
    val weights = array((0 until bits).map(j => lit(1L << j)): _*)
    val votes = aggregate(hashes, array_repeat(lit(0L), bits),
      (acc, h) => zip_with(acc, weights,
        (a, w) => a + when(h.bitwiseAND(w) =!= 0L, lit(1L)).otherwise(lit(-1L))))
    aggregate(
      zip_with(votes, weights, (v, w) => when(v >= 0L, w).otherwise(lit(0L))),
      lit(0L), (x, y) => x.bitwiseOR(y))
  }

  /** 64-bit SimHash over a feature array (fast path, xxhash64). */
  def simhash64(features: Column): Column =
    simhashOf(transform(features, t => xxhash64(t)), 64)

  /** 60-bit SimHash (portable path): feature hash = first 15 hex chars
    * of md5 parsed as a long (fits a signed 64-bit value, so DuckDB's
    * `CAST('0x'||substr(md5(s),1,15) AS BIGINT)` produces the identical
    * integer and the whole fingerprint is oracle-checkable).
    */
  def simhash60(features: Column): Column =
    simhashOf(
      transform(features, t => conv(substring(md5(t), 1, 15), 16, 10).cast("long")),
      60)

  /** SimHash blocking: split the fingerprint into `chunks` pieces of
    * `chunkBits` bits; pairs within hamming distance d < chunks must
    * share at least one (position, chunk-value) pair (pigeonhole), so
    * an equal-chunk join finds all candidates without a quadratic
    * comparison.
    */
  def simhashChunks(fp: Column, chunks: Int = 4, chunkBits: Int = 16): Column =
    array((0 until chunks).map(j =>
      shiftright(fp, j * chunkBits).bitwiseAND(lit((1L << chunkBits) - 1))): _*)

  /** Hamming distance between two fingerprints over the low `bits`
    * bits: popcount of the masked XOR (builtin bit_count — one codegen
    * intrinsic instead of a `bits`-term shift/add chain). Result is a
    * long for stable output typing across engines. */
  def hamming(a: Column, b: Column, bits: Int): Column = {
    val x = a.bitwiseXOR(b)
    val masked = if (bits >= 64) x else x.bitwiseAND(lit((1L << bits) - 1))
    bit_count(masked).cast("long")
  }

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * shingle set (bag-of-shingles identity; survives token reordering
    * of whole shingle blocks). Portable: DuckDB computes the identical
    * digest from the identical canonical string.
    */
  def contentFingerprint(sh: Column): Column =
    md5(concat_ws("|", array_sort(sh)))

  /** Rotate-XOR rolling hash over the token stream (order-sensitive
    * document identity): acc' = rotl(acc, 5) XOR xxhash64(token).
    * Pure bitwise ops — no overflow under ANSI mode, deterministic
    * across runs. Fast path (xxhash64 has no portable twin); the
    * oracle-checked variant is rollingHashPortable.
    */
  def rollingHash(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) =>
      shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59)).bitwiseXOR(xxhash64(t)))

  /** Modulus for the portable rolling hash: 2^40. Keeps every
    * intermediate `acc*31 + h` under 2^45 — overflow-free in Spark
    * ANSI mode and in DuckDB BIGINT arithmetic. */
  val RollingMod: Long = 1L << 40

  /** Portable order-sensitive rolling fingerprint: the classic
    * polynomial hash `acc' = (acc*31 + h) mod 2^40` over per-token md5
    * hashes. A sequential left fold, so the DuckDB twin is
    * `list_reduce(list_prepend(0, hashes), (acc,h) -> (acc*31+h) % m)`
    * — bit-identical on both engines.
    */
  def rollingHashPortable(toks: Column): Column =
    aggregate(
      transform(toks, t =>
        conv(substring(md5(t), 1, 15), 16, 10).cast("long") % RollingMod),
      lit(0L), (acc, h) => (acc * 31 + h) % RollingMod)

  /** Non-overlapping left-to-right count of the adjacent pair (a, b) in
    * a token array — one BPE merge application ("x x x" with pair
    * (x, x) merges ONCE: the middle token is consumed by the first
    * merge). Sequential by nature, so it runs as a per-row left fold
    * over an encoded-state BIGINT `acc = 2·count + lastStepMerged`
    * (the rollingHashPortable parity class: DuckDB's seeded list_reduce
    * replays it bit-identically — see x61's oracle). Total on any
    * input: arrays shorter than 2 yield 0. */
  def pairMergeCount(tk: Column, a: Column, b: Column): Column = {
    val enc = aggregate(
      sequence(lit(1), size(tk) - 1),
      lit(0L),
      (acc, i) => when(acc % 2 === 0 &&
          element_at(tk, i) === a && element_at(tk, i + 1) === b,
        acc + 3).otherwise(acc - acc % 2))
    // sequence(1, size-1) DESCENDS for size < 2 — guard, don't fold
    when(size(tk) >= 2, shiftright(enc, 1)).otherwise(lit(0L))
  }

  // ── native kernel fast paths (registered by GraftExtensions) ───────
  // Same values as the HOF formulations above (NativeKernelSpec
  // cross-checks), but evaluated as one generated loop per row instead
  // of interpreted lambda dispatch per element — the difference is the
  // dominant cost of the dedup queries at bench scale.

  /** Native twin of shingles(toks, n). */
  def shinglesNative(toks: Column, n: Int = 3): Column =
    call_function("graft_shingles", toks, lit(n))

  /** 0-based gram-start offsets whose w-gram already occurred earlier
    * in the same token array (plans.IntraDupStarts) — the array-local
    * twin of the positionalGrams + (doc_id, g) first-occurrence
    * window, pinned equivalent by ScrubKernelSpec. */
  def intraDupStartsNative(toks: Column, w: Int): Column =
    call_function("graft_intradup_starts", toks, lit(w))

  /** Native twin of tokenHashesPortable (mod > 0) or of the raw
    * 60-bit md5 feature hash (mod = 0, simhash60's input). */
  def md5LongsNative(sh: Column, mod: Long): Column =
    call_function("graft_md5_longs", sh, lit(mod))

  /** Native twin of the positional-gram fingerprint projection
    * `transform(sequence(1, size(tk)-n+1), i -> md5(concat_ws(' ', slice(tk, i, n))))`
    * — byte-equal md5-hex strings, one generated loop per row
    * (plans.GramMd5Hex; callers must filter size(tk) >= n first). */
  def gramMd5Native(toks: Column, n: Int): Column =
    call_function("graft_gram_md5", toks, lit(n))

  /** Native twin of the positional-gram projection
    * `transform(sequence(1, size(tk)-n+1), i -> concat_ws(' ', <n terms>))`
    * — ALL sliding n-token windows in position order, no dedup
    * (plans.GramArray; callers must filter size(tk) >= n first).
    * posexplode over it yields the same (off, gram) rows as the HOF. */
  def gramsNative(toks: Column, n: Int): Column =
    call_function("graft_grams", toks, lit(n))

  /** Native twin of minhashFromHashes. */
  def minhashNative(hs: Column, numHashes: Int): Column =
    call_function("graft_minhash", hs, lit(numHashes))

  /** Native twin of simhashOf over precomputed feature hashes;
    * simhash60 == simhashNative(md5LongsNative(sh, 0), 60). */
  def simhashNative(hs: Column, bits: Int): Column =
    call_function("graft_simhash", hs, lit(bits))
}
