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

  /** Distinct n-token shingles, mirroring DuckDB
    * `range(1, len(w)-(n-2))` semantics: docs with < n tokens yield an
    * empty set. Token vocabulary is tiny, so 1-token sets don't
    * discriminate — shingles are the dedup feature everywhere below.
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
    array((0 until bands).map(b => xxhash64(slice(sig, b * rows + 1, rows))): _*)

  /** MinHash signature (portable path): slot i = lexicographic min over
    * shingles of md5(shingle || ":" || i). Engine-independent: DuckDB's
    * `list_min(list_transform(sh, s -> md5(s||':'||i)))` produces the
    * identical hex strings, making LSH candidate sets oracle-checkable.
    */
  def minhashSignatureMd5(sh: Column, numHashes: Int): Column =
    when(size(sh) > 0,
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(sh, s => md5(concat(s, lit(":"), i.cast("string")))))))
      .otherwise(lit(null).cast("array<string>"))

  /** Portable band keys: md5 over the comma-joined band slice. */
  def bandKeysMd5(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map(b =>
      md5(concat_ws(",", slice(sig, b * rows + 1, rows)))): _*)

  /** Bits 0..63 of a long hash as an array<long> of 0/1 (Int-indexed
    * shiftright — stays on the literal overload, fully codegen'd). */
  private def bitsOf(h: Column): Column =
    array((0 until 64).map(j => shiftright(h, j).bitwiseAND(lit(1L))): _*)

  /** 64-bit SimHash over a feature array (shingles): per feature,
    * xxhash64 bit votes +1/-1; the sign of each accumulated vote
    * becomes the bit. One sequential fold producing a 64-slot vote
    * array, then a weighted-OR fold packs the sign bits — the vote
    * array is referenced exactly once (no expression-tree blowup).
    */
  def simhash64(features: Column): Column = {
    val hashes = transform(features, t => xxhash64(t))
    val votes = aggregate(hashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, bitsOf(h),
        (a, b) => a + when(b === 1L, lit(1L)).otherwise(lit(-1L))))
    val weights = array((0 until 64).map(j => lit(1L << j)): _*)
    aggregate(
      zip_with(votes, weights, (v, w) => when(v >= 0L, w).otherwise(lit(0L))),
      lit(0L), (x, y) => x.bitwiseOR(y))
  }

  /** SimHash blocking: split the 64-bit fingerprint into `chunks`
    * 16-bit pieces; pairs within hamming distance d < chunks must share
    * at least one chunk (pigeonhole), so an equal-chunk join finds all
    * candidates without a quadratic comparison.
    */
  def simhashChunks(fp: Column, chunks: Int = 4): Column =
    array((0 until chunks).map(j =>
      shiftright(fp, j * 16).bitwiseAND(lit(65535L))): _*)

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * shingle set (bag-of-shingles identity; survives token reordering
    * of whole shingle blocks). Portable: DuckDB computes the identical
    * digest from the identical canonical string.
    */
  def contentFingerprint(sh: Column): Column =
    md5(concat_ws("|", array_sort(sh)))

  /** Polynomial rolling hash over the token stream (order-sensitive
    * document identity; base 1000003 with wrapping 64-bit Long
    * arithmetic, i.e. mod 2^64). Deterministic and stable across runs
    * of this library; not oracle-checked (DuckDB BIGINT overflow
    * raises instead of wrapping).
    */
  def rollingHash(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc * lit(1000003L) + xxhash64(t))
}
