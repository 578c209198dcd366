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
  */
object Text {

  /** Whitespace tokenization (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct n-token shingles, mirroring DuckDB
    * `range(1, len(w)-(n-2))` semantics: docs with < n tokens yield an
    * empty set. Tokens vocabulary is tiny, so 1-token sets don't
    * discriminate — shingles are the dedup feature everywhere below.
    */
  def shingles(toks: Column, n: Int = 3): Column = {
    val idx = sequence(lit(1), size(toks) - (n - 1))
    val mk = transform(idx, i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))
    when(size(toks) >= n, array_distinct(mk))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: H independent hash slots; slot i is
    * min over shingles of xxhash64(shingle, i). Computed per row with
    * nested higher-order functions — no explode, no shuffle.
    */
  def minhashSignature(sh: Column, numHashes: Int = 32): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => xxhash64(s, i))))

  /** LSH band keys over a minhash signature: `bands` keys, each hashing
    * `rows = numHashes/bands` consecutive slots. Equal band key ⇒
    * candidate near-dup pair.
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(sig, b * rows + 1, rows)))

  /** 64-bit SimHash over a feature array (shingles): per feature,
    * xxhash64 bit votes +1/-1; sign of each vote becomes the bit.
    * Pure expression fold — map-side only.
    */
  def simhash64(features: Column): Column = {
    val c = features.expr.sql
    expr(s"""
      aggregate(
        transform($c, t -> xxhash64(t)),
        array_repeat(0L, 64),
        (acc, h) -> zip_with(acc, sequence(0L, 63L),
          (a, b) -> a + IF(((shiftright(h, cast(b AS int))) & 1L) = 1L, 1L, -1L)),
        acc -> aggregate(
          zip_with(acc, sequence(0L, 63L),
            (v, b) -> IF(v >= 0L, shiftleft(1L, cast(b AS int)), 0L)),
          0L, (x, y) -> x | y))""")
  }

  /** SimHash blocking: split the 64-bit fingerprint into `chunks`
    * 16-bit pieces; pairs within hamming distance d < chunks must share
    * at least one chunk (pigeonhole), so equal-chunk join finds all
    * candidates without a quadratic comparison.
    */
  def simhashChunks(fp: Column, chunks: Int = 4): Column =
    transform(sequence(lit(0), lit(chunks - 1)),
      j => shiftright(fp, j.cast("int") * 16).bitwiseAND(lit(65535L)))

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * shingle set (bag-of-shingles identity; survives token reordering
    * of whole shingle blocks). Portable: DuckDB computes the identical
    * digest from the identical canonical string.
    */
  def contentFingerprint(sh: Column): Column =
    md5(concat_ws("|", array_sort(sh)))

  /** Polynomial rolling hash over the token stream (order-sensitive
    * document identity; base 1000003 mod 2^61-1 via Long arithmetic).
    * Expression-only fold, used by the library API; not oracle-checked
    * (DuckDB lacks matching 64-bit modular arithmetic builtins).
    */
  def rollingHash(toks: Column): Column = {
    val c = toks.expr.sql
    // acc' = (acc * B + xxhash64(token)) with wrapping Long arithmetic:
    // deterministic and stable across engines/runs of this library.
    expr(s"aggregate($c, 0L, (acc, t) -> acc * 1000003L + xxhash64(t))")
  }
}
