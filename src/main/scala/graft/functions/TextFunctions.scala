package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline operators
  * (SURVEY.md §2 group D): tokenization, deterministic token hashing,
  * fingerprints. All built-in expressions — codegen-friendly, no UDFs —
  * and every hash is definable identically in ANSI-ish SQL so results can
  * be oracle-checked cross-engine.
  */
object TextFunctions {

  /** Whitespace tokenization (the documents table is single-space
    * separated; `split` is a regex split in Spark).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Deterministic 16-bit token hash: first 4 hex chars of md5, parsed
    * base-16. Engine-portable (DuckDB: strpos-arithmetic over the same
    * md5 hex), unlike Spark's `hash()` (Murmur3 with Spark-specific seed).
    */
  def tokenHash16(tok: Column): Column =
    conv(substring(md5(tok), 1, 4), 16, 10).cast("long")

  /** Polynomial rolling-hash fingerprint of the token stream:
    * `acc := (acc * 131 + tokenHash16(t)) mod (2^31 - 1)`, folded in token
    * order. Order-sensitive by design — a document fingerprint, not a bag
    * hash. Intermediate values stay ≤ 2^31·131 + 2^16, far inside int64.
    * Native [[PolyFingerprint]] expression (one generated loop, one
    * digest call per token) — the `aggregate` HOF form it replaced
    * interprets its lambda per element; [[fingerprintHof]] keeps that
    * form for the equivalence spec.
    */
  def fingerprint(text: Column): Column =
    call_function("graft_fingerprint", tokens(text))

  /** The pre-r7 HOF formulation of [[fingerprint]], retained as the
    * independent model the native expression is asserted against
    * (TextVectorSpec) — same role as the HOF fallbacks in
    * [[VectorFunctions]].
    */
  def fingerprintHof(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => (acc * 131L + tokenHash16(t)) % 2147483647L)

  /** ASCII canonicalization (strip non-[a-z0-9 ] → collapse space runs →
    * trim), as the native [[AsciiSanitize]] one-pass byte loop. The
    * regex composition it replaced ([[sanitizeRegex]]) pays the JDK's
    * ~60 ns/char char-class scan — 28 s/pass over the sf10 corpus vs
    * sub-second for the byte loop (see the expression's Scaladoc for the
    * full equivalence argument; TextVectorSpec pins bit-identity).
    */
  def sanitize(text: Column): Column =
    call_function("graft_sanitize", text)

  /** The regex formulation of [[sanitize]], retained as the independent
    * model the native expression is asserted against (TextVectorSpec) —
    * and the form the DuckDB oracles keep using, so every oracled query
    * through [[sanitize]] is itself a cross-engine equivalence check.
    */
  def sanitizeRegex(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, lit("[^a-z0-9 ]"), lit("")),
      lit(" +"), lit(" ")))

  /** Distinct-overlap COUNT of two sorted `array<bigint>` sketch columns
    * — the verify-stage replacement for `size(array_intersect(a, b))` on
    * `sort_array(collect_set(...))` sketches, as the native
    * [[SortedIntersectCount]] two-pointer merge (no per-row hash set, no
    * materialized intersection array; see the expression's Scaladoc for
    * the exact-equivalence argument, PropertySpec for the cross-check).
    * ONLY for sorted inputs — an unsorted array undercounts.
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect_count", a, b)

  /** Hex digit at 1-based position `pos` (column) of md5(tok), as 0-15. */
  def md5HexDigit(tok: Column, pos: Column): Column =
    conv(md5(tok).substr(pos, lit(1)), 16, 10).cast("long")
}
