package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-data pipelines (SURVEY.md §2.C).
  *
  * Everything here is composed from `org.apache.spark.sql.functions`
  * higher-order functions — no Scala UDFs — so the whole family stays
  * inside whole-stage codegen and runs as narrow per-row maps (zero
  * shuffle at any scale).
  */
object TextFunctions {

  /** Whitespace tokenization (lowercase input assumed; callers can
    * `lower()` first).
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of tokens contained in `markers`. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*)))

  /** Language-marker stopword sets: tiny, deterministic, and
    * reproducible in ANSI SQL for the oracle.
    */
  val enMarkers = Seq("the", "a", "is", "of", "and")
  val frMarkers = Seq("le", "la", "et", "les", "des")
  val esMarkers = Seq("el", "los", "y", "que", "de")
  val deMarkers = Seq("der", "die", "das", "und", "ist")

  /** Argmax language pick with a fixed tie-break order (en>fr>es>de) —
    * mirrored exactly in the DuckDB oracle.
    */
  def langId(sEn: Column, sFr: Column, sEs: Column, sDe: Column): Column =
    when(sEn >= sFr && sEn >= sEs && sEn >= sDe, "en")
      .when(sFr >= sEs && sFr >= sDe, "fr")
      .when(sEs >= sDe, "es")
      .otherwise("de")

  /** Position-weighted rolling-hash fingerprint:
    * sum_i( i * codepoint(text[i]) ), 1-based.
    *
    * Engine-independent (plain arithmetic — no murmur/xx dependence) so
    * the DuckDB oracle can reproduce it bit-for-bit. The per-position
    * `substring` is O(n²) per document; documents here are ≤1 KB. For
    * multi-MB documents switch the inner expression to
    * `split(text, '')` (O(n)) — semantics unchanged.
    */
  def fingerprint(text: Column): Column =
    // empty-text guard: sequence(1, 0) would produce the DESCENDING
    // [1, 0] (Spark's default step is -1), not an empty sequence
    when(length(text) === 0, lit(0L)).otherwise(
      aggregate(
        transform(sequence(lit(1), length(text)),
          i => i.cast("long") * ascii(text.substr(i, lit(1)))),
        lit(0L), (acc, x) => acc + x))

  /** Word n-grams (n >= 2) as space-joined strings; empty array when
    * the document has fewer than n tokens.
    *
    * Built by zipping n shifted `slice`s of the token array — NOT by
    * `element_at` over an index sequence, which re-evaluates the token
    * expression per element (O(tokens²) per row when `toks` is an
    * unmaterialized split).
    */
  def wordNgrams(toks: Column, n: Int): Column = {
    val m = size(toks) - lit(n - 1)
    val parts = (0 until n).map(o => slice(toks, lit(o + 1), m))
    val grams = parts.reduceLeft((acc, p) =>
      zip_with(acc, p, (a, b) => concat(a, lit(" "), b)))
    when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
  }
}
