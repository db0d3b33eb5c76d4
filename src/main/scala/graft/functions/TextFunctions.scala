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

  /** THE Gopher/C4-style quality-rule thresholds — one definition
    * shared by t7, p8's corpus-prep composition, and (via
    * interpolation) their oracle SQL, so tuning a rule can't silently
    * diverge the composed pipeline from the standalone filter.
    */
  val qualityMinTokens = 30
  val qualityMaxTokens = 10000
  val qualityMinMeanTokLen = 3
  val qualityMaxMeanTokLen = 10
  val qualityMinStopwords = 2

  /** First failing quality rule, or null when the doc keeps — exact
    * integer arithmetic throughout (`sumLen` = non-whitespace char
    * count = Σ token lengths).
    */
  def qualityReason(nToks: Column, sumLen: Column, nStop: Column): Column =
    when(nToks < qualityMinTokens, "too_short")
      .when(nToks > qualityMaxTokens, "too_long")
      .when(sumLen < nToks * qualityMinMeanTokLen, "short_words")
      .when(sumLen > nToks * qualityMaxMeanTokLen, "long_words")
      .when(nStop < qualityMinStopwords, "low_stopword")
      .otherwise(lit(null).cast("string"))

  /** Language-marker stopword sets: tiny, deterministic, and
    * reproducible in ANSI SQL for the oracle.
    */
  val enMarkers = Seq("the", "a", "is", "of", "and")
  val frMarkers = Seq("le", "la", "et", "les", "des")
  val esMarkers = Seq("el", "los", "y", "que", "de")
  val deMarkers = Seq("der", "die", "das", "und", "ist")

  /** Composite quality score in exact integer parts-per-million —
    * shared by t3_quality_score and d10_canonical_docs. Expects
    * `n_stop` / `n_long` / `n_toks` columns in scope. Computed in
    * 64-bit: `size()` yields INT and `300000 * n_stop` wraps past
    * ~7158 matching tokens in 32-bit arithmetic (a ~70k-token web doc
    * is routine at corpus scale), while the DuckDB oracle's `len()` is
    * already BIGINT — the casts keep both engines exact and identical.
    */
  val qualityPpm: Column =
    expr("(300000 * CAST(n_stop AS BIGINT)) div n_toks" +
      " + (300000 * CAST(n_long AS BIGINT)) div n_toks" +
      " + 4000 * CAST(least(n_toks, 100) AS BIGINT)")

  /** Argmax language pick with a fixed tie-break order (en>fr>es>de) —
    * mirrored exactly in the DuckDB oracle.
    */
  def langId(sEn: Column, sFr: Column, sEs: Column, sDe: Column): Column =
    when(sEn >= sFr && sEn >= sEs && sEn >= sDe, "en")
      .when(sFr >= sEs && sFr >= sDe, "fr")
      .when(sEs >= sDe, "es")
      .otherwise("de")

  /** Position-weighted rolling-hash fingerprint:
    * sum_i( i * codepoint(text[i]) ), 1-based; 0 for empty text.
    *
    * Engine-independent (plain arithmetic — no murmur/xx dependence) so
    * the DuckDB oracle can reproduce it bit-for-bit. Native codegen'd
    * expression ([[Fingerprint64Expr]]) — a single O(n) codepoint walk
    * per document; the previous HOF form ran an interpreted O(n²)
    * per-position `substr` loop (82× the oracle at sf0.1).
    */
  def fingerprint(text: Column): Column = NativeTextExpressions.fingerprint64(text)

  /** Word n-grams (n >= 2) as space-joined strings; empty array when
    * the document has fewer than n tokens. Native codegen'd expression
    * ([[WordNgramsExpr]]): one token-array pass per row, no interpreted
    * lambdas.
    */
  def wordNgrams(toks: Column, n: Int): Column =
    NativeTextExpressions.wordNgramsNative(toks, n)

  /** Render a string list as a SQL IN-list — shared by the oracle
    * builders (TextQueries, DedupQueries, Packing) so the marker-list
    * quoting exists exactly once.
    */
  def sqlInList(s: Seq[String]): String =
    s.map(x => s"'$x'").mkString("(", ", ", ")")

  /** The t3 integer quality composite as DuckDB SQL over a `toks`
    * list column — the oracle-side twin of [[qualityPpm]]; one
    * definition so the Spark and SQL formulas cannot silently diverge.
    */
  def qualityPpmSql: String =
    s"""CAST((300000 * len(list_filter(toks, x -> x IN ${sqlInList(enMarkers)}))) // len(toks)
                + (300000 * len(list_filter(toks, x -> length(x) > 5))) // len(toks)
                + 4000 * LEAST(len(toks), 100) AS BIGINT)"""

  /** Highest frequency of any word n-gram in the token array (0 when
    * fewer than n tokens): the mode count read off the longest run in
    * the SORTED n-gram array via an aggregate fold — a narrow per-row
    * expression, so per-document repetition stats never shuffle.
    */
  def topNgramFreq(toks: Column, n: Int): Column =
    aggregate(
      sort_array(wordNgrams(toks, n)),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** BPE-ish subword-count estimate: sum over tokens of ceil(len/4)
    * (~4-chars-per-BPE-token rule). Native ([[SubwordEstExpr]]).
    */
  def subwordEstimate(toks: Column): Column =
    NativeTextExpressions.subwordEstimate(toks)
}
