package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operator family (SURVEY.md §2.C) over the documents
  * table. Pure narrow per-row transforms — no shuffle except the final
  * aggregations — with exact DuckDB oracles (arithmetic-only hashing).
  */
/** Scrub patterns shared between the Spark query and the generated
  * oracle SQL — one definition, both engines. All patterns are in the
  * RE2-compatible subset of Java regex (no backrefs/lookaround), so
  * Spark (java.util.regex) and DuckDB (RE2) match identically.
  */
object PiiPatterns {
  /** (pattern, replacement), applied in this order. */
  val ordered: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "\\b[0-9]{6,}\\b" -> "<ID>",
    "\\b(customer|vector|stream)\\b" -> "<TERM>")
  /** (output column, pattern) counted against the original text. */
  val counted: Seq[(String, String)] =
    Seq("n_email", "n_url", "n_id_number", "n_denylist").zip(ordered.map(_._1))
}

object TextQueries {

  private def inList(s: Seq[String]) = graft.functions.TextFunctions.sqlInList(s)

  /** PII / denylist scrub over a documents frame — see the t10 entry. */
  def piiScrub(docs: DataFrame): DataFrame = {
    val scrubbed = PiiPatterns.ordered.foldLeft(col("text")) {
      case (c, (pat, repl)) => regexp_replace(c, lit(pat), lit(repl))
    }
    docs.select(
      (Seq(col("doc_id")) ++
        PiiPatterns.counted.map { case (name, pat) =>
          regexp_count(col("text"), lit(pat)).cast("long").as(name)
        } ++ Seq(
          fingerprint(scrubbed).as("scrubbed_fingerprint"),
          length(scrubbed).cast("long").as("scrubbed_len"))): _*)
  }

  /** The scrubbed text itself (for specs / downstream pipelines; the
    * registry entry ships the fingerprint instead of the payload). */
  def scrubText(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    PiiPatterns.ordered.foldLeft(text) {
      case (c, (pat, repl)) => regexp_replace(c, lit(pat), lit(repl))
    }

  /** Per-doc top-k TF-IDF terms — see the t11 entry.
    *
    * Ranked with the bounded-heap
    * [[graft.functions.TopKRowsByScore]] on (round(score, 9) desc,
    * term asc) — the same stabilized rank key the old `row_number`
    * window used, but partial buffers keep at most k rows map-side
    * instead of shuffling and sorting every (doc, term) pair per doc.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import graft.functions.TopKAggregate.topkRows
    val tf = docs
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
      .groupBy("doc_id")
      .agg(topkRows(round(col("score"), 9), col("term"),
        struct(col("term"), col("tf"), col("df"), col("score")), k).as("tk"))
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("doc_id"), col("t.term").as("term"), col("t.tf").as("tf"),
        col("t.df").as("df"), round(col("t.score"), 6).as("tfidf"),
        (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Per-doc bigram-LM score — mean -ln p(w2|w1) with add-one
    * smoothing, p = (c(w1 w2) + 1) / (c(w1) + |V|). The t13 scoring
    * engine, shared with t14's perplexity filter. Corpus bigram /
    * unigram counts are gram-keyed aggregates; the unigram count and
    * vocab size fold into the DICTIONARY-sized bigram model so the
    * raw bigram stream pays exactly one model join. Docs with <2
    * tokens have no bigrams and drop out (wordNgrams convention).
    */
  def bigramNlp(docs: DataFrame): DataFrame = {
    val t = docs.withColumn("toks", tokens(lower(col("text"))))
    val uc = t.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val v = uc.agg(count(lit(1)).as("v"))
    val bi = t.select(col("doc_id"), explode(wordNgrams(col("toks"), 2)).as("bg"))
    val bc = bi.groupBy("bg").agg(count(lit(1)).as("bc"))
    val model = bc
      .withColumn("w", split(col("bg"), " ").getItem(0))
      .join(uc, "w")
      .crossJoin(broadcast(v))
      .select(col("bg"),
        (-log((col("bc") + 1).cast("double") /
          (col("wc") + col("v")).cast("double"))).as("nlp"))
    bi.join(model, "bg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("nlp")), 6).as("avg_neg_logprob"))
  }

  /** CCNet-style perplexity filter — see the t14 entry. Buckets are
    * z-score bands around the corpus mean: head (score below
    * mean − 0.25·stddev: most predictable under the corpus LM),
    * tail (above mean + 0.25·stddev), middle between. Thresholds are
    * derived from 6-dp-rounded stats so both engines compare
    * identical doubles.
    */
  def perplexityFilter(docs: DataFrame): DataFrame = {
    val scores = bigramNlp(docs)
    val stats = scores.agg(
      round(avg(col("avg_neg_logprob")), 6).as("__mu"),
      round(stddev_pop(col("avg_neg_logprob")), 6).as("__sigma"))
    scores.crossJoin(broadcast(stats))
      .withColumn("bucket",
        when(col("avg_neg_logprob") < col("__mu") - lit(0.25) * col("__sigma"),
          lit("head"))
          .when(col("avg_neg_logprob") > col("__mu") + lit(0.25) * col("__sigma"),
            lit("tail"))
          .otherwise(lit("middle")))
      .select(col("doc_id"), col("n_bigrams"), col("avg_neg_logprob"),
        col("bucket"), (col("bucket") =!= "tail").as("keep"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Token counting: whitespace tokenization + length stats.
    "t1_token_count" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", tokens(col("text")))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_tokens"),
          length(col("text")).as("len_chars"),
          round(length(regexp_replace(col("text"), "\\s", "")).cast("double") / size(col("toks")), 6)
            .as("avg_token_len"))
    }),

    // Stopword-marker language ID (deterministic heuristic with a
    // fixed tie-break; the `lang` column is the generator's label, the
    // heuristic output is what's being tested for engine parity).
    "t2_lang_id" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", tokens(lower(col("text"))))
        .withColumn("s_en", markerCount(col("toks"), enMarkers))
        .withColumn("s_fr", markerCount(col("toks"), frMarkers))
        .withColumn("s_es", markerCount(col("toks"), esMarkers))
        .withColumn("s_de", markerCount(col("toks"), deMarkers))
        .select(
          col("doc_id"), col("lang").as("label_lang"),
          langId(col("s_en"), col("s_fr"), col("s_es"), col("s_de")).as("predicted_lang"),
          col("s_en"), col("s_fr"), col("s_es"), col("s_de"))
    }),

    // Quality scoring: stopword ratio, length saturation, long-token
    // fraction → weighted score.
    "t3_quality_score" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", tokens(lower(col("text"))))
        .withColumn("n_toks", size(col("toks")))
        .withColumn("n_stop", markerCount(col("toks"), enMarkers))
        .withColumn("n_long", size(filter(col("toks"), t => length(t) > 5)))
        .select(
          col("doc_id"),
          round(col("n_stop").cast("double") / col("n_toks"), 6).as("stop_ratio"),
          round(col("n_long").cast("double") / col("n_toks"), 6).as("long_frac"),
          round(least(col("n_toks").cast("double") / 100.0, lit(1.0)), 6).as("len_score"),
          // exact integer composite (a float composite lands on
          // round-half boundaries and diverges across engines); 64-bit
          // per the shared definition
          qualityPpm.as("quality_ppm"))
    }),

    // Position-weighted rolling-hash fingerprint (engine-independent
    // arithmetic — reproduced exactly by the oracle).
    "t4_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), fingerprint(col("text")).as("fingerprint"),
          length(col("text")).cast("long").as("len"))
    }),

    // BPE-ish token estimation: whitespace tokens refined by a
    // subword-chunk heuristic (ceil(len/4) pieces per word — the
    // ~4-chars-per-BPE-token rule) plus regex chunk counts. All
    // integer/regex arithmetic → exact oracle.
    "t6_bpe_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", tokens(lower(col("text"))))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_ws_tokens"),
          subwordEstimate(col("toks")).as("n_subword_est"),
          expr("CAST(regexp_count(text, '[aeiou]+') AS BIGINT)").as("n_vowel_runs"),
          expr("CAST(regexp_count(text, '[bcdfghjklmnpqrstvwxyz]+') AS BIGINT)").as("n_consonant_runs"))
    }),

    // Gopher/C4-style quality FILTER with reasons: every rule in exact
    // integer arithmetic (token counts, 100×-scaled mean token length,
    // stopword count) so the keep/drop decision is bit-identical in
    // the oracle. First failing rule wins; `keep` ⇔ no rule failed.
    "t7_quality_filter" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", tokens(lower(col("text"))))
        .withColumn("n_toks", size(col("toks")))
        // Σ token lengths = non-whitespace char count (no per-token loop)
        .withColumn("sum_len", length(regexp_replace(col("text"), "\\s", "")))
        .withColumn("n_stop", markerCount(col("toks"), enMarkers))
        .withColumn("reason",
          qualityReason(col("n_toks"), col("sum_len"), col("n_stop")))
        .select(
          col("doc_id"),
          col("n_toks").as("n_tokens"),
          expr("CAST((100 * sum_len) div n_toks AS BIGINT)").as("mean_tok_len_x100"),
          col("n_stop").cast("long").as("n_stop"),
          col("reason").isNull.as("keep"),
          col("reason"))
    }),

    // Repetition / boilerplate signals (the Gopher repetition rules):
    // duplicate-word fraction, the most-repeated bigram's count, and
    // duplicate 5-gram fraction. The per-doc bigram histogram is an
    // explode + two-level aggregation — the shape that scales (the
    // array-local alternative would be an interpreted lambda).
    "t8_repetition" -> ((s, d) => {
      // fully NARROW: every measure — including the top-bigram
      // frequency — is a function of the row's own token array, so
      // nothing shuffles at any scale. The mode count reads off the
      // longest run in the row's SORTED bigram array (an aggregate
      // fold over prev/run/best), replacing the former
      // groupBy(doc, bigram) → groupBy(doc) → join-back pipeline
      // (two shuffles and a join for a per-row quantity).
      val base = Tables.documents(s, d)
        .withColumn("toks", tokens(lower(col("text"))))
        .withColumn("grams5", wordNgrams(col("toks"), 5))
        .select(col("doc_id"), col("toks"), col("grams5"))
      base
        // coalesce: a null text yields a null token array, but the
        // oracle's COALESCE(top_bigram_freq, 0) emits 0 for such docs
        .withColumn("top_bigram_freq",
          coalesce(topNgramFreq(col("toks"), 2), lit(0L)))
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(array_distinct(col("toks"))).cast("long").as("n_distinct_tokens"),
          round(lit(1.0) - size(array_distinct(col("toks"))).cast("double")
            / size(col("toks")), 6).as("dup_word_frac"),
          col("top_bigram_freq"),
          when(size(col("grams5")) > 0,
            round(lit(1.0) - size(array_distinct(col("grams5"))).cast("double")
              / size(col("grams5")), 6)).otherwise(0.0).as("dup_5gram_frac"))
    }),

    // Corpus-statistics quality scoring: per-doc mean negative
    // unigram log-probability against the corpus's own vocabulary —
    // the unigram proxy for LM-perplexity filtering (low = templated/
    // repetitive, high = rare-token soup). Scale shape: the vocab is
    // a (word → count) aggregate shuffled on the high-cardinality
    // word key; the per-doc score is one more word-keyed join + a
    // doc-keyed aggregate. Nothing driver-side, no broadcast of the
    // (potentially huge) vocab — only the 1-row total is broadcast.
    "t9_unigram_logprob" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(lower(col("text")))).as("w"))
      val vocab = t.groupBy("w").agg(count(lit(1)).as("wc"))
      val tot = vocab.agg(sum("wc").as("total"))
      t.join(vocab, "w")
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(-log(col("wc").cast("double") / col("total").cast("double"))), 6)
            .as("avg_neg_logprob"))
    }),

    // Bigram LM quality scoring — one step up from t9's unigram proxy:
    // per-doc mean -ln p(w2|w1) with add-one smoothing,
    // p = (c(w1 w2) + 1) / (c(w1) + |V|). Corpus bigram/unigram counts
    // are gram-keyed aggregates (d8's scale shape); only the 1-row
    // vocab size broadcasts. Docs with <2 tokens have no bigrams and
    // drop out (same convention as wordNgrams).
    "t13_bigram_logprob" -> ((s, d) => bigramNlp(Tables.documents(s, d))),

    // PERPLEXITY filtering (CCNet-style): every doc scored under the
    // corpus's own bigram LM (t13's engine), then bucketed head /
    // middle / tail by z-score bands around the corpus mean — the
    // classic "keep the head+middle, drop the tail" pretraining
    // selection step. Corpus stats are ONE 1-row aggregate broadcast
    // over the doc-grain scores; the label is a narrow map. Nothing
    // beyond t13's gram-keyed shuffles at any scale.
    "t14_perplexity_filter" -> ((s, d) =>
      perplexityFilter(Tables.documents(s, d))),

    // PII / denylist scrubbing — the redaction stage of a corpus
    // pipeline: emails, URLs and long digit runs are replaced with
    // typed placeholder tokens, a denylist of terms with a generic
    // one. Counts are measured on the ORIGINAL text; the scrubbed
    // string is verified via its rolling-hash fingerprint (full-string
    // parity without shipping the text through the compare). A pure
    // narrow per-row map — no shuffle, codegen'd regex.
    "t10_pii_scrub" -> ((s, d) => piiScrub(Tables.documents(s, d))),

    // Per-doc top TF-IDF terms — corpus keyword extraction. The
    // document-frequency table shuffles on the (high-cardinality) term
    // key and only the 1-row corpus size is broadcast; the per-doc
    // top-k window partitions on doc_id (cardinality = corpus size, so
    // the sort is per-doc-local at any scale). Rank key is the score
    // rounded to 9 dp (FP association margin) with the term as total
    // tie-break — deterministic across engines.
    "t11_tfidf" -> ((s, d) => tfidfTopTerms(Tables.documents(s, d))),

    // Document CHUNKING: overlapping fixed-size token windows (64
    // tokens, stride 48 → 16-token overlap) — the text → context-window
    // segmentation step of a RAG / pretraining pipeline. Pure per-row
    // narrow map (sequence + explode + slice), no shuffle at any scale;
    // chunk identity is (doc, start), and the chunk text is carried as
    // its rolling-hash fingerprint so the oracle verifies CONTENT, not
    // just boundaries, without hashing megabytes of strings in the
    // comparator.
    "t12_doc_chunks" -> ((s, d) => {
      val size64 = 64; val stride = 48
      Tables.documents(s, d)
        .withColumn("toks", tokens(lower(col("text"))))
        .withColumn("n_toks", size(col("toks")))
        .select(col("doc_id"), col("toks"), col("n_toks"),
          explode(sequence(lit(1), greatest(col("n_toks"), lit(1)),
            lit(stride))).as("start_tok"))
        .select(
          col("doc_id"),
          ((col("start_tok") - 1) / stride).cast("long").as("chunk_idx"),
          col("start_tok").cast("long").as("start_tok"),
          least(lit(size64), col("n_toks") - col("start_tok") + 1)
            .cast("long").as("chunk_toks"),
          fingerprint(array_join(
            slice(col("toks"), col("start_tok"), lit(size64)), " ")).as("chunk_fp"))
    }),

    // Top word-bigrams by frequency (global n-gram statistics).
    "t5_ngram_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .select(tokens(lower(col("text"))).as("toks"))
        .select(explode(wordNgrams(col("toks"), 2)).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("bigram").asc)
        .limit(20)
    }),

    // CROSS-DOCUMENT boilerplate detection (the RefinedWeb-style
    // "duplicated span" pass — distinct from t8, whose repetition
    // signals are WITHIN one doc): a word-5-gram occurring in >= 2
    // distinct documents is corpus boilerplate (nav bars, license
    // headers, templated spans), and each doc is scored by the
    // fraction of its gram positions covered by such grams; docs
    // above 30% coverage are dropped. The keep rule is exact integer
    // arithmetic (10*boiler < 3*total) so the decision is
    // bit-identical in the oracle. Scale shape: the gram
    // document-frequency table is a gram-keyed aggregate (d8's
    // vocabulary-bounded shuffle) and joins back on the gram key —
    // never broadcast, never all-pairs; the per-doc score is one more
    // doc-keyed aggregate. explode_outer keeps sub-5-token docs
    // (zero grams => boiler_frac 0, keep).
    "t15_boilerplate" -> ((s, d) => boilerplate(Tables.documents(s, d))),
    // per-doc first-occurrence novelty over distinct 5-grams (d15's
    // gram-keyed min-owner shape; integer-ppm verdict)
    "t16_novelty" -> ((s, d) => noveltyScore(Tables.documents(s, d))),
    // the documents→embeddings BRIDGE: deterministic feature-hashing
    // embedding (char-trigram hashing trick, codegen'd native
    // expression, unit-norm) so the similarity/semantic-dedup family
    // can run without a pre-built embeddings table. Engine-specific
    // arithmetic → rows-only; determinism/norm/near-dup-cosine in the
    // spec. A narrow per-row map — no shuffle at any scale.
    "t17_embed" -> ((s, d) => {
      import graft.functions.NativeTextExpressions.featureHashEmbed
      // registered projection is ALL-SCALAR: the driver's checker
      // canonicalizes by sorting every column, and a raw array<double>
      // column crashes it (unhashable). The vector itself is consumed
      // downstream (d13/s2 bridge, SimilaritySpec); here it is
      // summarized as nnz + norm + two dimension-weighted moment
      // digests Σ vᵢ·(i+1) and Σ vᵢ·(i+1)² — order-INdependent sums,
      // which is what makes this entry ORACLE-checkable: the embed
      // kernel is ±1 integer accumulation (exact in doubles) through
      // a splitmix64 finalizer, and DuckDB re-derives the 64-bit
      // wrapping multiplies in HUGEINT limb arithmetic (see the
      // oracle), normalization included — acc·(1/√ss) is two IEEE
      // roundings both engines perform identically. Any component
      // change moves the moments, so the row stays as discriminating
      // as the old xxhash64 digest without being engine-specific.
      Tables.documents(s, d).select(col("doc_id"),
        featureHashEmbed(lower(col("text")), 64).as("v"))
        .select(col("doc_id"), lit(64L).as("dim"),
          expr("CAST(size(filter(v, x -> x != 0D)) AS BIGINT)").as("nnz"),
          round(expr("aggregate(v, 0D, (a, x) -> a + x * x)"), 6)
            .as("norm_sq"),
          round(expr(
            "aggregate(zip_with(v, sequence(1, 64), (x, i) -> x * i)," +
              " 0D, (a, x) -> a + x)"), 6).as("d1"),
          round(expr(
            "aggregate(zip_with(v, sequence(1, 64), (x, i) -> (x * i) * i)," +
              " 0D, (a, x) -> a + x)"), 6).as("d2"))
    }),

    // ZIPF / VOCABULARY STATISTICS per language — the corpus-health
    // fingerprint (a natural corpus fits ln f ≈ −α·ln r with α near
    // 1; template/spam floods flatten or steepen it, so α drift is a
    // cheap corpus-mix alarm). Pipeline: (lang, term) frequency
    // aggregate (vocab-bounded exchange, t9's shape) → top-100
    // frequency terms per language through the BOUNDED-HEAP
    // `topkRows` (a row_number window would sort each language's
    // whole freq≥2 vocabulary in one task — at web scale that is
    // 10⁸ terms; the heap ships ≤100 rows per map-side buffer) →
    // log–log OLS on [[Olap.olsByGroup]]'s sufficient statistics.
    // Rank assignment among equal-frequency terms is engine-
    // dependent, but tied terms share ln(freq), so the fitted
    // (x, y) multiset — and therefore the fit — is tie-invariant;
    // that is what makes an exact DuckDB oracle possible.
    "t19_zipf_vocab" -> ((s, d) => {
      import graft.functions.TopKAggregate.topkRows
      val tf = Tables.documents(s, d)
        .select(col("lang"), explode(tokens(lower(col("text")))).as("term"))
        .groupBy("lang", "term").agg(count(lit(1)).as("freq"))
      val stats = tf.groupBy("lang").agg(
        count(lit(1)).as("vocab_size"), sum("freq").as("total_tokens"))
      val pts = tf.filter(col("freq") >= 2)
        .groupBy("lang")
        .agg(topkRows(col("freq").cast("double"), col("term"),
          struct(col("freq")), 100).as("tk"))
        .select(col("lang"), posexplode(col("tk")).as(Seq("pos", "t")))
        .select(col("lang"),
          log((col("pos") + 1).cast("double")).as("lx"),
          log(col("t.freq").cast("double")).as("ly"))
      Olap.olsByGroup(pts, Seq("lang"), col("lx"), col("ly"))
        .join(stats, Seq("lang"))
        .select(col("lang"), col("vocab_size"), col("total_tokens"),
          col("n").as("fitted_terms"),
          round(-col("slope"), 6).as("zipf_alpha"),
          round(col("r2"), 6).as("fit_r2"))
    }),

    // READABILITY GATE (Flesch reading ease — the classic document-
    // complexity score education/legal/content pipelines filter on,
    // and a standard pretraining-mix signal): 206.835 − 1.015·(words/
    // sentences) − 84.6·(syllables/words), with sentences = non-empty
    // [.!?]+ segments (min 1) and syllables = vowel-group runs — the
    // standard no-dictionary heuristic, computed IDENTICALLY by both
    // engines so the score is exactly oracle-checkable. A pure narrow
    // map: three regex counts per row, zero shuffles at any scale.
    "t20_readability" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      docs.select(col("doc_id"), col("lang"),
          greatest(lit(1L), expr(
            """CAST(size(filter(split(text, '[.!?]+'), x -> trim(x) != ''))
               AS BIGINT)""")).as("n_sentences"),
          expr("CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)")
            .as("n_words"),
          expr("CAST(regexp_count(lower(text), '[aeiouy]+') AS BIGINT)")
            .as("n_syllables"))
        .withColumn("flesch", round(
          lit(206.835)
            - lit(1.015) * (col("n_words").cast("double")
              / col("n_sentences").cast("double"))
            - lit(84.6) * (col("n_syllables").cast("double")
              / col("n_words").cast("double")), 3))
        .withColumn("band",
          when(round(col("flesch"), 9) >= 60.0, "easy")
            .when(round(col("flesch"), 9) >= 30.0, "standard")
            .otherwise("difficult"))
    }),
    // REAL corpus-trained BPE tokenizer (the upgrade t6's estimator
    // stood in for): 16 deterministic merges on integer pair counts
    // (count desc, lexicographic tie-break), greedy left-to-right
    // application; per-doc exact subword counts for token budgeting.
    // Training and application both re-derived in the DuckDB oracle —
    // see [[Bpe]].
    "t21_bpe_tokens" -> ((s, d) => Bpe.bpeTokens(Tables.documents(s, d))),

    // TOKENIZER FERTILITY (round 17; the multilingual tokenizer-
    // quality readout a vocab/merge change is gated on): per language,
    // BPE tokens per word and chars per BPE token over t21's exact
    // per-doc counts — a language whose fertility runs high is
    // under-served by the merge table (it pays more sequence length
    // per word of content). t21's scale shape plus one |langs|-row
    // aggregate; ratios divide exact BIGINT sums.
    "t27_tokenizer_fertility" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      docs.select(col("doc_id"), col("lang"), col("n_chars"))
        .join(Bpe.bpeTokens(docs), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_words").cast("long").as("n_words"),
          sum("n_bpe_tokens").cast("long").as("n_bpe_tokens"),
          sum("n_chars").cast("long").as("__chars"))
        .select(col("lang"), col("n_docs"), col("n_words"),
          col("n_bpe_tokens"),
          when(col("n_words") === 0, lit(null).cast("double"))
            .otherwise(round(col("n_bpe_tokens").cast("double") /
              col("n_words").cast("double"), 6)).as("fertility"),
          when(col("n_bpe_tokens") === 0, lit(null).cast("double"))
            .otherwise(round(col("__chars").cast("double") /
              col("n_bpe_tokens").cast("double"), 6)).as("chars_per_token"))
    }),

    // CORPUS DATASHEET (round 18): the per-source report every
    // training-data release ships — doc/token/char volume, predicted
    // language mix (t2's heuristic), mean quality (t3's exact integer
    // ppm composite), and exact-duplicate exposure (docs whose full
    // text recurs ANYWHERE in the corpus — cross-source copies count,
    // which is the point of the report). All integer aggregates
    // (avg = sum div n; dup share in ppm), so the oracle matches
    // bit-for-bit. 100 TB shape: one pass computes all per-doc
    // signals narrowly (no shuffle), the dup join is hash-keyed at
    // text grain (in production: the d1 content-hash MV), and the
    // final aggregate lands at |sources| grain with map-side combine.
    "t28_corpus_datasheet" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val perDoc = docs
        .withColumn("toks", tokens(lower(col("text"))))
        .withColumn("n_toks", size(col("toks")))
        .withColumn("s_en", markerCount(col("toks"), enMarkers))
        .withColumn("s_fr", markerCount(col("toks"), frMarkers))
        .withColumn("s_es", markerCount(col("toks"), esMarkers))
        .withColumn("s_de", markerCount(col("toks"), deMarkers))
        .withColumn("n_stop", col("s_en"))
        .withColumn("n_long",
          size(filter(col("toks"), t => length(t) > 5)))
        .withColumn("pred",
          langId(col("s_en"), col("s_fr"), col("s_es"), col("s_de")))
        .withColumn("q", qualityPpm)
      val copies = docs.groupBy("text").agg(count(lit(1)).as("n_copies"))
      perDoc.join(copies, "text")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks").cast("long")).as("n_tokens"),
          sum(length(col("text")).cast("long")).as("n_chars"),
          sum(when(col("pred") === "en", 1L).otherwise(0L)).as("n_en"),
          sum(when(col("pred") === "fr", 1L).otherwise(0L)).as("n_fr"),
          sum(when(col("pred") === "es", 1L).otherwise(0L)).as("n_es"),
          sum(when(col("pred") === "de", 1L).otherwise(0L)).as("n_de"),
          sum(col("q")).as("__sum_q"),
          sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("dup_docs"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_chars"), col("n_en"), col("n_fr"), col("n_es"),
          col("n_de"),
          expr("__sum_q div n_docs").as("avg_quality_ppm"),
          col("dup_docs"),
          expr("(1000000 * dup_docs) div n_docs").as("dup_ppm"))
    }),

    // COLLOCATION MINING: adjacent-bigram pointwise mutual information
    // ln(p(w1w2) / (p(w1)·p(w2))) over the corpus, min support 5 — the
    // multi-word-expression detector (phrase vocabularies, tokenizer
    // merge seeding). Bigram/unigram counts are gram-keyed aggregates
    // (t13's scale shape, vocabulary-bounded); the two corpus totals
    // ride 1-row broadcasts; support filters BEFORE the unigram joins
    // so only surviving pairs join. Rank key = round(pmi, 9) (the
    // t11/9-dp convention), ties (w1, w2)
    "t22_collocations" -> ((s, d) => collocations(Tables.documents(s, d))),

    // RAKE keyword extraction: stopword-delimited candidate phrases
    // scored by Σ degree(w)/freq(w) — see [[rakeKeywords]]
    "t23_rake_keywords" -> ((s, d) => rakeKeywords(Tables.documents(s, d))),

    // LEXICAL DIVERSITY per language: corpus-level type/token ratio
    // and hapax share from exact per-doc integer counts — the
    // vocabulary-richness profile a data-mixing decision reads next
    // to t19's Zipf fit. Per-doc type counts are (doc, token)-keyed
    // aggregates (corpus-linear, the t-family shape); the macro
    // ratios divide exact Long sums, so cross-doc double
    // accumulation order can never move a bit
    "t24_lexical_diversity" -> ((s, d) =>
      lexicalDiversity(Tables.documents(s, d))),
    // CHARACTER-DISTRIBUTION profile per (lang, source) — the
    // gibberish / machine-noise screen beside t3's word-level quality
    // score. Per doc over the fixed [a-z0-9 ] alphabet: kept-char
    // count, distinct symbols, and the COLLISION (repeat) probability
    // Σc²/n² in exact integer ppm (floor division — no float sum ever
    // forms); group rows macro-average the exact integers and derive
    // the Rényi-2 entropy −log₂(avg collision) with ONE libm call per
    // GROUP row (q69's accepted log-parity surface: ≤ |lang×source|
    // rows, never per doc)
    "t25_char_entropy" -> ((s, d) =>
      charEntropyProfile(Tables.documents(s, d))),
    // TOKEN BURSTINESS (Fano factor): for the 20 highest-count tokens,
    // variance-to-mean of per-doc counts (zeros included via the
    // closed form) — bursty topical terms score ≫ 1, function words
    // ≈ 1; the content-vs-boilerplate discriminator TF-IDF can't see.
    // Fano = (N·Σc² − (Σc)²)/(N·Σc): every sufficient statistic is an
    // exact integer (DECIMAL sums — per-doc squares wrap Long at
    // corpus scale), doubles only at the final division; the rank
    // window runs over the vocab-grain frame (t19's convention)
    "t26_token_burstiness" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val cnt = docs
        .select(col("doc_id"), explode(tokens(lower(col("text")))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val byTok = cnt.groupBy("tok")
        .agg(sum(col("c").cast("decimal(38,0)")).as("sc"),
          sum((col("c") * col("c")).cast("decimal(38,0)")).as("sc2"),
          count(lit(1)).as("df"))
      // r22 (window audit): sort.limit plans as TakeOrderedAndProject
      // (bounded heaps — no global sort of the vocab-grain frame);
      // the rank window then re-ranks ≤ 20 rows
      byTok.sort(col("sc").desc, col("tok")).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("sc").desc, col("tok"))).cast("long"))
        .crossJoin(broadcast(nDocs))
        .select(col("rank"), col("tok").as("token"),
          col("sc").cast("long").as("total_count"), col("df").as("doc_freq"),
          round((col("n_docs").cast("double") * col("sc2").cast("double")
            - col("sc").cast("double") * col("sc").cast("double"))
            / (col("n_docs").cast("double") * col("sc").cast("double")), 6)
            .as("fano"))
    })
  )

  /** Corpus-level lexical diversity per language — see the
    * `t24_lexical_diversity` entry. Exact integer counts throughout;
    * the macro ratios divide Long sums.
    */
  def lexicalDiversity(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        explode(tokens(lower(col("text")))).as("tok"))
      .groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "lang")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        sum("n_types").as("total_types"),
        sum("n_hapax").as("total_hapax"))
      .select(col("lang"), col("n_docs"), col("total_tokens"),
        col("total_types"), col("total_hapax"),
        round(col("total_types").cast("double") / col("total_tokens"), 6)
          .as("type_token_ratio"),
        round(col("total_hapax").cast("double") / col("total_types"), 6)
          .as("hapax_ratio"))

  /** Per-(lang, source) character-distribution profile — see the
    * `t25_char_entropy` entry. All per-doc statistics are exact
    * integers (the collision probability is a ppm FLOOR DIVISION of
    * exact counts); the only float op is one log₂ per group row.
    */
  def charEntropyProfile(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), col("source"),
        explode(split(lower(col("text")), "")).as("ch"))
      .filter(col("ch").rlike("^[a-z0-9 ]$"))
      .groupBy("doc_id", "lang", "source", "ch")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "lang", "source")
      .agg(sum("c").as("n"), count(lit(1)).as("k"),
        sum(col("c") * col("c")).as("c2"))
      .withColumn("rr_ppm", expr("(c2 * 1000000L) div (n * n)"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("k").as("sum_distinct"), sum("rr_ppm").as("sum_rr"))
      .select(col("lang"), col("source"), col("n_docs"),
        round(col("sum_distinct").cast("double") /
          col("n_docs").cast("double"), 6).as("avg_distinct_chars"),
        round(col("sum_rr").cast("double") /
          col("n_docs").cast("double"), 2).as("avg_collision_ppm"),
        round(-log2(col("sum_rr").cast("double") /
          (col("n_docs").cast("double") * 1000000.0)), 6)
          .as("renyi2_entropy_bits"))

  /** The fixed stopword inventory shared by t23's engine and oracle
    * (a literal, so the SQL can inline the identical list).
    */
  val rakeStopwords: Seq[String] = Seq("a", "the", "of", "and", "to", "in",
    "is", "on", "for", "with", "at", "by", "an", "be", "or", "as", "it",
    "that", "this", "are")

  /** t23: RAKE keyword extraction (Rose et al., 2010). Candidate
    * phrases are maximal stopword-free token runs (gaps-and-islands
    * over the stopword flags); each word scores degree/frequency
    * (degree = Σ phrase length over its occurrences), a phrase scores
    * the sum of its words' scores, and phrases rank by
    * (round(score, 9) desc, phrase). Corpus work is gram-keyed and
    * vocabulary-bounded: one positional explode, one (doc, island)
    * aggregate, one word-stats aggregate, one score join.
    */
  def rakeKeywords(docs: DataFrame, topN: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sw = rakeStopwords
    val tok = docs.select(col("doc_id"),
      posexplode(tokens(lower(col("text")))).as(Seq("pos", "w")))
    val isl = tok
      .withColumn("stop", col("w").isInCollection(sw))
      .withColumn("island", sum(when(col("stop"), 1L).otherwise(0L))
        .over(Window.partitionBy("doc_id").orderBy("pos")))
    val phrases = isl.filter(!col("stop"))
      .groupBy(col("doc_id"), col("island"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
        x => x.getField("w")).as("ws"))
      .select(col("ws"), array_join(col("ws"), " ").as("phrase"),
        size(col("ws")).as("plen"))
    val wstats = phrases
      .select(explode(col("ws")).as("w"), col("plen"))
      .groupBy("w")
      .agg(sum("plen").as("degree"), count(lit(1)).as("freq"))
      .withColumn("wscore",
        col("degree").cast("double") / col("freq").cast("double"))
    val scored = phrases
      .select(col("phrase"), explode(col("ws")).as("w"))
      .join(wstats.select("w", "wscore"), Seq("w"))
      .groupBy("phrase")
      // each phrase INSTANCE contributes its words once; dividing the
      // total by the occurrence count recovers the per-instance RAKE
      // score (identical instances score identically)
      .agg(sum("wscore").as("tot"))
    val occ = phrases.groupBy("phrase")
      .agg(count(lit(1)).as("n_occurrences"))
    // r22 (window audit): top-N via TakeOrderedAndProject, then a
    // bounded ≤ topN-row re-rank — no global sort of the phrase frame
    scored.join(occ, Seq("phrase"))
      .withColumn("score", col("tot") / col("n_occurrences"))
      .sort(round(col("score"), 9).desc, col("phrase"))
      .limit(topN)
      .withColumn("rank", row_number().over(Window.orderBy(
        round(col("score"), 9).desc, col("phrase"))).cast("long"))
      .select(col("rank"), col("phrase"), col("n_occurrences"),
        round(col("score"), 6).as("score"))
  }

  /** t22's body, factored for planted-corpus specs: PMI-ranked
    * adjacent bigrams with min support, rank key `round(pmi, 9)`.
    */
  def collocations(docs: DataFrame, minSupport: Int = 5,
      topN: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = docs.select(col("doc_id"), tokens(lower(col("text"))).as("toks"))
    val uc = t.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val nu = uc.agg(sum("wc").as("nu"))
    val bc = t.select(explode(expr(
        """CASE WHEN size(toks) >= 2 THEN
             transform(sequence(1, size(toks) - 1),
               i -> struct(toks[i - 1] AS w1, toks[i] AS w2))
           ELSE array() END""")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val nb = bc.agg(sum("n_pair").as("nb"))
    bc.filter(col("n_pair") >= minSupport)
      .join(uc.select(col("w").as("w1"), col("wc").as("c1")), Seq("w1"))
      .join(uc.select(col("w").as("w2"), col("wc").as("c2")), Seq("w2"))
      .crossJoin(broadcast(nb)).crossJoin(broadcast(nu))
      .withColumn("pmi",
        log((col("n_pair").cast("double") / col("nb")) /
          ((col("c1").cast("double") / col("nu")) *
           (col("c2").cast("double") / col("nu")))))
      // r22 (window audit): same TakeOrderedAndProject + bounded
      // re-rank shape as rakeKeywords
      .sort(round(col("pmi"), 9).desc, col("w1"), col("w2"))
      .limit(topN)
      .withColumn("rank", row_number().over(Window.orderBy(
        round(col("pmi"), 9).desc, col("w1"), col("w2"))).cast("long"))
      .select(col("rank"), col("w1"), col("w2"), col("n_pair"),
        round(col("pmi"), 6).as("pmi"))
  }

  /** Cross-document boilerplate scoring — see the t15 entry. `minDf`
    * is the document-frequency floor above which a gram counts as
    * corpus boilerplate (2 = "appears anywhere else at all"; raise it
    * on corpora where organic overlap is expected).
    */
  def boilerplate(docs: DataFrame, minDf: Long = 2L): DataFrame = {
    // ONE gram-keyed exchange feeds everything on the gram side: the
    // exploded stream repartitions by gram, and because a hash
    // partitioning on a SUBSET of the grouping keys satisfies the
    // (doc, gram) clustering, the per-doc gram counts, the document-
    // frequency aggregate above them, AND the df join all reuse that
    // same exchange — the previous shape paid three gram-side
    // exchanges ((doc,gram) pre-agg, df build, join probe). Post-agg
    // join input still means a corpus-hot boilerplate gram (a license
    // header in 10% of all docs) carries one joined row per DOCUMENT
    // instead of per position — the residual hot key is AQE skew-join
    // territory, not a single-task position pileup
    // gram-less docs ride a per-doc leading-space sentinel instead of
    // a NULL gram (all nulls would hash to ONE task of the gram
    // repartition); no real gram can start with a space, so sentinels
    // can't reach the df table and are excluded from the counts
    val byGram = docs
      .select(col("doc_id"),
        explode_outer(wordNgrams(tokens(lower(col("text"))), 5)).as("__g"))
      .select(col("doc_id"),
        coalesce(col("__g"),
          concat(lit(" "), col("doc_id").cast("string"))).as("gram"))
      .repartition(col("gram"))
    val real = not(col("gram").startsWith(" "))
    val counts = byGram.groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
    val boiler = counts.filter(real)
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    counts.join(boiler, Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(sum(when(real, col("c")).otherwise(0L)).as("n_grams"),
        sum(when(col("df").isNotNull, col("c")).otherwise(0L)).as("n_boiler_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler_grams"),
        when(col("n_grams") > 0,
          round(col("n_boiler_grams").cast("double") / col("n_grams"), 6))
          .otherwise(0.0).as("boiler_frac"),
        (col("n_boiler_grams") * 10 < col("n_grams") * 3 ||
          col("n_grams") === 0).as("keep"))
  }

  /** Per-doc NOVELTY scoring — the data-curation counterpart of t15:
    * how much of this document's 5-gram vocabulary appears here FIRST
    * (first = lowest doc_id carrying the gram, the deterministic
    * stand-in for crawl order)? Low-novelty docs are re-paste-heavy
    * and add little to a training mix; the signal drives source
    * weighting (p3/p7) and incremental-crawl triage.
    *
    * Scale shape = d15's: distinct grams per doc explode once,
    * repartition by gram ONCE, and the first-owner aggregate plus the
    * join back both reuse that partitioning; the verdict is a
    * doc-keyed sum/count. `novelty_ppm` is integer arithmetic
    * (truncating div) for cross-engine bit-parity.
    */
  def noveltyScore(docs: DataFrame, n: Int = 5): DataFrame = {
    require(n >= 2, "noveltyScore needs n >= 2 (sentinel no-collision)")
    // gram-less (short) docs ride a PER-DOC sentinel gram instead of
    // a NULL (all nulls would hash into ONE partition of the gram
    // repartition — a single-task pileup when short docs are common).
    // The sentinel starts with a space, which no real gram can
    // (nonempty tokens joined by single spaces), so it can't pollute
    // a real gram's first-owner; sentinel rows are excluded from the
    // gram counts by the same leading-space test.
    val grams = docs
      .select(col("doc_id"),
        explode_outer(array_distinct(
          wordNgrams(tokens(lower(col("text"))), n))).as("__g"))
      .select(col("doc_id"),
        coalesce(col("__g"),
          concat(lit(" "), col("doc_id").cast("string"))).as("gram"))
      .repartition(col("gram"))
    val real = not(col("gram").startsWith(" "))
    val first = grams.groupBy("gram").agg(min("doc_id").as("__first"))
    grams.join(first, Seq("gram"))
      .groupBy("doc_id")
      .agg(sum(when(real, 1L).otherwise(0L)).as("n_grams"),
        sum(when(real && col("__first") === col("doc_id"), 1L)
          .otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        when(col("n_grams") > 0,
          expr("n_novel * 1000000 div n_grams")).cast("long")
          .as("novelty_ppm"))
  }

  private val enL = inList(enMarkers)
  private val frL = inList(frMarkers)
  private val esL = inList(esMarkers)
  private val deL = inList(deMarkers)

  val oracles: Map[String, String] = Map(
    "t1_token_count" ->
      raw"""SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         length(text) AS len_chars,
         ROUND(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
               / len(regexp_split_to_array(trim(text), '\s+')), 6) AS avg_token_len
         FROM documents""",
    "t2_lang_id" ->
      raw"""WITH t AS (
           SELECT doc_id, lang AS label_lang,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         sc AS (
           SELECT doc_id, label_lang,
             len(list_filter(toks, x -> x IN $enL)) AS s_en,
             len(list_filter(toks, x -> x IN $frL)) AS s_fr,
             len(list_filter(toks, x -> x IN $esL)) AS s_es,
             len(list_filter(toks, x -> x IN $deL)) AS s_de
           FROM t)
         SELECT doc_id, label_lang,
           CASE WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
                WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
                WHEN s_es >= s_de THEN 'es'
                ELSE 'de' END AS predicted_lang,
           s_en, s_fr, s_es, s_de
         FROM sc""",
    "t3_quality_score" ->
      raw"""WITH t AS (
           SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         m AS (
           SELECT doc_id, len(toks) AS n_toks,
             len(list_filter(toks, x -> x IN $enL)) AS n_stop,
             len(list_filter(toks, x -> length(x) > 5)) AS n_long
           FROM t)
         SELECT doc_id,
           ROUND(CAST(n_stop AS DOUBLE) / n_toks, 6) AS stop_ratio,
           ROUND(CAST(n_long AS DOUBLE) / n_toks, 6) AS long_frac,
           ROUND(LEAST(CAST(n_toks AS DOUBLE) / 100.0, 1.0), 6) AS len_score,
           CAST((300000 * n_stop) // n_toks + (300000 * n_long) // n_toks
                + 4000 * LEAST(n_toks, 100) AS BIGINT) AS quality_ppm
         FROM m""",
    "t4_fingerprint" ->
      """SELECT doc_id,
           CAST(COALESCE(list_sum(list_transform(range(1, length(text) + 1),
             i -> i * ord(substring(text, CAST(i AS INT), 1)))), 0) AS BIGINT) AS fingerprint,
           CAST(length(text) AS BIGINT) AS len
         FROM documents""",
    "t6_bpe_tokens" ->
      raw"""WITH t AS (
           SELECT doc_id, text, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents)
         SELECT doc_id,
           len(toks) AS n_ws_tokens,
           CAST(list_sum(list_transform(toks, t -> (length(t) + 3) // 4)) AS BIGINT) AS n_subword_est,
           CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS n_vowel_runs,
           CAST(len(regexp_extract_all(text, '[bcdfghjklmnpqrstvwxyz]+')) AS BIGINT) AS n_consonant_runs
         FROM t""",
    "t7_quality_filter" ->
      raw"""WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
             length(regexp_replace(text, '\s', '', 'g')) AS sum_len
           FROM documents),
         m AS (
           SELECT doc_id, len(toks) AS n_toks, sum_len,
             len(list_filter(toks, x -> x IN $enL)) AS n_stop
           FROM t),
         r AS (
           SELECT *,
             CASE WHEN n_toks < $qualityMinTokens THEN 'too_short'
                  WHEN n_toks > $qualityMaxTokens THEN 'too_long'
                  WHEN sum_len < n_toks * $qualityMinMeanTokLen THEN 'short_words'
                  WHEN sum_len > n_toks * $qualityMaxMeanTokLen THEN 'long_words'
                  WHEN n_stop < $qualityMinStopwords THEN 'low_stopword'
                  ELSE NULL END AS reason
           FROM m)
         SELECT doc_id, n_toks AS n_tokens,
           CAST((100 * sum_len) // n_toks AS BIGINT) AS mean_tok_len_x100,
           CAST(n_stop AS BIGINT) AS n_stop,
           (reason IS NULL) AS keep, reason
         FROM r""",
    "t8_repetition" ->
      raw"""WITH t AS (
           SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         g AS (
           SELECT doc_id, toks,
             CASE WHEN len(toks) >= 5 THEN list_transform(range(1, len(toks) - 3),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                    toks[i+3] || ' ' || toks[i+4])
             ELSE [] END AS grams5
           FROM t),
         bg AS (
           SELECT doc_id, bigram, COUNT(*) AS c
           FROM (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN
                   list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
                 ELSE [] END) AS bigram
                 FROM t)
           GROUP BY doc_id, bigram),
         tb AS (SELECT doc_id, MAX(c) AS top_bigram_freq FROM bg GROUP BY doc_id)
         SELECT g.doc_id,
           CAST(len(g.toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(g.toks)) AS BIGINT) AS n_distinct_tokens,
           ROUND(1.0 - CAST(len(list_distinct(g.toks)) AS DOUBLE) / len(g.toks), 6)
             AS dup_word_frac,
           COALESCE(tb.top_bigram_freq, 0) AS top_bigram_freq,
           CASE WHEN len(g.grams5) > 0
                THEN ROUND(1.0 - CAST(len(list_distinct(g.grams5)) AS DOUBLE)
                     / len(g.grams5), 6)
                ELSE 0.0 END AS dup_5gram_frac
         FROM g LEFT JOIN tb ON g.doc_id = tb.doc_id""",
    "t5_ngram_stats" ->
      raw"""WITH t AS (
           SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents),
         b AS (
           SELECT unnest(list_transform(range(1, greatest(len(toks), 1)),
             i -> toks[i] || ' ' || toks[i + 1])) AS bigram
           FROM t)
         SELECT bigram, COUNT(*) AS freq FROM b
         GROUP BY bigram ORDER BY freq DESC, bigram ASC LIMIT 20""",
    "t15_boilerplate" ->
      raw"""WITH t AS (
           SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         p AS (
           SELECT doc_id,
             unnest(CASE WHEN len(toks) >= 5 THEN
               list_transform(range(1, len(toks) - 3),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                      toks[i+3] || ' ' || toks[i+4])
             ELSE [NULL] END) AS gram
           FROM t),
         f AS (
           SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM p WHERE gram IS NOT NULL)
           GROUP BY gram HAVING COUNT(*) >= 2)
         SELECT p.doc_id,
           COUNT(p.gram) AS n_grams,
           COUNT(f.gram) AS n_boiler_grams,
           CASE WHEN COUNT(p.gram) > 0
                THEN ROUND(CAST(COUNT(f.gram) AS DOUBLE) / COUNT(p.gram), 6)
                ELSE 0.0 END AS boiler_frac,
           (COUNT(f.gram) * 10 < COUNT(p.gram) * 3 OR COUNT(p.gram) = 0) AS keep
         FROM p LEFT JOIN f ON p.gram = f.gram
         GROUP BY p.doc_id""",
    // distinct 5-grams per doc, min-doc_id first owner, truncating
    // integer ppm (DuckDB // ≡ Spark div on non-negative operands)
    "t16_novelty" ->
      raw"""WITH t AS (
           SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         p AS (
           SELECT doc_id,
             unnest(CASE WHEN len(toks) >= 5 THEN
               list_distinct(list_transform(range(1, len(toks) - 3),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                      toks[i+3] || ' ' || toks[i+4]))
             ELSE [NULL] END) AS gram
           FROM t),
         f AS (
           SELECT gram, MIN(doc_id) AS first_id FROM p
           WHERE gram IS NOT NULL GROUP BY gram)
         SELECT p.doc_id,
           COUNT(p.gram) AS n_grams,
           CAST(COALESCE(SUM(CASE WHEN f.first_id = p.doc_id THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_novel,
           CASE WHEN COUNT(p.gram) > 0 THEN
             CAST(SUM(CASE WHEN f.first_id = p.doc_id THEN 1 ELSE 0 END)
                  * 1000000 // COUNT(p.gram) AS BIGINT)
           END AS novelty_ppm
         FROM p LEFT JOIN f ON p.gram = f.gram
         GROUP BY p.doc_id""",
    "t10_pii_scrub" -> {
      // build the scrubbed-string expression from the SAME pattern list
      // the Spark side uses; DuckDB needs the 'g' flag for global
      // replacement (Spark's regexp_replace is global by default)
      val scrubbed = PiiPatterns.ordered.foldLeft("text") {
        case (e, (pat, repl)) => s"regexp_replace($e, '$pat', '$repl', 'g')"
      }
      val counts = PiiPatterns.counted.map { case (name, pat) =>
        s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS $name"
      }.mkString(",\n           ")
      raw"""WITH s AS (
           SELECT doc_id,
           $counts,
           $scrubbed AS scrubbed
           FROM documents)
         SELECT doc_id, n_email, n_url, n_id_number, n_denylist,
           CAST(COALESCE(list_sum(list_transform(range(1, length(scrubbed) + 1),
             i -> i * ord(substring(scrubbed, CAST(i AS INT), 1)))), 0) AS BIGINT)
             AS scrubbed_fingerprint,
           CAST(length(scrubbed) AS BIGINT) AS scrubbed_len
         FROM s"""
    },
    "t11_tfidf" ->
      raw"""WITH t AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
         df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         s AS (
           SELECT tf.doc_id, tf.term, tf.tf, df.df,
             tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df) AS score
           FROM tf JOIN df USING (term) CROSS JOIN n),
         r AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY round(score, 9) DESC, term ASC) AS BIGINT) AS rnk
           FROM s)
         SELECT doc_id, term, tf, df, ROUND(score, 6) AS tfidf, rnk
         FROM r WHERE rnk <= 3""",
    "t9_unigram_logprob" ->
      raw"""WITH t AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
           FROM documents),
         vocab AS (SELECT w, COUNT(*) AS wc FROM t GROUP BY w),
         tot AS (SELECT CAST(SUM(wc) AS BIGINT) AS total FROM vocab)
         SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(AVG(-ln(CAST(wc AS DOUBLE) / CAST(total AS DOUBLE))), 6)
             AS avg_neg_logprob
         FROM t JOIN vocab USING (w) CROSS JOIN tot
         GROUP BY doc_id""",
    "t13_bigram_logprob" ->
      raw"""WITH t AS (
           SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         uc AS (
           SELECT w, COUNT(*) AS wc
           FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
         v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uc),
         bi AS (
           SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN
               list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
             ELSE [] END) AS bg
           FROM t),
         bc AS (SELECT bg, COUNT(*) AS bc FROM bi GROUP BY bg)
         SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(-ln(CAST(b.bc + 1 AS DOUBLE) / CAST(u.wc + v.v AS DOUBLE))), 6)
             AS avg_neg_logprob
         FROM bi JOIN bc b USING (bg)
         JOIN uc u ON u.w = split_part(bi.bg, ' ', 1)
         CROSS JOIN v
         GROUP BY doc_id""",
    // t13's scoring CTEs + corpus mean/stddev bands; thresholds derive
    // from 6-dp-rounded stats so both engines compare identical doubles
    "t14_perplexity_filter" ->
      raw"""WITH t AS (
           SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         uc AS (
           SELECT w, COUNT(*) AS wc
           FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
         v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uc),
         bi AS (
           SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN
               list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
             ELSE [] END) AS bg
           FROM t),
         bc AS (SELECT bg, COUNT(*) AS bc FROM bi GROUP BY bg),
         scores AS (
           SELECT doc_id, COUNT(*) AS n_bigrams,
             ROUND(AVG(-ln(CAST(b.bc + 1 AS DOUBLE) / CAST(u.wc + v.v AS DOUBLE))), 6)
               AS avg_neg_logprob
           FROM bi JOIN bc b USING (bg)
           JOIN uc u ON u.w = split_part(bi.bg, ' ', 1)
           CROSS JOIN v
           GROUP BY doc_id),
         stats AS (
           SELECT ROUND(AVG(avg_neg_logprob), 6) AS mu,
             ROUND(stddev_pop(avg_neg_logprob), 6) AS sigma
           FROM scores),
         lab AS (
           SELECT doc_id, n_bigrams, avg_neg_logprob,
             CASE WHEN avg_neg_logprob < mu - 0.25 * sigma THEN 'head'
                  WHEN avg_neg_logprob > mu + 0.25 * sigma THEN 'tail'
                  ELSE 'middle' END AS bucket
           FROM scores CROSS JOIN stats)
         SELECT doc_id, n_bigrams, avg_neg_logprob, bucket,
           bucket <> 'tail' AS keep
         FROM lab""",
    "t12_doc_chunks" ->
      raw"""WITH t AS (
           SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         n AS (SELECT doc_id, toks, len(toks) AS n_toks FROM t),
         s AS (
           SELECT doc_id, toks, n_toks,
             unnest(range(1, greatest(n_toks, 1) + 1, 48)) AS start_tok
           FROM n),
         c AS (
           SELECT doc_id,
             CAST((start_tok - 1) // 48 AS BIGINT) AS chunk_idx,
             CAST(start_tok AS BIGINT) AS start_tok,
             CAST(LEAST(64, n_toks - start_tok + 1) AS BIGINT) AS chunk_toks,
             array_to_string(list_slice(toks, start_tok,
               LEAST(start_tok + 63, n_toks)), ' ') AS chunk
           FROM s)
         SELECT doc_id, chunk_idx, start_tok, chunk_toks,
           CAST(COALESCE(list_sum(list_transform(range(1, length(chunk) + 1),
             i -> i * ord(substring(chunk, CAST(i AS INT), 1)))), 0) AS BIGINT)
             AS chunk_fp
         FROM c""",
    // t17's embed re-derived ENTIRELY in SQL: the splitmix64 finalizer
    // runs in HUGEINT limb arithmetic — a·b mod 2⁶⁴ splits a into
    // 32-bit halves ((a%2³²)·b + ((a//2³²)·b % 2³²)·2³², all < 2⁹⁷,
    // inside HUGEINT range), x ^= x >>> s round-trips through signed
    // BIGINT for the xor (shift = integer division of the nonnegative
    // u64 form). ±1 accumulation is exact in doubles; normalization
    // acc·(1.0/sqrt(ss)) is the kernel's own two IEEE roundings; the
    // moment digests are order-independent sums inside the checker's
    // tolerance.
    "t17_embed" ->
      raw"""WITH docs AS (
           SELECT doc_id, regexp_extract_all(lower(text), '(?s).') AS cs
           FROM documents),
         tri AS (
           SELECT doc_id,
             CAST(unicode(cs[i]) AS HUGEINT) AS c0,
             CAST(unicode(cs[i+1]) AS HUGEINT) AS c1,
             CAST(unicode(cs[i+2]) AS HUGEINT) AS c2
           FROM docs, UNNEST(range(1, len(cs) - 1)) AS t(i)
           WHERE len(cs) >= 3),
         s1 AS (SELECT doc_id,
           (c0 * 11400714819323198485::HUGEINT
            + c1 * 14029467366897019727::HUGEINT + c2)
             % 18446744073709551616::HUGEINT AS h0 FROM tri),
         s2 AS (SELECT doc_id,
           CASE WHEN x2 < 0 THEN CAST(x2 AS HUGEINT) + 18446744073709551616::HUGEINT
                ELSE CAST(x2 AS HUGEINT) END AS h1
           FROM (SELECT doc_id, xor(
             CAST(CASE WHEN h0 >= 9223372036854775808::HUGEINT
                  THEN h0 - 18446744073709551616::HUGEINT ELSE h0 END AS BIGINT),
             CAST(h0 // 1073741824 AS BIGINT)) AS x2 FROM s1)),
         s3 AS (SELECT doc_id,
           (((h1 % 4294967296) * 13787848793156543929::HUGEINT)
            + (((h1 // 4294967296) * 13787848793156543929::HUGEINT) % 4294967296)
              * 4294967296)
            % 18446744073709551616::HUGEINT AS h2 FROM s2),
         s4 AS (SELECT doc_id,
           CASE WHEN x4 < 0 THEN CAST(x4 AS HUGEINT) + 18446744073709551616::HUGEINT
                ELSE CAST(x4 AS HUGEINT) END AS h3
           FROM (SELECT doc_id, xor(
             CAST(CASE WHEN h2 >= 9223372036854775808::HUGEINT
                  THEN h2 - 18446744073709551616::HUGEINT ELSE h2 END AS BIGINT),
             CAST(h2 // 134217728 AS BIGINT)) AS x4 FROM s3)),
         s5 AS (SELECT doc_id,
           (((h3 % 4294967296) * 10723151780598845931::HUGEINT)
            + (((h3 // 4294967296) * 10723151780598845931::HUGEINT) % 4294967296)
              * 4294967296)
            % 18446744073709551616::HUGEINT AS h4 FROM s4),
         s6 AS (SELECT doc_id,
           CASE WHEN x6 < 0 THEN CAST(x6 AS HUGEINT) + 18446744073709551616::HUGEINT
                ELSE CAST(x6 AS HUGEINT) END AS h5
           FROM (SELECT doc_id, xor(
             CAST(CASE WHEN h4 >= 9223372036854775808::HUGEINT
                  THEN h4 - 18446744073709551616::HUGEINT ELSE h4 END AS BIGINT),
             CAST(h4 // 2147483648 AS BIGINT)) AS x6 FROM s5)),
         feats AS (SELECT doc_id,
           CAST((h5 // 2) % 64 AS INT) AS idx,
           CASE WHEN h5 % 2 = 0 THEN 1 ELSE -1 END AS sgn FROM s6),
         acc AS (SELECT doc_id, idx, CAST(SUM(sgn) AS DOUBLE) AS a
                 FROM feats GROUP BY 1, 2),
         nz AS (SELECT doc_id, idx, a FROM acc WHERE a <> 0),
         ss AS (SELECT doc_id, SUM(a * a) AS raw_ss, COUNT(*) AS nnz
                FROM nz GROUP BY 1),
         dig AS (SELECT nz.doc_id,
             SUM((nz.a * (1.0 / sqrt(ss.raw_ss))) * (nz.idx + 1)) AS d1,
             SUM(((nz.a * (1.0 / sqrt(ss.raw_ss))) * (nz.idx + 1)) * (nz.idx + 1)) AS d2
           FROM nz JOIN ss ON nz.doc_id = ss.doc_id GROUP BY 1)
         SELECT d.doc_id, CAST(64 AS BIGINT) AS dim,
           COALESCE(ss.nnz, 0) AS nnz,
           CAST(CASE WHEN ss.doc_id IS NULL THEN 0.0 ELSE 1.0 END AS DOUBLE)
             AS norm_sq,
           ROUND(CAST(COALESCE(dig.d1, 0.0) AS DOUBLE), 6) AS d1,
           ROUND(CAST(COALESCE(dig.d2, 0.0) AS DOUBLE), 6) AS d2
         FROM docs d
         LEFT JOIN ss ON d.doc_id = ss.doc_id
         LEFT JOIN dig ON d.doc_id = dig.doc_id""",
    "t19_zipf_vocab" ->
      raw"""WITH toks AS (
           SELECT lang,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
           FROM documents),
         tf AS (
           SELECT lang, term, COUNT(*) AS freq FROM toks GROUP BY 1, 2),
         stats AS (
           SELECT lang, COUNT(*) AS vocab_size,
             CAST(SUM(freq) AS BIGINT) AS total_tokens
           FROM tf GROUP BY 1),
         ranked AS (
           SELECT lang, freq, row_number() OVER
             (PARTITION BY lang ORDER BY freq DESC, term ASC) AS rnk
           FROM tf WHERE freq >= 2),
         pts AS (
           SELECT lang, ln(CAST(rnk AS DOUBLE)) AS x,
             ln(CAST(freq AS DOUBLE)) AS y
           FROM ranked WHERE rnk <= 100),
         suff AS (
           SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
           FROM pts GROUP BY 1),
         fit AS (
           SELECT lang, n,
             n * sxy - sx * sy AS dx,
             n * sxx - sx * sx AS vx,
             n * syy - sy * sy AS vy
           FROM suff)
         SELECT fit.lang, stats.vocab_size, stats.total_tokens,
           CAST(n AS BIGINT) AS fitted_terms,
           ROUND(CASE WHEN vx <> 0 THEN -(dx / vx) END, 6) AS zipf_alpha,
           ROUND(CASE WHEN vx <> 0 AND vy <> 0
             THEN (dx * dx) / (vx * vy) END, 6) AS fit_r2
         FROM fit JOIN stats ON fit.lang = stats.lang""",
    "t20_readability" ->
      raw"""WITH m AS (
           SELECT doc_id, lang,
             GREATEST(1, len(list_filter(
               regexp_split_to_array(text, '[.!?]+'),
               x -> trim(x) <> ''))) AS n_sentences,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
           FROM documents),
         f AS (
           SELECT doc_id, lang,
             CAST(n_sentences AS BIGINT) AS n_sentences,
             CAST(n_words AS BIGINT) AS n_words,
             CAST(n_syllables AS BIGINT) AS n_syllables,
             ROUND(206.835
               - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
               - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
               3) AS flesch
           FROM m)
         SELECT doc_id, lang, n_sentences, n_words, n_syllables, flesch,
           CASE WHEN ROUND(flesch, 9) >= 60.0 THEN 'easy'
                WHEN ROUND(flesch, 9) >= 30.0 THEN 'standard'
                ELSE 'difficult' END AS band
         FROM f""",
    // merge training unrolled in SQL — generated by Bpe.bpeOracleSql
    "t21_bpe_tokens" -> Bpe.bpeOracleSql(16),
    // t21's per-doc counts (the shared BPE CTE body) aggregated per
    // language; the same exact-sum-then-divide ratio arithmetic
    "t27_tokenizer_fertility" ->
      ("WITH " + Bpe.bpeOracleCtes(16) + raw""",
         perdoc AS (
           SELECT d.doc_id, COUNT(*) AS n_words,
             CAST(SUM(COALESCE(t.n_tok, 0)) AS BIGINT) AS n_bpe_tokens
           FROM docw d LEFT JOIN tok t ON t.word = d.w GROUP BY d.doc_id)
         SELECT doc.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_words) AS BIGINT) AS n_words,
           CAST(SUM(p.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
           CASE WHEN SUM(p.n_words) = 0 THEN NULL
                ELSE ROUND(CAST(SUM(p.n_bpe_tokens) AS DOUBLE)
                  / CAST(SUM(p.n_words) AS DOUBLE), 6) END AS fertility,
           CASE WHEN SUM(p.n_bpe_tokens) = 0 THEN NULL
                ELSE ROUND(CAST(SUM(doc.n_chars) AS DOUBLE)
                  / CAST(SUM(p.n_bpe_tokens) AS DOUBLE), 6) END
             AS chars_per_token
         FROM perdoc p JOIN documents doc ON p.doc_id = doc.doc_id
         GROUP BY doc.lang"""),
    // per-doc signals recomputed with the t2/t3 oracle formulas
    // (shared marker lists and qualityPpmSql, so the Spark and SQL
    // definitions cannot silently diverge); dup exposure via a
    // corpus-wide text-count join; all integer aggregates
    "t28_corpus_datasheet" ->
      (raw"""WITH t AS (
           SELECT doc_id, source, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         m AS (
           SELECT doc_id, source, text, len(toks) AS n_toks,
             len(list_filter(toks, x -> x IN $enL)) AS s_en,
             len(list_filter(toks, x -> x IN $frL)) AS s_fr,
             len(list_filter(toks, x -> x IN $esL)) AS s_es,
             len(list_filter(toks, x -> x IN $deL)) AS s_de,
             length(text) AS n_chars,
             """ + graft.functions.TextFunctions.qualityPpmSql + raw""" AS q
           FROM t),
         p AS (
           SELECT *, CASE
             WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
             WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
             WHEN s_es >= s_de THEN 'es'
             ELSE 'de' END AS pred
           FROM m),
         c AS (SELECT text, COUNT(*) AS n_copies FROM documents GROUP BY text),
         g AS (
           SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             CAST(SUM(CASE WHEN pred = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
             CAST(SUM(CASE WHEN pred = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
             CAST(SUM(CASE WHEN pred = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
             CAST(SUM(CASE WHEN pred = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
             CAST(SUM(q) AS BIGINT) AS sum_q,
             CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_docs
           FROM p JOIN c USING (text) GROUP BY source)
         SELECT source, n_docs, n_tokens, n_chars, n_en, n_fr, n_es, n_de,
           CAST(sum_q // n_docs AS BIGINT) AS avg_quality_ppm, dup_docs,
           CAST((1000000 * dup_docs) // n_docs AS BIGINT) AS dup_ppm
         FROM g"""),
    // the engine's exact PMI formula over the same whitespace tokens;
    // bigrams rebuilt positionally, unigram joins via split_part
    "t22_collocations" ->
      raw"""WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         uc AS (
           SELECT w, CAST(COUNT(*) AS BIGINT) AS wc
           FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
         nu AS (SELECT CAST(SUM(wc) AS BIGINT) AS nu FROM uc),
         bi AS (
           SELECT unnest(CASE WHEN len(toks) >= 2 THEN
               list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i + 1])
             ELSE [] END) AS bg
           FROM t),
         bc AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS n_pair
                FROM bi GROUP BY bg),
         nb AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS nb FROM bc),
         sc AS (
           SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
             n_pair,
             ln((CAST(n_pair AS DOUBLE) / nb)
               / ((CAST(u1.wc AS DOUBLE) / nu)
                  * (CAST(u2.wc AS DOUBLE) / nu))) AS pmi
           FROM bc
           JOIN uc u1 ON u1.w = split_part(bg, ' ', 1)
           JOIN uc u2 ON u2.w = split_part(bg, ' ', 2)
           CROSS JOIN nb CROSS JOIN nu
           WHERE n_pair >= 5)
         SELECT CAST(row_number() OVER
             (ORDER BY ROUND(pmi, 9) DESC, w1, w2) AS BIGINT) AS rank,
           w1, w2, n_pair, ROUND(pmi, 6) AS pmi
         FROM sc QUALIFY rank <= 30""",
    // gaps-and-islands phrase extraction, the same stopword literal,
    // degree/freq word scores, per-instance phrase score
    "t23_rake_keywords" ->
      raw"""WITH tok AS (
           SELECT d.doc_id, j.j AS pos, d.toks[j.j + 1] AS w
           FROM (SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                 FROM documents) d,
             LATERAL (SELECT unnest(range(0, len(d.toks))) AS j) j),
         fl AS (
           SELECT doc_id, pos, w,
             (w IN ('a','the','of','and','to','in','is','on','for','with',
                    'at','by','an','be','or','as','it','that','this','are'))
               AS stop
           FROM tok),
         isl AS (
           SELECT *, SUM(CASE WHEN stop THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos) AS island
           FROM fl),
         ph AS (
           SELECT doc_id, island,
             string_agg(w, ' ' ORDER BY pos) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS plen,
             list(w ORDER BY pos) AS ws
           FROM isl WHERE NOT stop GROUP BY doc_id, island),
         wst AS (
           SELECT w, CAST(SUM(plen) AS BIGINT) AS degree,
             CAST(COUNT(*) AS BIGINT) AS freq
           FROM (SELECT unnest(ws) AS w, plen FROM ph) GROUP BY w),
         sc AS (
           SELECT p.phrase, SUM(CAST(s.degree AS DOUBLE) / s.freq) AS tot
           FROM (SELECT phrase, unnest(ws) AS w FROM ph) p
           JOIN wst s ON s.w = p.w
           GROUP BY p.phrase),
         oc AS (
           SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
           FROM ph GROUP BY phrase)
         SELECT CAST(row_number() OVER
             (ORDER BY ROUND(sc.tot / oc.n_occurrences, 9) DESC, sc.phrase)
             AS BIGINT) AS rank,
           sc.phrase, oc.n_occurrences,
           ROUND(sc.tot / oc.n_occurrences, 6) AS score
         FROM sc JOIN oc USING (phrase)
         QUALIFY rank <= 30""",
    // same whitespace tokenizer; ratios divide exact integer sums
    "t24_lexical_diversity" ->
      raw"""WITH tok AS (
           SELECT doc_id, lang,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
           FROM documents),
         pdt AS (
           SELECT doc_id, lang, tok, COUNT(*) AS c
           FROM tok GROUP BY 1, 2, 3),
         pd AS (
           SELECT doc_id, lang, SUM(c) AS n_tokens, COUNT(*) AS n_types,
             SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax
           FROM pdt GROUP BY 1, 2)
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_types) AS BIGINT) AS total_types,
           CAST(SUM(n_hapax) AS BIGINT) AS total_hapax,
           ROUND(CAST(SUM(n_types) AS DOUBLE) / SUM(n_tokens), 6)
             AS type_token_ratio,
           ROUND(CAST(SUM(n_hapax) AS DOUBLE) / SUM(n_types), 6)
             AS hapax_ratio
         FROM pd GROUP BY lang""",
    // the same fixed-alphabet filter, exact-integer collision ppm
    // (floor division) and one log2 per group row
    "t25_char_entropy" ->
      raw"""WITH ch AS (
           SELECT doc_id, lang, source, t.c AS ch
           FROM documents, UNNEST(string_split(lower(text), '')) AS t(c)
           WHERE regexp_matches(t.c, '^[a-z0-9 ]$$')),
         cnt AS (
           SELECT doc_id, lang, source, ch, CAST(COUNT(*) AS BIGINT) AS c
           FROM ch GROUP BY 1, 2, 3, 4),
         doc AS (
           SELECT doc_id, lang, source, SUM(c) AS n,
             CAST(COUNT(*) AS BIGINT) AS k, SUM(c * c) AS c2
           FROM cnt GROUP BY 1, 2, 3),
         pd AS (
           SELECT lang, source, k, (c2 * 1000000) // (n * n) AS rr_ppm
           FROM doc)
         SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(*), 6)
             AS avg_distinct_chars,
           ROUND(CAST(SUM(rr_ppm) AS DOUBLE) / COUNT(*), 2)
             AS avg_collision_ppm,
           ROUND(-log2(CAST(SUM(rr_ppm) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * 1000000.0)), 6)
             AS renyi2_entropy_bits
         FROM pd GROUP BY 1, 2""",
    // t24's tokenization, HUGEINT moments, the identical closed form
    "t26_token_burstiness" ->
      raw"""WITH t AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
           FROM documents),
         cnt AS (
           SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM t GROUP BY 1, 2),
         byt AS (
           SELECT tok, SUM(CAST(c AS HUGEINT)) AS sc,
             SUM(CAST(c * c AS HUGEINT)) AS sc2,
             CAST(COUNT(*) AS BIGINT) AS df
           FROM cnt GROUP BY 1),
         rk AS (
           SELECT *, CAST(row_number() OVER (ORDER BY sc DESC, tok)
             AS BIGINT) AS rank
           FROM byt QUALIFY rank <= 20),
         n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
         SELECT rank, tok AS token, CAST(sc AS BIGINT) AS total_count,
           df AS doc_freq,
           ROUND((CAST(n_docs AS DOUBLE) * CAST(sc2 AS DOUBLE)
             - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
             / (CAST(n_docs AS DOUBLE) * CAST(sc AS DOUBLE)), 6) AS fano
         FROM rk CROSS JOIN n"""
  )
}
