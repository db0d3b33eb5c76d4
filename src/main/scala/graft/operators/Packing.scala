package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Sequence packing — assigning documents to fixed-capacity training
  * context windows ("sample packing"), the step between a cleaned
  * corpus and a token-efficient training batch.
  *
  * Deterministic contiguous packing per pack group: documents are
  * ordered by `doc_id` within a group (here `lang` — real pipelines
  * pack within a shard/topic so the window never spans the corpus),
  * and a document opens in the bin where its running token offset
  * lands: `bin_id = floor(tokens_before_doc / capacity)`. A document
  * crossing a capacity boundary stays in the bin it opened in
  * (streaming pack with spill), so bins can slightly overfill but
  * never split a document — the standard greedy-contiguous layout.
  *
  * Scale shape: one window per pack group (groups are the parallelism
  * unit; a 100 TB corpus packs thousands of shards independently), and
  * the bin stats are a second window over (group, bin). No global
  * ordering anywhere.
  */
object Packing {

  def sequencePack(docs: DataFrame, capacity: Int = 512,
      groupCol: String = "lang"): DataFrame = {
    val byGroup = Window.partitionBy(groupCol).orderBy("doc_id")
    val perBin = Window.partitionBy(col(groupCol), col("bin_id"))
    docs
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .withColumn("tokens_before",
        coalesce(sum("n_tokens").over(
          byGroup.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin_id", floor(col("tokens_before") / capacity))
      .select(
        col("doc_id"), col(groupCol), col("n_tokens"), col("bin_id"),
        sum("n_tokens").over(perBin).as("bin_fill"),
        count(lit(1)).over(perBin).as("n_docs_in_bin"))
  }

  /** Shared 31-bit LCG step — the ONE definition of the family's
    * deterministic sampling arithmetic (mirrored verbatim in each
    * DuckDB oracle string): reduce `id` below 2^31 BEFORE the
    * multiply — an id beyond ~8.4e9 (a realistic 100 TB corpus) would
    * overflow the Long product under ANSI mode; the reduced form
    * peaks at 2^31 × a, safely inside Long, and is bit-identical to
    * the unreduced form for ids < 2^31.
    */
  private def lcg(id: org.apache.spark.sql.Column, a: Long = 1103515245L,
      c: Long = 12345L): org.apache.spark.sql.Column =
    pmod(pmod(id, lit(2147483648L)) * a + c, lit(2147483648L))

  /** THE default per-stratum keep rates (percent) — shared by p2 and
    * p8's composition (and mirrored in both oracle strings).
    */
  val defaultStratumRates: Map[String, Int] = Map("en" -> 30)
  val defaultRatePct: Int = 60

  /** p2's admission predicate as one definition: LCG percentile of
    * the row id against the stratum's keep rate.
    */
  def lcgAdmitPct(id: org.apache.spark.sql.Column, rates: Map[String, Int],
      defaultRate: Int, stratumCol: String): org.apache.spark.sql.Column = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, r).otherwise(acc)
    }
    lcg(id) % 100 < rate
  }

  /** Deterministic stratified sampling: per-stratum keep rates applied
    * via an arithmetic hash of the row id (31-bit LCG), NOT `rand()` —
    * the sample is stable under reruns, retries and repartitioning
    * (a non-negotiable property for reproducible training corpora; a
    * rand()-based sample changes under speculative re-execution).
    * Pure integer arithmetic → bit-identical in any engine.
    *
    * Scale shape: a narrow per-row filter, no shuffle at all; the rate
    * lookup is a literal CASE over the stratum column.
    */
  def stratifiedSample(docs: DataFrame,
      rates: Map[String, Int] = defaultStratumRates,
      defaultRate: Int = defaultRatePct, stratumCol: String = "lang"): DataFrame =
    // keep every input column (the payload is the point of sampling);
    // callers project if they want a slimmer frame
    docs.filter(lcgAdmitPct(col("doc_id"), rates, defaultRate, stratumCol))

  /** Corpus mixture plan — the data-mixing step of a training
    * pipeline: given per-language token counts and target mixture
    * shares, compute each stratum's sampling rate against a global
    * token budget (here budget = half the corpus) and the token count
    * it will contribute. Two tiny aggregates + a broadcast of the
    * 1-row total; nothing fact-sized moves.
    */
  def mixturePlan(docs: DataFrame, budgetFrac: Double = 0.5,
      shares: Map[String, Double] = Map("en" -> 0.4),
      defaultShare: Double = 0.15): DataFrame = {
    val perLang = docs
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("lang_tokens"))
    val total = perLang.agg(sum("lang_tokens").as("total_tokens"))
    val share = shares.foldLeft(lit(defaultShare)) { case (acc, (k, v)) =>
      when(col("lang") === k, v).otherwise(acc)
    }
    perLang.crossJoin(broadcast(total))
      .withColumn("share", share)
      .withColumn("rate", round(
        least(lit(1.0),
          col("total_tokens") * budgetFrac * col("share") / col("lang_tokens")),
        6))
      .withColumn("planned_tokens",
        floor(col("rate") * col("lang_tokens")).cast("long"))
      .select("lang", "n_docs", "lang_tokens", "share", "rate", "planned_tokens")
  }

  /** Leakage-aware train/validation/test split + shard assignment. The
    * split key is the CONTENT fingerprint, not the row id: byte-identical
    * documents always land in the same split, so exact duplicates can
    * never straddle train and eval — the classic contamination leak of
    * id-hashed splits. Two independent 31-bit LCG streams on the reduced
    * fingerprint drive the 80/10/10 split and the shard (mod `nShards`);
    * pure integer arithmetic → stable under reruns/retries/speculative
    * re-execution and bit-identical in any engine. Narrow per-row map,
    * no shuffle at any scale.
    */
  def splitShards(docs: DataFrame, nShards: Int = 8): DataFrame = {
    val fp = fingerprint(trim(lower(col("text"))))
    val h1 = lcg(fp) % 100
    val h2 = lcg(fp, 1664525L, 1013904223L) % nShards
    docs.select(
      col("doc_id"),
      when(h1 < 80, "train").when(h1 < 90, "validation")
        .otherwise("test").as("split"),
      h2.cast("long").as("shard_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"))
  }

  /** Deterministic EPOCH SHUFFLE: a reproducible training order — each
    * doc's position is its rank by an LCG permutation hash within its
    * shard. Same inputs → same order under reruns/retries (a rand()
    * sort changes under speculative re-execution and is unreproducible
    * across epochs); varying the constants reshuffles per epoch. One
    * window per shard — shards are the parallelism unit, never a
    * global sort.
    */
  def epochShuffle(docs: DataFrame, nShards: Int = 8): DataFrame = {
    val h = lcg(col("doc_id"), 22695477L, 1L)
    val perShard = Window.partitionBy("shard_id")
      .orderBy(col("order_key").asc, col("doc_id").asc)
    docs
      .withColumn("shard_id", (h % nShards).cast("long"))
      .withColumn("order_key", h)
      .withColumn("pos", row_number().over(perShard).cast("long"))
      .select("doc_id", "shard_id", "order_key", "pos")
  }

  /** TOKEN-BUDGET selection — the "fill each source's budget with its
    * best documents" step of corpus curation: rank a source's docs by
    * (quality desc, doc_id asc) and keep the prefix whose RUNNING
    * token total fits the budget. Deterministic: integer quality + id
    * tie-break, stable under reruns/retries. Greedy-by-quality at a
    * fixed budget is the deterministic twin of importance sampling.
    *
    * 100 TB shape: a naive per-source running-sum window puts each
    * source's WHOLE corpus into one task. Instead the exact window
    * only ever sees budget-bounded candidates:
    *   1. approx_percentile splits each source's quality range into
    *      ~equi-depth buckets (splitter array, broadcast);
    *   2. per-(source, bucket) token sums — dim-sized — give each
    *      bucket's cumulative tokens-before in quality-DESC order;
    *      a doc can fit the budget only if its bucket's cum_before
    *      is still under it, so every later bucket is pruned;
    *   3. the exact running total runs over the survivors only —
    *      ≈ budget tokens' worth of docs plus one boundary bucket
    *      (n/nBuckets rows; raise nBuckets with SF to bound it).
    * Equal qualities share a bucket (bucket = #splitters ≤ quality,
    * monotone), so bucket-level cum is exactly consistent with the
    * doc-level (quality desc, doc_id) order.
    */
  def tokenBudgetSample(docs: DataFrame, budgetTokens: Long = 800L): DataFrame =
    budgetAdmit(qualityScored(docs), budgetTokens)

  /** p11: [[tokenBudgetSample]] with the budget measured in EXACT
    * corpus-trained BPE subword tokens ([[Bpe.bpeTokens]]) instead of
    * whitespace words — the unit a training-run token budget is
    * actually denominated in. Same quality-ranked greedy admission,
    * same bucket-pruned two-phase shape; only the count column (and
    * so the cut point) changes.
    */
  def bpeBudgetSample(docs: DataFrame, budgetTokens: Long = 4000L,
      nMerges: Int = 16): DataFrame = {
    val counts = Bpe.bpeTokens(docs, nMerges)
      .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens"))
    val scored = qualityScored(docs).drop("n_tokens")
      .join(counts, Seq("doc_id"))
      .select("doc_id", "source", "n_tokens", "quality_ppm")
    budgetAdmit(scored, budgetTokens)
  }

  /** Shared p6/p11 quality scoring: (doc_id, source, whitespace
    * n_tokens, quality_ppm). */
  private def qualityScored(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", tokens(lower(col("text"))))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("n_stop", markerCount(col("toks"), enMarkers))
      .withColumn("n_long", size(filter(col("toks"), t => length(t) > 5)))
      .select(col("doc_id"), col("source"),
        col("n_toks").cast("long").as("n_tokens"),
        qualityPpm.as("quality_ppm"))

  /** Shared p6/p11 greedy budget admission over a
    * (doc_id, source, n_tokens, quality_ppm) frame — the bucket-pruned
    * two-phase shape (see the p6 scaladoc above for the scale
    * argument).
    */
  private def budgetAdmit(scored: DataFrame, budgetTokens: Long): DataFrame = {
    val nBuckets = 32
    val probs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val splits = scored.groupBy("source").agg(
      expr(s"approx_percentile(quality_ppm, array(${probs.mkString(", ")}), 10000)")
        .as("qsplits"))
    val bucketed = scored.join(broadcast(splits), Seq("source"))
      .withColumn("qbucket",
        expr("aggregate(qsplits, 0, (acc, sp) -> acc + IF(sp <= CAST(quality_ppm AS DOUBLE), 1, 0))"))
      .drop("qsplits")
    // dim-sized (≤ sources × nBuckets rows) — the only frame the
    // per-source cumulative window ever sorts in full
    val wCum = Window.partitionBy("source").orderBy(col("qbucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val live = bucketed.groupBy("source", "qbucket")
      .agg(sum("n_tokens").as("btokens"))
      // <= not <: a doc fits iff its running total ≤ budget, and that
      // total ≥ its bucket's cum_before — so cum_before ≤ budget is
      // the exact safe prune (strict < would drop a zero-token doc
      // sitting exactly at the budget boundary)
      .withColumn("cum_before", coalesce(sum("btokens").over(wCum), lit(0L)))
      .filter(col("cum_before") <= budgetTokens)
      .select("source", "qbucket")
    val w = Window.partitionBy("source")
      .orderBy(col("quality_ppm").desc, col("doc_id").asc)
    bucketed.join(broadcast(live), Seq("source", "qbucket"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budgetTokens)
      .select("doc_id", "source", "n_tokens", "quality_ppm", "cum_tokens")
  }

  /** TEMPERATURE-based mixture selection — the multilingual-sampling
    * formula (weight ∝ tokens^α, α<1 upsamples small sources relative
    * to their share) applied per SOURCE, then materialized as a
    * deterministic per-doc admission decision. Unlike [[mixturePlan]]
    * (fixed target shares), the shares here are DERIVED from the
    * corpus itself: w_i = n_i^α / Σ n_j^α, planned_i = budget · w_i,
    * rate_i = min(1, planned_i / n_i). Doc admission reuses the p2
    * LCG arithmetic on the doc id at PPM granularity (rate·10^6 —
    * a whole-percent grid would silently zero any source whose rate
    * lands below 1%) — stable under reruns/retries, bit-identical in
    * any engine.
    *
    * Scale shape: per-source token counts are ONE aggregation with
    * map-side combine; the weight normalizer is a 1-row broadcast; the
    * per-doc decision is a broadcast join of the sources-sized rate
    * table + a narrow filter. Nothing fact-sized shuffles twice.
    * Weights round to 6 dp BEFORE deriving rates so every downstream
    * number is a pure function of decimal-exact inputs.
    */
  def temperatureMixture(docs: DataFrame, alpha: Double = 0.5,
      budgetFrac: Double = 0.5): DataFrame = {
    val scored = docs
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
    val perSource = scored
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("source_tokens"))
    val tot = perSource.agg(
      sum(pow(col("source_tokens").cast("double"), alpha)).as("__wtot"),
      sum(col("source_tokens")).as("__ttot"))
    val rates = perSource.crossJoin(broadcast(tot))
      .withColumn("weight",
        round(pow(col("source_tokens").cast("double"), alpha) / col("__wtot"), 6))
      .withColumn("rate", round(least(lit(1.0),
        col("__ttot").cast("double") * budgetFrac * col("weight")
          / col("source_tokens").cast("double")), 6))
      .select(col("source"), col("weight"), col("rate"))
    // rate is 6-dp-rounded, so rate·10^6 is integral up to FP noise —
    // round() recovers the exact integer in both engines
    val ppm = lcg(col("doc_id")) % 1000000
    scored
      .join(broadcast(rates), Seq("source"))
      .filter(ppm < round(col("rate") * 1000000).cast("long"))
      .select("doc_id", "source", "n_tokens", "weight", "rate")
  }

  /** END-TO-END corpus preparation — the three cleaning stages a
    * pretraining pipeline chains before packing, composed as ONE
    * dataflow (each stage is also a standalone registry operator, so
    * this entry proves they compose without driver-side glue):
    *  1. quality filter (t7's exact-integer Gopher/C4 rules),
    *  2. exact dedup over survivors (d1's content hash; the MIN doc_id
    *     per hash survives — dedup runs AFTER filtering so a
    *     high-quality copy can't be shadowed by a filtered-out twin),
    *  3. deterministic stratified sampling (p2's LCG admission on the
    *     doc id — en 30%, else 60%).
    *
    * Scale shape: stage 1 is a narrow filter (no shuffle); stage 2 is
    * one hash-keyed aggregate + a hash-keyed join back (d1's shape);
    * stage 3 is a narrow filter. One fact-sized shuffle total —
    * composing the stages does NOT multiply the shuffles.
    */
  def corpusPrep(docs: DataFrame): DataFrame = {
    val kept = docs
      .withColumn("__toks", tokens(lower(col("text"))))
      .withColumn("__n", size(col("__toks")))
      .withColumn("__sl", length(regexp_replace(col("text"), "\\s", "")))
      .withColumn("__stop", markerCount(col("__toks"), enMarkers))
      // t7's rule set, by THE shared definition — not a restated copy
      .filter(qualityReason(col("__n"), col("__sl"), col("__stop")).isNull)
      .withColumn("__key", sha2(lower(trim(col("text"))), 256))
    val canon = kept.groupBy("__key").agg(min("doc_id").as("__cid"))
    kept.join(canon, "__key")
      .filter(col("doc_id") === col("__cid"))
      // p2's admission, by the shared rate table
      .filter(lcgAdmitPct(col("doc_id"), defaultStratumRates,
        defaultRatePct, "lang"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("__n").cast("long").as("n_tokens"))
  }

  /** CURRICULUM staging: each doc gets a training PHASE from fixed
    * thresholds on the shared quality_ppm composite (phase 1 =
    * highest quality, trained first) plus a deterministic
    * within-phase order key from the family's LCG stream. Pure
    * per-row arithmetic — no shuffle, no window, no global sort: at
    * 100 TB every executor stamps its partition independently and the
    * epoch writer sorts within output shards by (phase, order_key),
    * never globally. Thresholds are FIXED cut points, not quantiles,
    * on purpose: quantile phases need a corpus-wide rank pass (p6's
    * machinery) and silently re-assign every doc when the corpus
    * grows; fixed cuts keep phase membership reproducible row-locally
    * across refreshes.
    */
  def curriculumPhases(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", tokens(lower(col("text"))))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("n_stop", markerCount(col("toks"), enMarkers))
      .withColumn("n_long", size(filter(col("toks"), t => length(t) > 5)))
      .select(col("doc_id"), qualityPpm.as("quality_ppm"))
      .withColumn("phase",
        when(col("quality_ppm") >= 700000L, 1L)
          .when(col("quality_ppm") >= 500000L, 2L)
          .when(col("quality_ppm") >= 300000L, 3L)
          .otherwise(4L))
      .withColumn("order_key", lcg(col("doc_id")))
      .select("doc_id", "quality_ppm", "phase", "order_key")

  /** LENGTH-BUCKETED batch assembly — sequence bucketing: docs group
    * into power-of-2 token-length buckets (pad-to-longest waste is
    * bounded at 50% inside a bucket), then spread across the bucket's
    * batches deterministically. The bucket id is INTEGER arithmetic
    * (`length(bin(n)) - 1`, i.e. floor(log2) with no float log that
    * could round differently across engines); batch count per bucket
    * comes from a #buckets-row broadcast aggregate (≤ ~40 rows for
    * any real corpus — token counts fit in 40 bits); assignment is
    * the family's LCG stream mod the bucket's batch count. No window,
    * no sort, no fact-sized shuffle beyond the bucket-count
    * aggregate: at 100 TB every executor stamps rows against the
    * broadcast count table. Exact-`batchSize` packing is a
    * shard-local concern at write time (sort within output shards by
    * (bucket, batch_id)); this operator fixes the REPRODUCIBLE
    * grouping decision.
    */
  def lengthBatches(docs: DataFrame, batchSize: Int = 8): DataFrame = {
    val bucketed = docs
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bucket", (length(bin(col("n_tokens"))) - 1).cast("long"))
    val counts = bucketed.groupBy("bucket").agg(count(lit(1)).as("__n"))
    bucketed.join(broadcast(counts), Seq("bucket"))
      .select(col("doc_id"), col("n_tokens"), col("bucket"),
        pmod(lcg(col("doc_id")),
          expr(s"(__n + ${batchSize - 1}) div $batchSize"))
          .cast("long").as("batch_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_sequence_packing" -> ((s, d) => sequencePack(Tables.documents(s, d))),
    "p2_stratified_sample" -> ((s, d) =>
      // the oracle pins this 4-column schema; the operator itself keeps
      // all input columns
      stratifiedSample(Tables.documents(s, d))
        .select("doc_id", "lang", "source", "n_chars")),
    "p3_mixture_plan" -> ((s, d) => mixturePlan(Tables.documents(s, d))),
    // p3's plan the responsible pipeline actually runs (round 17):
    // contaminated docs — any training doc sharing a 5-gram with the
    // d8 held-out set — are anti-joined OUT before the per-language
    // token counts, so the published mixture budgets CLEAN tokens.
    // One extra gram-keyed shuffle (d8's shape) + a doc-id anti-join;
    // the plan itself stays two tiny aggregates + a 1-row broadcast.
    "p17_decontaminated_mixture" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
      val eval = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      val contaminated = graft.operators.Dedup.decontaminate(corpus, eval)
        .select("doc_id")
      mixturePlan(corpus.join(contaminated, Seq("doc_id"), "left_anti"))
    }),
    // END-TO-END CORPUS FUNNEL (round 18): the whole curation
    // pipeline as ONE dataflow — decontaminate (d8's gate, %50 eval
    // split) → exact-dedup (d1/p8's keep-min-id-per-content-hash) →
    // quality filter (t7's shared rule set) → pack (p1's 512-token
    // bins) — read out as the stage funnel (docs/tokens surviving
    // each stage, bins at the end) every corpus release publishes
    // next to its datasheet. Each stage reuses THE shared definition
    // (decontaminate / sha2 canon / qualityReason / sequencePack),
    // so the funnel is the composition proof: the stages chain in
    // one DAG with no materialization between them. The per-stage
    // count rows each cost one aggregate over the stage frame — at
    // 100 TB the stage frames would be cached once; the counts are
    // report cost, not pipeline cost.
    "p18_corpus_funnel" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
      val eval = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      val contaminated = graft.operators.Dedup.decontaminate(corpus, eval)
        .select("doc_id")
      val clean = corpus.join(contaminated, Seq("doc_id"), "left_anti")
      val keyed = clean.withColumn("__key", sha2(lower(trim(col("text"))), 256))
      val deduped = keyed
        .join(keyed.groupBy("__key").agg(min("doc_id").as("__cid")), "__key")
        .filter(col("doc_id") === col("__cid"))
        .drop("__key", "__cid")
      val qual = deduped
        .withColumn("__toks", tokens(lower(col("text"))))
        .withColumn("__n", size(col("__toks")))
        .withColumn("__sl", length(regexp_replace(col("text"), "\\s", "")))
        .withColumn("__stop", markerCount(col("__toks"), enMarkers))
        .filter(qualityReason(col("__n"), col("__sl"), col("__stop")).isNull)
        .drop("__toks", "__n", "__sl", "__stop")
      val packed = sequencePack(qual, capacity = 512)
      def stage(id: Long, name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(size(tokens(col("text"))).cast("long")), lit(0L))
              .as("n_tokens"))
          .select(lit(id).as("stage_id"), lit(name).as("stage"),
            col("n_docs"), col("n_tokens"),
            lit(null).cast("long").as("n_bins"))
      stage(0L, "corpus", corpus)
        .unionByName(stage(1L, "decontaminated", clean))
        .unionByName(stage(2L, "deduped", deduped))
        .unionByName(stage(3L, "quality", qual))
        .unionByName(packed.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"),
            countDistinct(col("lang"), col("bin_id")).as("n_bins"))
          .select(lit(4L).as("stage_id"), lit("packed").as("stage"),
            col("n_docs"), col("n_tokens"), col("n_bins")))
    }),
    "p4_split_shards" -> ((s, d) => splitShards(Tables.documents(s, d))),
    "p5_epoch_shuffle" -> ((s, d) => epochShuffle(Tables.documents(s, d))),
    "p6_token_budget_sample" -> ((s, d) =>
      tokenBudgetSample(Tables.documents(s, d))),
    "p7_temperature_mixture" -> ((s, d) =>
      temperatureMixture(Tables.documents(s, d))),
    "p8_corpus_prep" -> ((s, d) => corpusPrep(Tables.documents(s, d))),
    "p9_curriculum_phases" -> ((s, d) =>
      curriculumPhases(Tables.documents(s, d))),
    "p10_length_batches" -> ((s, d) =>
      lengthBatches(Tables.documents(s, d))),
    // p6's greedy quality-ranked budget with the budget denominated
    // in EXACT corpus-trained BPE subword tokens (t21's tokenizer) —
    // the unit a real training-run budget is measured in
    "p11_bpe_budget_sample" -> ((s, d) =>
      bpeBudgetSample(Tables.documents(s, d))),
    // CORPUS SNAPSHOT DIFF — the "what changed between corpus v1 and
    // v2" audit every dataset release runs: doc_id-keyed FULL OUTER
    // join of two content-hashed versions (d7's deterministic split
    // convention synthesizes v1/v2 from the gate table, with every
    // 13th shared doc edited), each doc classified
    // added/removed/modified/unchanged. ONE id-keyed shuffle with
    // hash-only payloads — text never rides the join, so the diff of
    // two 100 TB snapshots moves hashes, not documents.
    "p12_corpus_diff" -> ((s, d) => corpusDiff(Tables.documents(s, d))),
    // SOFT DEDUP: instead of dropping near-duplicates, keep each doc
    // with probability 1/|its near-dup cluster| — the corpus-weighting
    // strategy that preserves content diversity while flattening
    // over-represented material. Cluster ids come from the SHARED d6
    // components (session-cached); sampling is the p4 LCG keyed by
    // doc_id against a per-cluster ppm threshold, so retries/epochs
    // reproduce the identical subset. Singletons always survive
    "p13_soft_dedup_sample" -> ((s, d) =>
      softDedupSample(DedupQueries.clusters(s, d))),
    // PER-SOURCE QUOTA: at most `cap` docs per provider, chosen by
    // the deterministic LCG permutation — the "no more than N from
    // source X" mixture contract, reproducible across retries. ONE
    // source-partitioned window at doc grain
    "p14_quota_sample" -> ((s, d) => quotaSample(Tables.documents(s, d))),
    // SOURCE-INTERLEAVED training order: the first `perSource` docs of
    // each provider (LCG-permuted — p14's admission) woven round-robin
    // into one deterministic global order, so no provider dominates
    // any prefix of an epoch. The global position window runs over the
    // ≤ perSource × |sources| admitted frame, never the corpus
    "p15_interleave_sources" -> ((s, d) =>
      interleaveSources(Tables.documents(s, d))),
    // PACKING-EFFICIENCY EVAL (s15's harness idea for p1): per
    // language, bin count, exact ppm average fill of the 512-token
    // capacity (floor division), the ≥90%-full bin share and p50/p90
    // fills — the wasted-compute readout a packing-parameter change is
    // gated on. Bins are p1's own output collapsed to bin grain;
    // percentiles ride the histogram-rank pass over the BIN frame
    "p16_pack_eval" -> ((s, d) => {
      // bin-grain frame pinned once — it feeds the aggregate AND the
      // percentile pass (no cross-branch subplan reuse in Spark)
      val bins = sequencePack(Tables.documents(s, d))
        .groupBy("lang", "bin_id").agg(max("bin_fill").as("fill"))
        .localCheckpoint()
      val agg = bins.groupBy("lang").agg(count(lit(1)).as("n_bins"),
        sum("fill").as("tot"),
        sum(when(col("fill") * 10L >= 512L * 9L, 1L).otherwise(0L))
          .as("n_full"))
      agg.join(Olap.exactPercentilesByGroup(bins, "lang", "fill",
          Seq(0.5, 0.9)), Seq("lang"))
        .select(col("lang"), col("n_bins"),
          expr("(tot * 1000000L) div (n_bins * 512L)").as("avg_fill_ppm"),
          round(col("n_full").cast("double") /
            col("n_bins").cast("double"), 6).as("full_bin_share"),
          round(col("pcts")(0), 6).as("p50_fill"),
          round(col("pcts")(1), 6).as("p90_fill"))
    })
  )

  /** See the p15 entry: per-source LCG rank admission, then one
    * bounded global window ((rank, source, doc) lexicographic) that
    * assigns the interleaved position.
    */
  def interleaveSources(docs: DataFrame, perSource: Long = 25L): DataFrame = {
    val ranked = docs.withColumn("__k", lcg(col("doc_id")))
      .withColumn("source_rank", row_number().over(
        Window.partitionBy("source").orderBy(col("__k"), col("doc_id")))
        .cast("long"))
      .filter(col("source_rank") <= perSource)
    ranked
      .withColumn("position", row_number().over(
        Window.orderBy(col("source_rank"), col("source"), col("doc_id")))
        .cast("long"))
      .select(col("position"), col("doc_id"), col("source"),
        col("source_rank"))
  }

  /** See the p14 entry: per-source admission by LCG-permutation rank.
    * A source with fewer than `cap` docs keeps them all; the window
    * input is doc-grain within a source partition (no global sort).
    */
  def quotaSample(docs: DataFrame, cap: Long = 10L): DataFrame =
    docs.withColumn("__k", lcg(col("doc_id")))
      .withColumn("quota_rank", row_number().over(
        Window.partitionBy("source").orderBy(col("__k"), col("doc_id")))
        .cast("long"))
      .filter(col("quota_rank") <= cap)
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("quota_rank"))

  /** See the p13 entry: `clusters` is (doc_id, component_id); keep a
    * doc iff its LCG sample key (ppm) falls under 10⁶ div cluster
    * size. One component-keyed size join; all integer arithmetic.
    */
  def softDedupSample(clusters: DataFrame): DataFrame = {
    val sizes = clusters.groupBy("component_id")
      .agg(count(lit(1)).as("cluster_size"))
    clusters.join(sizes, Seq("component_id"))
      .withColumn("weight_ppm", expr("1000000L div cluster_size"))
      .filter(pmod(lcg(col("doc_id")), lit(1000000L)) < col("weight_ppm"))
      .select(col("doc_id"), col("component_id"), col("cluster_size"),
        col("weight_ppm"))
  }

  /** See the p12 entry. `docs` stands in for both versions via
    * deterministic splits: v1 drops every 7th doc (deleted later),
    * v2 drops every 11th (not yet ingested) and edits every 13th.
    */
  def corpusDiff(docs: DataFrame): DataFrame = {
    val v1 = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      .select(col("doc_id"), col("source"),
        sha2(col("text"), 256).as("h1"))
    val v2 = docs.filter(pmod(col("doc_id"), lit(11)) =!= 0)
      .withColumn("text2",
        when(pmod(col("doc_id"), lit(13)) === 0,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      .select(col("doc_id"), col("source").as("source2"),
        sha2(col("text2"), 256).as("h2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("source"), col("source2")).as("source"),
        when(col("h2").isNull, "removed")
          .when(col("h1").isNull, "added")
          .when(col("h1") === col("h2"), "unchanged")
          .otherwise("modified").as("status"))
  }

  val oracles: Map[String, String] = Map(
    "p1_sequence_packing" ->
      raw"""WITH t AS (
           SELECT doc_id, lang,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
           FROM t),
         b AS (SELECT *, CAST(tokens_before // 512 AS BIGINT) AS bin_id FROM c)
         SELECT doc_id, lang, n_tokens, bin_id,
           CAST(SUM(n_tokens) OVER (PARTITION BY lang, bin_id) AS BIGINT) AS bin_fill,
           COUNT(*) OVER (PARTITION BY lang, bin_id) AS n_docs_in_bin
         FROM b""",
    "p2_stratified_sample" ->
      s"""SELECT doc_id, lang, source, n_chars
         FROM documents
         WHERE (((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 100
               < (CASE WHEN lang = 'en' THEN ${defaultStratumRates("en")}
                       ELSE $defaultRatePct END)""",
    // d8's gram derivation names the contaminated doc ids; p3's plan
    // arithmetic runs over the surviving (clean) corpus only
    "p17_decontaminated_mixture" ->
      raw"""WITH t AS (
           SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         g AS (
           SELECT DISTINCT doc_id, gram FROM (
             SELECT doc_id,
               unnest(CASE WHEN len(toks) >= 5 THEN
                 list_transform(range(1, len(toks) - 3),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                        toks[i+3] || ' ' || toks[i+4])
               ELSE [] END) AS gram
             FROM t)),
         e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
         bad AS (
           SELECT DISTINCT doc_id FROM g
           WHERE doc_id % 50 <> 0 AND gram IN (SELECT gram FROM e)),
         clean AS (
           SELECT * FROM documents
           WHERE doc_id % 50 <> 0
             AND doc_id NOT IN (SELECT doc_id FROM bad)),
         per_lang AS (
           SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
               AS lang_tokens
           FROM clean GROUP BY lang),
         tot AS (SELECT CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens FROM per_lang),
         r AS (
           SELECT lang, n_docs, lang_tokens,
             CAST(CASE WHEN lang = 'en' THEN 0.4 ELSE 0.15 END AS DOUBLE) AS share,
             ROUND(LEAST(1.0,
               CAST(total_tokens AS DOUBLE) * 0.5
                 * CAST(CASE WHEN lang = 'en' THEN 0.4 ELSE 0.15 END AS DOUBLE)
                 / CAST(lang_tokens AS DOUBLE)), 6) AS rate
           FROM per_lang, tot)
         SELECT lang, n_docs, lang_tokens, share, rate,
           CAST(FLOOR(rate * CAST(lang_tokens AS DOUBLE)) AS BIGINT) AS planned_tokens
         FROM r""",
    "p3_mixture_plan" ->
      raw"""WITH per_lang AS (
           SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
               AS lang_tokens
           FROM documents GROUP BY lang),
         tot AS (SELECT CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens FROM per_lang),
         -- all-DOUBLE arithmetic in Spark's association order (DuckDB
         -- would otherwise compute in exact DECIMAL and the 6th rounded
         -- digit could differ from IEEE doubles)
         r AS (
           SELECT lang, n_docs, lang_tokens,
             CAST(CASE WHEN lang = 'en' THEN 0.4 ELSE 0.15 END AS DOUBLE) AS share,
             ROUND(LEAST(1.0,
               CAST(total_tokens AS DOUBLE) * 0.5
                 * CAST(CASE WHEN lang = 'en' THEN 0.4 ELSE 0.15 END AS DOUBLE)
                 / CAST(lang_tokens AS DOUBLE)), 6) AS rate
           FROM per_lang, tot)
         SELECT lang, n_docs, lang_tokens, share, rate,
           CAST(FLOOR(rate * CAST(lang_tokens AS DOUBLE)) AS BIGINT) AS planned_tokens
         FROM r""",
    "p4_split_shards" ->
      raw"""WITH f AS (
           SELECT doc_id, text,
             CAST(COALESCE(list_sum(list_transform(range(1, length(t) + 1),
               i -> i * ord(substring(t, CAST(i AS INT), 1)))), 0) AS BIGINT) AS fp0
           FROM (SELECT doc_id, text, trim(lower(text)) AS t FROM documents)),
         h AS (
           SELECT doc_id, text,
             ((fp0 % 2147483648) + 2147483648) % 2147483648 AS fp
           FROM f)
         SELECT doc_id,
           CASE WHEN ((fp * 1103515245 + 12345) % 2147483648) % 100 < 80 THEN 'train'
                WHEN ((fp * 1103515245 + 12345) % 2147483648) % 100 < 90 THEN 'validation'
                ELSE 'test' END AS split,
           CAST(((fp * 1664525 + 1013904223) % 2147483648) % 8 AS BIGINT) AS shard_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
         FROM h""",
    "p5_epoch_shuffle" ->
      """WITH h AS (
           SELECT doc_id,
             ((doc_id % 2147483648) * 22695477 + 1) % 2147483648 AS hk
           FROM documents)
         SELECT doc_id, CAST(hk % 8 AS BIGINT) AS shard_id,
           CAST(hk AS BIGINT) AS order_key,
           CAST(row_number() OVER (PARTITION BY hk % 8
             ORDER BY hk ASC, doc_id ASC) AS BIGINT) AS pos
         FROM h""",
    // same integer quality composite as t3's oracle; the running
    // per-source token total mirrors the window
    "p6_token_budget_sample" ->
      raw"""WITH t AS (
           SELECT doc_id, source,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         m AS (
           SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
             ${graft.functions.TextFunctions.qualityPpmSql} AS quality_ppm
           FROM t),
         r AS (
           SELECT doc_id, source, n_tokens, quality_ppm,
             SUM(n_tokens) OVER (PARTITION BY source
               ORDER BY quality_ppm DESC, doc_id ASC) AS cum_tokens
           FROM m)
         SELECT doc_id, source, n_tokens, quality_ppm,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
         FROM r WHERE cum_tokens <= 800""",
    // p6's admission window with exact BPE counts from the shared t21
    // training unroll (Bpe.bpeOracleCtes)
    "p11_bpe_budget_sample" ->
      ("WITH " + graft.operators.Bpe.bpeOracleCtes(16) + raw""",
         bc AS (
           SELECT d.doc_id, CAST(SUM(COALESCE(t.n_tok, 0)) AS BIGINT) AS n_tokens
           FROM docw d LEFT JOIN tok t ON t.word = d.w GROUP BY d.doc_id),
         t2 AS (
           SELECT doc_id, source,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         m AS (
           SELECT t2.doc_id, t2.source, bc.n_tokens,
             ${graft.functions.TextFunctions.qualityPpmSql} AS quality_ppm
           FROM t2 JOIN bc ON bc.doc_id = t2.doc_id),
         r AS (
           SELECT doc_id, source, n_tokens, quality_ppm,
             SUM(n_tokens) OVER (PARTITION BY source
               ORDER BY quality_ppm DESC, doc_id ASC) AS cum_tokens
           FROM m)
         SELECT doc_id, source, n_tokens, quality_ppm,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
         FROM r WHERE cum_tokens <= 4000"""),
    // the v1/v2 synth splits + sha256 comparison re-derived verbatim
    "p12_corpus_diff" ->
      """WITH v1 AS (
           SELECT doc_id, source, sha256(text) AS h1
           FROM documents WHERE doc_id % 7 <> 0),
         v2 AS (
           SELECT doc_id, source AS source2,
             sha256(CASE WHEN doc_id % 13 = 0
               THEN text || ' rev2' ELSE text END) AS h2
           FROM documents WHERE doc_id % 11 <> 0)
         SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
           COALESCE(v1.source, v2.source2) AS source,
           CASE WHEN v2.h2 IS NULL THEN 'removed'
                WHEN v1.h1 IS NULL THEN 'added'
                WHEN v1.h1 = v2.h2 THEN 'unchanged'
                ELSE 'modified' END AS status
         FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id""",
    // temperature weights w ~ tokens^0.5, rates from the ROUNDED
    // weight, p2's LCG admission — all-DOUBLE arithmetic in Spark's
    // association order (see p3's note on DuckDB DECIMAL literals)
    "p7_temperature_mixture" ->
      raw"""WITH t AS (
           SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
           FROM documents),
         per_source AS (
           SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS source_tokens
           FROM t GROUP BY source),
         tot AS (
           SELECT SUM(pow(CAST(source_tokens AS DOUBLE), 0.5)) AS wtot,
             CAST(SUM(source_tokens) AS BIGINT) AS ttot
           FROM per_source),
         r AS (
           SELECT source,
             ROUND(pow(CAST(source_tokens AS DOUBLE), 0.5) / wtot, 6) AS weight,
             source_tokens
           FROM per_source, tot),
         rates AS (
           SELECT source, weight,
             ROUND(LEAST(1.0,
               CAST((SELECT ttot FROM tot) AS DOUBLE) * 0.5 * weight
                 / CAST(source_tokens AS DOUBLE)), 6) AS rate
           FROM r)
         SELECT t.doc_id, t.source, t.n_tokens, rates.weight, rates.rate
         FROM t JOIN rates ON t.source = rates.source
         WHERE (((t.doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 1000000
               < CAST(ROUND(rate * 1000000) AS BIGINT)""",
    // t7's keep rule -> d1's min-id-per-hash dedup -> p2's LCG sample,
    // verbatim compositions of those oracles
    // each stage recomputed with ITS family's oracle formula (d8's
    // gram gate, the sha256 canon, t7's rule constants, p1's
    // cumulative-sum bins) — the funnel is the composition, verbatim
    "p18_corpus_funnel" ->
      raw"""WITH t AS (
           SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         g AS (
           SELECT DISTINCT doc_id, gram FROM (
             SELECT doc_id,
               unnest(CASE WHEN len(toks) >= 5 THEN
                 list_transform(range(1, len(toks) - 3),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                        toks[i+3] || ' ' || toks[i+4])
               ELSE [] END) AS gram
             FROM t)),
         e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
         bad AS (
           SELECT DISTINCT doc_id FROM g
           WHERE doc_id % 50 <> 0 AND gram IN (SELECT gram FROM e)),
         corpus AS (SELECT * FROM documents WHERE doc_id % 50 <> 0),
         clean AS (
           SELECT * FROM corpus
           WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
         keyed AS (SELECT *, sha256(lower(trim(text))) AS key FROM clean),
         canon AS (SELECT key, MIN(doc_id) AS cid FROM keyed GROUP BY key),
         dedup AS (
           SELECT k.* FROM keyed k
           JOIN canon c ON k.key = c.key AND k.doc_id = c.cid),
         qm AS (
           SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
             length(regexp_replace(text, '\s', '', 'g')) AS sum_len
           FROM dedup),
         q AS (
           SELECT d.* FROM dedup d JOIN qm USING (doc_id)
           WHERE len(qm.toks) >= $qualityMinTokens
             AND len(qm.toks) <= $qualityMaxTokens
             AND qm.sum_len >= len(qm.toks) * $qualityMinMeanTokLen
             AND qm.sum_len <= len(qm.toks) * $qualityMaxMeanTokLen
             AND len(list_filter(qm.toks, x -> x IN ${graft.functions.TextFunctions.sqlInList(enMarkers)})) >= $qualityMinStopwords),
         nq AS (
           SELECT doc_id, lang,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n
           FROM q),
         pb AS (
           SELECT lang, doc_id, n,
             COALESCE(SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512
               AS bin_id
           FROM nq)
         SELECT CAST(0 AS BIGINT) AS stage_id, 'corpus' AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(len(regexp_split_to_array(trim(text), '\s+'))), 0) AS BIGINT) AS n_tokens,
           CAST(NULL AS BIGINT) AS n_bins FROM corpus
         UNION ALL
         SELECT 1, 'decontaminated', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(len(regexp_split_to_array(trim(text), '\s+'))), 0) AS BIGINT),
           NULL FROM clean
         UNION ALL
         SELECT 2, 'deduped', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(len(regexp_split_to_array(trim(text), '\s+'))), 0) AS BIGINT),
           NULL FROM dedup
         UNION ALL
         SELECT 3, 'quality', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(len(regexp_split_to_array(trim(text), '\s+'))), 0) AS BIGINT),
           NULL FROM q
         UNION ALL
         SELECT 4, 'packed', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n), 0) AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT DISTINCT lang, bin_id FROM pb)) FROM pb""",
    "p8_corpus_prep" ->
      raw"""WITH t AS (
           SELECT doc_id, lang, source, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
             length(regexp_replace(text, '\s', '', 'g')) AS sum_len
           FROM documents),
         kept AS (
           SELECT doc_id, lang, source, text, len(toks) AS n_toks
           FROM t
           WHERE len(toks) >= $qualityMinTokens AND len(toks) <= $qualityMaxTokens
             AND sum_len >= len(toks) * $qualityMinMeanTokLen
             AND sum_len <= len(toks) * $qualityMaxMeanTokLen
             AND len(list_filter(toks, x -> x IN ${graft.functions.TextFunctions.sqlInList(enMarkers)})) >= $qualityMinStopwords),
         keyed AS (
           SELECT *, sha256(lower(trim(text))) AS key FROM kept),
         canon AS (
           SELECT key, MIN(doc_id) AS cid FROM keyed GROUP BY key)
         SELECT k.doc_id, k.lang, k.source, CAST(k.n_toks AS BIGINT) AS n_tokens
         FROM keyed k JOIN canon c ON k.key = c.key
         WHERE k.doc_id = c.cid
           AND (((k.doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 100
               < (CASE WHEN k.lang = 'en' THEN ${defaultStratumRates("en")}
                       ELSE $defaultRatePct END)""",
    // fixed quality_ppm cut points + the shared LCG stream, verbatim
    "p9_curriculum_phases" ->
      raw"""WITH t AS (
           SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         m AS (
           SELECT doc_id,
             ${graft.functions.TextFunctions.qualityPpmSql} AS quality_ppm
           FROM t)
         SELECT doc_id, quality_ppm,
           CAST(CASE WHEN quality_ppm >= 700000 THEN 1
                     WHEN quality_ppm >= 500000 THEN 2
                     WHEN quality_ppm >= 300000 THEN 3
                     ELSE 4 END AS BIGINT) AS phase,
           ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS order_key
         FROM m""",
    // integer-exact pow2 bucket (length(bin(n))-1, no float log2),
    // batch = LCG mod per-bucket batch count ((n+7)//8)
    "p10_length_batches" ->
      raw"""WITH t AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
           FROM documents),
         b AS (
           SELECT doc_id, n_tokens,
             CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS bucket
           FROM t),
         c AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket)
         SELECT b.doc_id, b.n_tokens, b.bucket,
           CAST((((b.doc_id % 2147483648) * 1103515245 + 12345) % 2147483648)
                % ((c.n + 7) // 8) AS BIGINT) AS batch_id
         FROM b JOIN c ON b.bucket = c.bucket""",
    // d6's recursive component derivation + per-cluster ppm threshold
    // + the p4 LCG keep test, all integer arithmetic
    "p13_soft_dedup_sample" ->
      raw"""WITH RECURSIVE t AS (
           SELECT doc_id, lang, n_chars,
             list_distinct(list_transform(
               range(1, greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')), 1)),
               i -> regexp_split_to_array(trim(lower(text)), '\s+')[i] || ' ' ||
                    regexp_split_to_array(trim(lower(text)), '\s+')[i + 1])) AS shingles
           FROM documents),
         p AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM t a JOIN t b
             ON a.lang = b.lang AND abs(a.n_chars - b.n_chars) <= 3 AND a.doc_id < b.doc_id
           WHERE ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
                 len(list_distinct(list_concat(a.shingles, b.shingles))), 6) >= 0.05),
         e AS (SELECT doc_a AS s, doc_b AS d FROM p
               UNION SELECT doc_b, doc_a FROM p),
         reach AS (
           SELECT doc_id AS id, doc_id AS r FROM documents
           UNION
           SELECT reach.id, e.d FROM reach JOIN e ON reach.r = e.s),
         comp AS (SELECT id AS doc_id, MIN(r) AS component_id FROM reach GROUP BY id),
         sz AS (SELECT component_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
                FROM comp GROUP BY component_id)
         SELECT c.doc_id, c.component_id, s.cluster_size,
           CAST(1000000 // s.cluster_size AS BIGINT) AS weight_ppm
         FROM comp c JOIN sz s USING (component_id)
         WHERE (((c.doc_id % 2147483648) * 1103515245 + 12345) % 2147483648)
               % 1000000 < 1000000 // s.cluster_size""",
    // the same 31-bit LCG permutation, ranked per source
    "p14_quota_sample" ->
      """WITH h AS (
           SELECT doc_id, source, n_chars,
             ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS hk
           FROM documents)
         SELECT doc_id, source, n_chars, CAST(rn AS BIGINT) AS quota_rank
         FROM (SELECT *, row_number() OVER (PARTITION BY source
                 ORDER BY hk, doc_id) AS rn
               FROM h)
         WHERE rn <= 10""",
    // the same LCG admission, then the (rank, source, doc) weave
    "p15_interleave_sources" ->
      """WITH h AS (
           SELECT doc_id, source,
             ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS hk
           FROM documents),
         r AS (
           SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY hk, doc_id) AS BIGINT) AS source_rank
           FROM h QUALIFY source_rank <= 25)
         SELECT CAST(row_number() OVER
             (ORDER BY source_rank, source, doc_id) AS BIGINT) AS position,
           doc_id, source, source_rank
         FROM r""",
    // p1's bin derivation collapsed to bin grain; integer 90% test
    // (fill·10 ≥ 512·9), ppm floor division, quantile_cont parity
    "p16_pack_eval" ->
      raw"""WITH t AS (
           SELECT doc_id, lang,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
           FROM documents),
         c AS (
           SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS tokens_before
           FROM t),
         b AS (SELECT *, CAST(tokens_before // 512 AS BIGINT) AS bin_id
           FROM c),
         bins AS (
           SELECT lang, bin_id, SUM(n_tokens) AS fill
           FROM b GROUP BY 1, 2),
         ag AS (
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_bins,
             SUM(fill) AS tot,
             SUM(CASE WHEN fill * 10 >= 512 * 9 THEN 1 ELSE 0 END) AS n_full
           FROM bins GROUP BY 1)
         SELECT lang, n_bins,
           CAST((tot * 1000000) // (n_bins * 512) AS BIGINT) AS avg_fill_ppm,
           ROUND(CAST(n_full AS DOUBLE) / CAST(n_bins AS DOUBLE), 6)
             AS full_bin_share,
           (SELECT ROUND(quantile_cont(fill, 0.5), 6) FROM bins x
             WHERE x.lang = ag.lang) AS p50_fill,
           (SELECT ROUND(quantile_cont(fill, 0.9), 6) FROM bins x
             WHERE x.lang = ag.lang) AS p90_fill
         FROM ag"""
  )
}
