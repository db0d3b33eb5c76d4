package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.tokens
import graft.functions.TopKAggregate.topkByScore

/** Full-text + hybrid retrieval (SURVEY.md §2.C/E extensions): the
  * search stack a corpus-curation pipeline runs against its own data —
  * "find the docs most like this probe" drives decontamination review,
  * quality auditing, targeted sampling and RAG eval-set construction.
  *
  * - [[bm25TopK]]: Okapi BM25 (the Lucene `k1`/`b` variant) with the
  *   corpus itself supplying the query docs. Postings and document
  *   frequencies are term-keyed aggregates — the same vocabulary-
  *   bounded shuffle shape as t9/t11 (and it REUSES their exact
  *   whitespace tokenization, so one tokenizer governs the whole text
  *   family). The query term set is tiny → broadcast; candidate
  *   generation is the postings⋈query-terms equi-join on the term key,
  *   never a scan of non-matching docs.
  * - [[hybridRrf]]: reciprocal-rank fusion (Cormack et al., SIGIR'09)
  *   of the BM25 list and the exact-cosine vector list — the standard
  *   lexical+semantic hybrid. RRF needs only each system's RANKS, so
  *   the fusion input is two (q_id, doc_id, rank) lists of depth × |Q|
  *   rows — trivially broadcastable at any corpus size; all the heavy
  *   lifting stays inside the two retrievers.
  *
  * Every arithmetic step (idf, length norm, 1/(60+rank)) is plain
  * deterministic double math over engine-independent integers, so both
  * entries carry full DuckDB oracles — rank keys round to 9 dp for
  * cross-engine FP-tie parity, the t11 convention.
  *
  * 100 TB notes: BM25 cost is Σ df(term) over query terms — stopword
  * terms touch every posting list. Production would prune low-idf
  * query terms (or go impact-ordered/WAND); the blocking here is
  * already per-term, so that pruning is a filter on the broadcast side,
  * not a plan change. The df/avgdl statistics are one vocabulary-keyed
  * aggregate + one 1-row aggregate — both reusable across queries (in
  * an index build they'd be materialized once).
  */
object Retrieval {

  /** BM25 top-k: score docs against each query doc's distinct-term
    * set; `k1`/`b` are the standard Okapi constants, idf the Lucene
    * `ln(1 + (N - df + .5)/(df + .5))` form (always positive — raw
    * Robertson idf goes negative on >half-corpus terms and breaks the
    * "more matches ≥ better" invariant).
    */
  def bm25TopK(docs: DataFrame, k: Int = 5, nQueries: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val t = docs.select(col("doc_id"), tokens(lower(col("text"))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("term"))
    // postings: one row per (doc, term) with tf and the doc length —
    // the term-keyed fact table every retrieval query probes
    val postings = t.groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"), first("dl").as("dl"))
    val dfreq = postings.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    // corpus statistics: two 1-row aggregates, broadcast
    val stats = docs.select(col("doc_id"), size(tokens(lower(col("text")))).as("dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
    // query term sets: nQueries docs' distinct terms — tiny, broadcast
    val qterms = docs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_id"),
        explode(array_distinct(tokens(lower(col("text"))))).as("term"))
    val scored = postings.join(dfreq, "term")
      .join(broadcast(qterms), "term")
      .filter(col("doc_id") =!= col("q_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("part", col("idf") * col("tf") * (lit(k1) + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("q_id", "doc_id")
      .agg(sum("part").as("score"))
    scored
      .groupBy("q_id")
      .agg(topkByScore(round(col("score"), 9), col("score"), col("doc_id"), k).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.id").as("doc_id"), round(col("s.score"), 6).as("bm25"))
  }

  /** Reciprocal-rank fusion of BM25 (lexical) and exact-cosine
    * (semantic) top-`depth` lists: rrf = Σ 1/(60 + rank) over the
    * lists containing the doc, re-ranked to the final top-k. Rank
    * positions use each retriever's own deterministic tie-break, and
    * 60 is the Cormack constant. `vec_id` is the embedding row of the
    * same corpus document (`doc_id`-aligned in the testdata).
    */
  def hybridRrf(docs: DataFrame, emb: DataFrame, k: Int = 5,
      depth: Int = 20, nQueries: Int = 5, rrfK: Int = 60): DataFrame = {
    val lex = bm25TopK(docs, k = depth, nQueries = nQueries)
      .select(col("q_id"), col("doc_id"), col("rank").as("lex_rank"))
    val sem = Similarity.bruteForceTopK(emb, k = depth, nQueries = nQueries)
      .select(col("q_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("sem_rank"))
    // the fused lists are depth × |Q| rows each — driver-trivial;
    // full outer: a doc needs to appear in only ONE list to score
    val fused = lex.join(sem, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(rrfK) + col("sem_rank")), lit(0.0)))
    fused
      .groupBy("q_id")
      .agg(topkByScore(round(col("rrf"), 9), col("rrf"), col("doc_id"), k).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.id").as("doc_id"), round(col("s.score"), 6).as("rrf_score"))
  }

  /** Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty,
    * SIGIR'01) — the other classic lexical ranker next to BM25, and
    * the one with a probabilistic reading (log p(q|d) under a
    * document language model smoothed toward the corpus model).
    *
    * Computed in the SPARSE decomposition, so only matching postings
    * pay work (the dense sum touches every (query-term, doc) pair):
    *
    *   score(q,d) = Σ_{w∈q∩d} ln(1 + tf(w,d) / (μ·p(w|C)))
    *              + |q| · ln(μ / (dl + μ))
    *
    * with p(w|C) = cf(w)/|C| — RANK-EQUIVALENT to the dense
    * Σ_{w∈q} ln((tf + μ·p)/(dl + μ)): it drops only the
    * query-constant Σ_{w∈q} ln(p(w|C)), which shifts every candidate
    * of a query by the same amount (the spec pins the exact identity
    * against a dense Scala reference). Candidates
    * are docs sharing ≥1 query term, t18's postings⋈qterms shape; the
    * cf table is the same vocabulary-bounded aggregate as df. All
    * doubles are plain deterministic math over engine-independent
    * integer counts; rank keys round to 9 dp (the t11 convention).
    */
  def qlmTopK(docs: DataFrame, k: Int = 5, nQueries: Int = 5,
      mu: Double = 300.0): DataFrame = {
    val t = docs.select(col("doc_id"), tokens(lower(col("text"))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("term"))
    val postings = t.groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"), first("dl").as("dl"))
    // collection frequencies + the 1-row corpus token total
    val cfreq = t.groupBy("term").agg(count(lit(1)).cast("double").as("cf"))
    val total = t.agg(count(lit(1)).cast("double").as("n_total"))
    val qterms = docs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_id"),
        explode(array_distinct(tokens(lower(col("text"))))).as("term"))
    val qsize = qterms.groupBy("q_id")
      .agg(count(lit(1)).cast("double").as("q_len"))
    val scored = postings.join(cfreq, "term")
      .join(broadcast(qterms), "term")
      .filter(col("doc_id") =!= col("q_id"))
      .crossJoin(broadcast(total))
      .groupBy("q_id", "doc_id")
      .agg(sum(log(lit(1.0) +
          col("tf") * col("n_total") / (lit(mu) * col("cf")))).as("match_part"),
        first("dl").as("dl"))
      .join(broadcast(qsize), "q_id")
      .withColumn("score", col("match_part") +
        col("q_len") * log(lit(mu) / (col("dl") + lit(mu))))
    scored
      .groupBy("q_id")
      .agg(topkByScore(round(col("score"), 9), col("score"), col("doc_id"), k).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.id").as("doc_id"), round(col("s.score"), 6).as("qlm"))
  }
}

object RetrievalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t18_bm25_topk" -> ((s, d) => Retrieval.bm25TopK(Tables.documents(s, d))),
    "s10_hybrid_rrf" -> ((s, d) =>
      Retrieval.hybridRrf(Tables.documents(s, d), Tables.embeddings(s, d))),
    "t29_qlm_topk" -> ((s, d) => Retrieval.qlmTopK(Tables.documents(s, d)))
  )

  // shared CTE prefix: tokenization identical to t9/t11's oracles
  private val bm25Cte =
    raw"""t AS (
           SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         post AS (
           SELECT doc_id, term, COUNT(*) AS tf,
             ANY_VALUE(dl) AS dl
           FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
                   unnest(toks) AS term FROM t)
           GROUP BY doc_id, term),
         dfq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM post GROUP BY term),
         stats AS (
           SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             AVG(CAST(len(toks) AS DOUBLE)) AS avgdl FROM t),
         qterms AS (
           SELECT doc_id AS q_id, unnest(list_distinct(toks)) AS term
           FROM t WHERE doc_id < 5),
         bm AS (
           SELECT q.q_id, p.doc_id,
             SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * p.tf * 2.2
                 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl))) AS score
           FROM post p JOIN dfq d USING (term)
                JOIN qterms q USING (term)
                CROSS JOIN stats s
           WHERE p.doc_id <> q.q_id
           GROUP BY q.q_id, p.doc_id)"""

  val oracles: Map[String, String] = Map(
    // constants inlined: k1+1 = 2.2, 1-b = 0.25, k1 = 1.2, b = 0.75
    "t18_bm25_topk" ->
      raw"""WITH $bm25Cte,
         ranked AS (
           SELECT q_id, doc_id, score,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY ROUND(score, 9) DESC, doc_id ASC) AS BIGINT) AS rank
           FROM bm)
         SELECT q_id, rank, doc_id, ROUND(score, 6) AS bm25
         FROM ranked WHERE rank <= 5""",
    "s10_hybrid_rrf" ->
      raw"""WITH $bm25Cte,
         lex AS (
           SELECT q_id, doc_id,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY ROUND(score, 9) DESC, doc_id ASC) AS BIGINT) AS lex_rank
           FROM bm QUALIFY lex_rank <= 20),
         e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         n AS (
           SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
           FROM e),
         pairs AS (
           SELECT q.vec_id AS q_id, c.vec_id AS doc_id,
             list_sum(list_transform(list_zip(c.v, q.v), s -> s[1] * s[2]))
               / (c.nrm * q.nrm) AS cos
           FROM n c JOIN n q ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
         sem AS (
           SELECT q_id, doc_id,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY ROUND(cos, 9) DESC, doc_id ASC) AS BIGINT) AS sem_rank
           FROM pairs QUALIFY sem_rank <= 20),
         fused AS (
           SELECT COALESCE(lex.q_id, sem.q_id) AS q_id,
             COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             COALESCE(1.0 / (60 + lex.lex_rank), 0.0)
               + COALESCE(1.0 / (60 + sem.sem_rank), 0.0) AS rrf
           FROM lex FULL OUTER JOIN sem
             ON lex.q_id = sem.q_id AND lex.doc_id = sem.doc_id),
         ranked AS (
           SELECT q_id, doc_id, rrf,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY ROUND(rrf, 9) DESC, doc_id ASC) AS BIGINT) AS rank
           FROM fused)
         SELECT q_id, rank, doc_id, ROUND(rrf, 6) AS rrf_score
         FROM ranked WHERE rank <= 5""",
    // the sparse Dirichlet decomposition verbatim (μ = 300); cf and
    // the corpus token total replace t18's df/avgdl statistics
    "t29_qlm_topk" ->
      raw"""WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         post AS (
           SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf,
             ANY_VALUE(dl) AS dl
           FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
                   unnest(toks) AS term FROM t)
           GROUP BY doc_id, term),
         cfq AS (
           SELECT term, CAST(SUM(tf) AS DOUBLE) AS cf FROM post GROUP BY term),
         tot AS (SELECT CAST(SUM(tf) AS DOUBLE) AS n_total FROM post),
         qterms AS (
           SELECT doc_id AS q_id, unnest(list_distinct(toks)) AS term
           FROM t WHERE doc_id < 5),
         qsize AS (
           SELECT q_id, CAST(COUNT(*) AS DOUBLE) AS q_len
           FROM qterms GROUP BY q_id),
         cand AS (
           SELECT q.q_id, p.doc_id,
             SUM(ln(1.0 + p.tf * s.n_total / (300.0 * c.cf))) AS match_part,
             ANY_VALUE(p.dl) AS dl
           FROM post p JOIN cfq c USING (term)
                JOIN qterms q USING (term)
                CROSS JOIN tot s
           WHERE p.doc_id <> q.q_id
           GROUP BY q.q_id, p.doc_id),
         qlms AS (
           SELECT c.q_id, c.doc_id,
             c.match_part + z.q_len * ln(300.0 / (c.dl + 300.0)) AS score
           FROM cand c JOIN qsize z USING (q_id)),
         ranked AS (
           SELECT q_id, doc_id, score,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY ROUND(score, 9) DESC, doc_id ASC) AS BIGINT) AS rank
           FROM qlms)
         SELECT q_id, rank, doc_id, ROUND(score, 6) AS qlm
         FROM ranked WHERE rank <= 5"""
  )
}
