package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** REAL byte-pair-encoding tokenizer trained on the corpus (SURVEY.md
  * §2, t21) — the upgrade the t6 estimator column stood in for: token
  * budgets (p6/p7) computed against an actual learned subword
  * vocabulary instead of a regex proxy.
  *
  * DETERMINISTIC BY CONSTRUCTION, which is what makes it
  * oracle-expressible: merge training runs on INTEGER pair counts
  * (weighted by word frequency, overlapping positions counted), picks
  * each round's pair by (count DESC, left ASC, right ASC) — a total
  * order, no RNG, no hash — and applies it LEFT-TO-RIGHT
  * NON-OVERLAPPING ("aaa" + (a,a) → [aa, a]). The DuckDB oracle
  * re-derives every round: pair counts from the symbol table, the
  * argmax, and the greedy application via a gaps-and-islands
  * selection (consecutive match runs keep even offsets — exactly the
  * left-to-right scan), unrolled `nMerges` times by
  * [[bpeOracleSql]].
  *
  * Scale shape: training runs on the (word, count) DICTIONARY, which
  * is vocabulary-bounded — it grows with the language, not the corpus
  * — so the dictionary collect is a control read like the k-means
  * codebooks (assignToCentroids' argument), and the merge loop is
  * driver-side integer work over Σ|word| symbols. This is how
  * production BPE trainers work too: corpus-scale work is exactly ONE
  * word-count aggregation; everything after runs on counts. The
  * corpus-scale APPLICATION is a broadcast join of the tokenized
  * dictionary onto the exploded token stream — one fact-sized
  * aggregate, no per-row subword loop.
  */
object Bpe {

  /** Left-to-right non-overlapping single-merge application. */
  def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train `nMerges` merges on a (word, count) dictionary; returns the
    * ordered merge list and the per-word token count under the final
    * vocabulary. Stops early if no pairs remain (every word fully
    * merged) — the SQL unroll's no-op rounds are then vacuous.
    */
  def trainMerges(wordCounts: Seq[(String, Long)], nMerges: Int)
      : (Seq[(String, String)], Map[String, Int]) = {
    var seqs: Seq[(String, Vector[String], Long)] =
      wordCounts.map { case (w, c) => (w, w.map(_.toString).toVector, c) }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((_, syms, c) <- seqs; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + c
      }
      if (counts.isEmpty) done = true
      else {
        // total order: count desc, then (left, right) lexicographic asc
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        seqs = seqs.map { case (w, syms, c) =>
          (w, applyMerge(syms, best._1, best._2), c) }
        k += 1
      }
    }
    (merges.result(), seqs.map { case (w, syms, _) => w -> syms.length }.toMap)
  }

  /** Driver-collect bound for the training dictionary (r20 verdict
    * #3: this was the one data-plane-growing collect in the tree with
    * no guard — vocabulary grows with the language via Heaps' law,
    * ~10⁸ distinct tokens at web scale, and the silent failure mode
    * was an opaque driver OOM). Overridable per call; the default
    * comfortably covers real-language vocabularies after a min-count
    * prune (production BPE trainers prune before the merge loop).
    */
  val defaultMaxVocab: Int = 4_000_000

  /** The (word, count) dictionary — a vocabulary-bounded control
    * read (the k-means-codebook convention), shared by
    * [[bpeTokens]] and [[mergeTable]] so the tokenization convention
    * cannot drift between them.
    *
    * `minCount` > 1 prunes rare words BEFORE the collect (the
    * production-trainer move; the merge loop then runs on the pruned
    * dictionary). `maxVocab` is the loud guard (d4's
    * `maxBandPopulation` convention): the collect is bounded by
    * `limit(maxVocab + 1)` — no extra counting pass — and one row
    * past the bound fails with the knobs named instead of an opaque
    * driver OOM.
    */
  private def wordCounts(docs: DataFrame, minCount: Long = 1L,
      maxVocab: Int = defaultMaxVocab): Seq[(String, Long)] = {
    val agg = docs.select(explode(tokens(lower(col("text")))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val pruned = if (minCount > 1L) agg.filter(col("cnt") >= minCount) else agg
    val rows = pruned.limit(maxVocab + 1).collect()
    if (rows.length > maxVocab) throw new IllegalStateException(
      s"BPE training dictionary exceeds maxVocab=$maxVocab distinct words " +
        s"(minCount=$minCount): raise minCount to prune rare words before " +
        "the driver collect, or raise maxVocab if the driver has the memory")
    rows.map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
  }

  /** t21: per-doc word and BPE-token counts under a corpus-trained
    * `nMerges`-merge vocabulary.
    *
    * `minCount` = 1 (the registry/oracle setting) keeps the original
    * path byte-for-byte: train on the full dictionary, broadcast the
    * trained per-word token counts. `minCount` > 1 (the 100 TB
    * setting) trains the MERGES on the pruned dictionary only, then
    * tokenizes the full vocabulary DISTRIBUTEDLY (per-word merge
    * application over the distinct-words frame — vocabulary-grain,
    * the codec-loop convention), so rare words still get exact token
    * counts without ever riding a driver collect. BpeSpec pins that
    * on the gate corpus the two paths agree row-for-row (the pruned
    * dictionary there learns the identical merge table).
    */
  def bpeTokens(docs: DataFrame, nMerges: Int = 16,
      minCount: Long = 1L, maxVocab: Int = defaultMaxVocab): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(col("doc_id"),
      explode(tokens(lower(col("text")))).as("w"))
    val dict: DataFrame = if (minCount <= 1L) {
      val (_, tokCount) =
        trainMerges(wordCounts(docs, minCount, maxVocab), nMerges)
      tokCount.toSeq.toDF("w", "n_tok")
    } else {
      val (merges, _) =
        trainMerges(wordCounts(docs, minCount, maxVocab), nMerges)
      val mergeList = merges.toIndexedSeq
      import spark.implicits._
      words.select("w").distinct().as[String].mapPartitions { it =>
        it.map { w =>
          var syms = w.map(_.toString).toVector
          mergeList.foreach { case (a, b) => syms = applyMerge(syms, a, b) }
          (w, syms.length)
        }
      }.toDF("w", "n_tok")
    }
    // broadcast only the driver-sized dict (minCount ≤ 1: trained
    // counts already collected above). The minCount > 1 dict is the
    // FULL distinct vocabulary — unbounded at scale — and a broadcast
    // hint would collect it right back to the driver (ADVICE r21 #1),
    // recreating the failure wordCounts' guard exists to prevent;
    // that side joins distributed (vocabulary-grain shuffle).
    val dictSide = if (minCount <= 1L) broadcast(dict) else dict
    words
      .join(dictSide, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_tok")).cast("long").as("n_bpe_tokens"))
  }

  /** The learned merge table as a DataFrame (rank, left, right) — the
    * persistable artifact a serving tokenizer loads (spec-exercised
    * against the hand-derived fixture merges). */
  def mergeTable(docs: DataFrame, nMerges: Int = 16,
      minCount: Long = 1L, maxVocab: Int = defaultMaxVocab): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, _) =
      trainMerges(wordCounts(docs, minCount, maxVocab), nMerges)
    merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r) }.toDF("rank", "left", "right")
  }

  /** The t21 oracle: merge training UNROLLED `nMerges` times in SQL.
    * Each round is five CTEs — weighted pair counts, the (count DESC,
    * left, right) argmax, match marking, the gaps-and-islands greedy
    * selection (even offsets within each consecutive-match run ≡ the
    * left-to-right scan), and the rebuilt symbol table — followed by
    * the per-word token count joined back onto the exploded docs.
    * `MATERIALIZED` hints stop DuckDB inlining each round's CTE into
    * its three consumers (3^n plan blowup otherwise). An empty argmax
    * round (corpus fully merged) degrades to a no-op, matching the
    * trainer's early stop.
    */
  def bpeOracleSql(nMerges: Int = 16): String =
    // LEFT JOIN + COALESCE: the degenerate empty word (a
    // whitespace-only doc) has zero symbols so it never reaches `tok`,
    // but the engine's dictionary carries it with n_tok = 0 — the
    // outer join keeps both engines at (n_words = 1, n_bpe_tokens = 0)
    // instead of the oracle silently dropping the doc's row
    "WITH " + bpeOracleCtes(nMerges) + raw"""
SELECT d.doc_id, COUNT(*) AS n_words,
  CAST(SUM(COALESCE(t.n_tok, 0)) AS BIGINT) AS n_bpe_tokens
FROM docw d LEFT JOIN tok t ON t.word = d.w GROUP BY d.doc_id"""

  /** The reusable CTE body of [[bpeOracleSql]] — training unroll +
    * `tok` (per-word token count) + `docw` (exploded doc words) —
    * so consumers of exact BPE counts (t21, p11) share one
    * derivation. */
  def bpeOracleCtes(nMerges: Int = 16): String = {
    val head = raw"""words AS MATERIALIZED (
  SELECT w AS word, COUNT(*) AS cnt FROM (
    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
    FROM documents) GROUP BY w),
sym0 AS MATERIALIZED (
  SELECT word, cnt, CAST(t.pos AS BIGINT) AS pos,
    substr(word, CAST(t.pos AS INT), 1) AS s
  FROM words, LATERAL (SELECT unnest(generate_series(1, length(word))) AS pos) t)"""
    val blocks = (1 to nMerges).map { i =>
      val p = i - 1
      s"""
pc$i AS MATERIALIZED (
  SELECT a.s AS l, b.s AS r, SUM(a.cnt) AS c
  FROM sym$p a JOIN sym$p b ON b.word = a.word AND b.pos = a.pos + 1
  GROUP BY a.s, b.s),
best$i AS (SELECT l, r FROM pc$i ORDER BY c DESC, l ASC, r ASC LIMIT 1),
mk$i AS MATERIALIZED (
  SELECT word, cnt, pos, s,
    COALESCE(s = (SELECT l FROM best$i)
      AND lead(s) OVER (PARTITION BY word ORDER BY pos) = (SELECT r FROM best$i),
      false) AS m
  FROM sym$p),
isl$i AS MATERIALIZED (
  SELECT word, cnt, pos, s, m,
    CASE WHEN m THEN pos - row_number() OVER (PARTITION BY word, m ORDER BY pos) END AS isl
  FROM mk$i),
sel$i AS MATERIALIZED (
  SELECT word, cnt, pos, s,
    COALESCE(m AND (pos - MIN(pos) OVER (PARTITION BY word, isl)) % 2 = 0, false) AS sel
  FROM isl$i),
sym$i AS MATERIALIZED (
  SELECT word, cnt, CAST(row_number() OVER (PARTITION BY word ORDER BY pos) AS BIGINT) AS pos, s
  FROM (
    SELECT c.word, c.cnt, c.pos,
      CASE WHEN c.sel THEN c.s || (SELECT r FROM best$i) ELSE c.s END AS s
    FROM sel$i c
    LEFT JOIN sel$i prev ON prev.word = c.word AND prev.pos = c.pos - 1
    WHERE NOT COALESCE(prev.sel, false)))"""
    }.mkString(",")
    val tail = raw"""
tok AS (SELECT word, COUNT(*) AS n_tok FROM sym$nMerges GROUP BY word),
docw AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents)"""
    head + "," + blocks + "," + tail
  }
}
