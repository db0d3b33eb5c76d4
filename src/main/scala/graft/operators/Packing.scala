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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_sequence_packing" -> ((s, d) => sequencePack(Tables.documents(s, d)))
  )

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
         FROM b"""
  )
}
