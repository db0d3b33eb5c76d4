package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Measure spec for a generic incremental materialized view — the
  * r17-verdict unification of the two house MV contracts (h9's
  * signed-grain sum/count fold, h24's append-only bitmap-distinct
  * fold) into one API a user points at any star query.
  */
sealed trait MvMeasure { def name: String }

/** Additive measure: stored partial = Σ expr·weight. Retraction folds
  * exactly through weight = −1 (pass the ORIGINAL, un-negated rows).
  * FP discipline: prefer exact integer/decimal `expr` (e.g. cents) —
  * stored partials must re-aggregate bit-identically in any order.
  */
final case class MvSum(name: String, expr: Column) extends MvMeasure

/** Signed row count: stored partial = Σ weight — subtracts under
  * retraction, so a fully retracted group cancels to zero (and its
  * MV row is dropped, see [[MvFold.fold]]).
  */
final case class MvCount(name: String) extends MvMeasure

/** EXACT distinct count via a stored per-group bitmap (h24's trick:
  * counts don't decompose over set union, bitmaps do — new = old OR
  * delta). APPEND-ONLY: set union is idempotent and monotone, so a
  * bitmap cannot retract; [[MvFold.fold]] refuses `retract = true`
  * when a bitmap measure is present. Deletions need the signed-grain
  * path (an [[MvSum]]/[[MvCount]] MV at (group, member) grain).
  */
final case class MvBitmapDistinct(name: String, expr: Column,
    maxId: Int) extends MvMeasure

/** Generic incremental-MV maintenance over any star query:
  * {{{
  *   val mv0 = MvFold.build(facts, Seq("k1", "k2"), measures)
  *   val mv1 = MvFold.fold(mv0, newBatch, Seq("k1", "k2"), measures)
  *   val mv2 = MvFold.fold(mv1, badRows, keys, measures, retract = true)
  *   MvFold.read(mv2, keys, measures)   // finalized readout
  * }}}
  *
  * RETRACTION MATRIX (the contract the spec pins):
  *   - [[MvSum]]    — retracts exactly (signed partial).
  *   - [[MvCount]]  — retracts exactly (signed row weight).
  *   - [[MvBitmapDistinct]] — REFUSES retraction loudly (monotone).
  *   - a group whose signed row count cancels to 0 is DROPPED from
  *     the stored MV (a full retraction leaves no ghost row — and
  *     every additive partial of such a group is provably 0 too,
  *     since the same rows entered and left).
  *
  * Scale shape: only the delta pays a fact-side shuffle (one
  * hash-aggregate with map-side combine at MV grain); the stored MV
  * re-aggregates at its own bounded grain. At 100 TB this is the
  * difference between shuffling a day's ingest and recomputing the
  * historical table. The hidden `__mv_n` column carries the signed
  * row count for the zero-drop rule regardless of which measures the
  * caller asked for; [[read]] strips it.
  */
object MvFold {

  private def partialAggs(measures: Seq[MvMeasure], weight: Column): Seq[Column] =
    measures.map {
      case MvSum(n, e) => sum(e * weight).as(n)
      case MvCount(n)  => sum(weight).as(n)
      case MvBitmapDistinct(n, e, m) =>
        graft.functions.BitmapDistinctAggregate.bitmapBuild(e, m).as(n)
    } :+ sum(weight).as("__mv_n")

  private def mergeAggs(measures: Seq[MvMeasure]): Seq[Column] =
    measures.map {
      case MvSum(n, _)  => sum(col(n)).as(n)
      case MvCount(n)   => sum(col(n)).as(n)
      case MvBitmapDistinct(n, _, m) =>
        graft.functions.BitmapDistinctAggregate.bitmapMerge(col(n), m).as(n)
    } :+ sum(col("__mv_n")).as("__mv_n")

  private def checkNames(keys: Seq[String], measures: Seq[MvMeasure]): Unit = {
    val names = measures.map(_.name)
    require(names.distinct == names, s"duplicate measure names: $names")
    require(!names.contains("__mv_n") && !keys.contains("__mv_n"),
      "__mv_n is reserved")
    val clash = names.intersect(keys)
    require(clash.isEmpty,
      s"measure names collide with grouping keys: $clash — the MV frame " +
        "would carry duplicate columns and fail ambiguously downstream")
  }

  /** Verify that a stored MV frame carries EXACTLY the requested
    * contract — keys ++ measure names ++ `__mv_n`, nothing missing and
    * nothing extra — and report the actual mismatch instead of letting
    * unionByName (fold) or an unresolved-column lookup (merge/read)
    * die opaquely downstream. Shared by [[fold]] and the durable-store
    * readers (`readMvFoldStore` / `compactMvStore`), whose parquet
    * schema is whatever the directory happens to hold.
    */
  private[graft] def checkMvSchema(actual: Seq[String], keys: Seq[String],
      measures: Seq[MvMeasure], what: String): Unit = {
    val expected = (keys ++ measures.map(_.name) :+ "__mv_n")
    val missing = expected.filterNot(actual.contains)
    val extra = actual.filterNot(expected.contains)
    require(missing.isEmpty && extra.isEmpty,
      s"$what does not match the requested MV contract " +
        s"(keys=$keys, measures=${measures.map(_.name)})" +
        (if (missing.nonEmpty) s"; missing columns: $missing" else "") +
        (if (extra.nonEmpty) s"; unexpected columns: $extra" else "") +
        " — an MV's key/measure set is fixed at build; every fold and " +
        "read must pass the same keys and measures")
  }

  /** Build the stored MV at `keys` grain from a fact frame. ONE
    * hash-aggregate (map-side combine); partials stay raw — rounding
    * belongs in the caller's readout, never in stored state.
    */
  def build(facts: DataFrame, keys: Seq[String],
      measures: Seq[MvMeasure]): DataFrame = {
    checkNames(keys, measures)
    val aggs = partialAggs(measures, lit(1L))
    facts.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Build batch partials with a PER-ROW signed weight (+1 insert /
    * −1 retraction; rows carry their ORIGINAL, un-negated values —
    * the weight signs the partials, [[MvSum]]/[[MvCount]]'s
    * exact-retraction contract applied inside one batch). This is the
    * streaming-retraction primitive (st42): a micro-batch mixing
    * inserts and corrections folds into a durable store exactly,
    * because the signed partials stay additive and groups whose row
    * count cancels vanish at [[merge]]. Bitmap measures are refused
    * (set union is monotone — see [[fold]]'s retraction matrix).
    */
  def buildSigned(facts: DataFrame, keys: Seq[String],
      measures: Seq[MvMeasure], weight: Column): DataFrame = {
    checkNames(keys, measures)
    require(!measures.exists(_.isInstanceOf[MvBitmapDistinct]),
      "bitmap-distinct measures cannot retract (set union is monotone); " +
        "signed streams need MvSum/MvCount measures — deletions against " +
        "a bitmap store need the h9 signed-grain path")
    val aggs = partialAggs(measures, weight)
    facts.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a delta batch into a stored MV. `retract = true` removes
    * the batch's ORIGINAL rows (weight −1 on every signed partial);
    * refused when a bitmap measure is present (monotone — see the
    * retraction matrix above). Groups whose signed row count cancels
    * to zero are dropped.
    */
  def fold(mv: DataFrame, delta: DataFrame, keys: Seq[String],
      measures: Seq[MvMeasure], retract: Boolean = false): DataFrame = {
    checkNames(keys, measures)
    require(!(retract && measures.exists(_.isInstanceOf[MvBitmapDistinct])),
      "bitmap-distinct measures cannot retract (set union is monotone); " +
        "deletions need the signed-grain path — an MvSum/MvCount MV at " +
        "(group, member) grain, h9's contract")
    // an MV's measure set is fixed at build: folding with a DIFFERENT
    // set would die inside unionByName with an opaque unresolved-column
    // error — refuse upfront with the actual contract (self-review r18).
    // The check is SYMMETRIC (ADVICE r18): an MV built with MORE
    // measures than the fold requests fails just as opaquely (deltaMv
    // lacks the stored extras), so extra columns are refused too.
    checkMvSchema(mv.columns, keys, measures, "stored MV")
    val w = lit(if (retract) -1L else 1L)
    val deltaAggs = partialAggs(measures, w)
    val deltaMv = delta.groupBy(keys.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    merge(mv.unionByName(deltaMv), keys, measures)
  }

  /** Merge a frame of stored PARTIALS (any number of per-batch or
    * per-shard MV fragments stacked as rows) back to one row per
    * group — the re-aggregation half of [[fold]], public so durable
    * stores can stack idempotent batch partials and read them off
    * with one bounded aggregate (see `streamMvFoldToParquet`).
    * Zero-drop applies: groups whose signed counts cancel vanish.
    */
  def merge(partials: DataFrame, keys: Seq[String],
      measures: Seq[MvMeasure]): DataFrame = {
    checkNames(keys, measures)
    val merged = mergeAggs(measures)
    partials.groupBy(keys.map(col): _*)
      .agg(merged.head, merged.tail: _*)
      .filter(col("__mv_n") =!= 0)
  }

  /** Finalized readout: keys + each measure (bitmaps read off as
    * their exact cardinality), the hidden row count stripped.
    */
  def read(mv: DataFrame, keys: Seq[String],
      measures: Seq[MvMeasure]): DataFrame = {
    val outs = keys.map(col) ++ measures.map {
      case MvBitmapDistinct(n, _, _) =>
        graft.functions.BitmapDistinctAggregate
          .bitmapCardinality(col(n)).as(n)
      case m => col(m.name)
    }
    mv.select(outs: _*)
  }

  // ------------------------------------------------------------------
  // Histogram-quantile MV — the THIRD point in the retraction matrix:
  // a mergeable AND retractable quantile store. Quantiles don't
  // decompose over union (like distinct counts), but equi-width
  // bucket COUNTS do — and unlike bitmaps they also decompose over
  // set difference, so this MV folds and retracts exactly. Stored at
  // (keys, bucket) grain via the signed-count machinery above; the
  // readout is an exact integer rank-walk (no FP anywhere), accurate
  // to one bucket width. Scale shape: the fact side pays ONE shuffle
  // to the bounded (keys × buckets) grain; readout windows run over
  // MV rows only, never facts.
  // ------------------------------------------------------------------

  private[graft] val bucketCol = "__mv_bucket"

  /** Merge a frame of stored HISTOGRAM partials (per-batch/per-shard
    * (keys, bucket)-grain signed counts stacked as rows) back to one
    * row per (keys, bucket) — [[merge]] at the histogram grain, public
    * for durable quantile stores (see `streamHistMvToParquet`).
    */
  def mergeHist(partials: DataFrame, keys: Seq[String]): DataFrame =
    merge(partials, keys :+ bucketCol, Nil)

  private def checkHist(lo: Long, hi: Long, buckets: Int): Long = {
    require(buckets > 0 && hi > lo, s"bad histogram domain [$lo,$hi)/$buckets")
    require((hi - lo) % buckets == 0,
      s"(hi - lo) = ${hi - lo} must divide evenly into $buckets buckets " +
        "so bucket edges stay exact integers (the oracle-parity rule)")
    require(hi - lo <= (1L << 52),
      "domain width must stay below 2^52 so the bucket division is " +
        "exact in double (in-domain values; out-of-range ones clamp)")
    (hi - lo) / buckets
  }

  /** Equi-width bucket of `value` over [lo, hi); out-of-range values
    * clamp to the edge buckets (a quantile answer saturated at the
    * domain edge beats a dropped row). NULL values fail LOUDLY
    * (ADVICE r18): a silent null bucket row would both pollute the
    * store and sort differently across engines (Spark windows put
    * nulls first, DuckDB last), shifting every cumulative rank — the
    * caller must clean or impute nulls before building the MV.
    */
  private def histBucket(value: Column, lo: Long, hi: Long,
      buckets: Int): Column = {
    val width = (hi - lo) / buckets
    val bucket = least(lit(buckets - 1), greatest(lit(0),
      floor((value - lit(lo)) / lit(width)).cast("int")))
    // assert_true returns NULL when the predicate holds and throws
    // (with the message) otherwise, so the `when` collapses to
    // `bucket` on every valid row at codegen speed
    when(assert_true(value.isNotNull,
      lit("MvFold histogram MV: NULL measure value — quantile buckets " +
        "require non-null integer values (filter or impute nulls " +
        "before buildHist/foldHist; a silent null bucket would shift " +
        "every quantile)")).isNull, bucket)
  }

  /** Build a quantile MV: signed bucket counts at (keys, bucket)
    * grain. `value` must be integer-typed (the cents convention) and
    * NON-NULL — null values fail the build loudly, see [[histBucket]].
    */
  def buildHist(facts: DataFrame, keys: Seq[String], value: Column,
      lo: Long, hi: Long, buckets: Int): DataFrame = {
    checkHist(lo, hi, buckets)
    build(facts.withColumn(bucketCol, histBucket(value, lo, hi, buckets)),
      keys :+ bucketCol, Nil)
  }

  /** [[buildHist]] with a PER-ROW signed weight — the streaming-
    * retraction primitive on the quantile plane (st43): a correction
    * micro-batch's bucket counts land NEGATIVE and cancel exactly at
    * the merge (bucket assignment is deterministic integer math, so
    * the retraction row hits the same bucket its insert did).
    */
  def buildHistSigned(facts: DataFrame, keys: Seq[String], value: Column,
      lo: Long, hi: Long, buckets: Int, weight: Column): DataFrame = {
    checkHist(lo, hi, buckets)
    buildSigned(facts.withColumn(bucketCol, histBucket(value, lo, hi, buckets)),
      keys :+ bucketCol, Nil, weight)
  }

  /** Fold (or with `retract = true` remove) a delta batch's bucket
    * counts. Fully-cancelled buckets drop via the zero-drop rule.
    */
  def foldHist(mv: DataFrame, delta: DataFrame, keys: Seq[String],
      value: Column, lo: Long, hi: Long, buckets: Int,
      retract: Boolean = false): DataFrame = {
    checkHist(lo, hi, buckets)
    fold(mv, delta.withColumn(bucketCol, histBucket(value, lo, hi, buckets)),
      keys :+ bucketCol, Nil, retract)
  }

  /** Quantile readout at integer percents (e.g. Seq(50, 95) → columns
    * `p50`, `p95`): per key group, the LOWER EDGE of the first bucket
    * whose cumulative count reaches rank ceil(pct·n/100) — computed
    * as (pct·n + 99) div 100, exact integer arithmetic end to end, so
    * any engine reproduces it bit-for-bit. Answers are exact to one
    * bucket width.
    */
  def readHistQuantiles(mv: DataFrame, keys: Seq[String],
      percents: Seq[Int], lo: Long, hi: Long, buckets: Int): DataFrame = {
    val width = checkHist(lo, hi, buckets)
    require(percents.nonEmpty && percents.forall(p => p > 0 && p <= 100),
      s"percents must be in (0, 100]: $percents")
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(keys.map(col): _*)
    val cum = mv
      .withColumn("__mv_cum",
        sum(col("__mv_n")).over(byKey.orderBy(col(bucketCol))))
      .withColumn("__mv_total", sum(col("__mv_n")).over(byKey))
    val edge = lit(lo) + col(bucketCol).cast("long") * lit(width)
    val qs = percents.map { p =>
      // ceil(pct·n/100) as pure integer arithmetic (Column./ would
      // detour through double): (pct·n + 99) div 100
      val target = expr(s"(${p}L * __mv_total + 99L) div 100L")
      min(when(col("__mv_cum") >= target, edge)).as(s"p$p")
    }
    cum.groupBy(keys.map(col): _*).agg(qs.head, qs.tail: _*)
  }
}
