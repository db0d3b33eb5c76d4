package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{DotProductExpr, FeatureHashEmbedExpr, Fingerprint64Expr, MinHashSigExpr, NormSquaredExpr, SigMatchFracExpr, SimHash64Expr, SubwordEstExpr, UnigramHashEmbedExpr, WordNgramsExpr}

/** Optimizer rule: `vector_dot(x, x)` → `norm_sq(x)` — one array
  * traversal instead of two. The (c)-tier `Rule[LogicalPlan]`
  * extension point, injected via [[GraftExtensions]] or
  * `spark.experimental.extraOptimizations`.
  */
object OptimizeSelfDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProductExpr(a, b) if a.fastEquals(b) => NormSquaredExpr(a)
    }
}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use. Activate cluster-wide with
  * `--conf spark.sql.extensions=graft.GraftExtensions`, or per session
  * via `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.sqlFunctions.foreach { case (name, clazz, builder) =>
      e.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(clazz, name), builder))
    }
    e.injectOptimizerRule(_ => OptimizeSelfDot)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

/** Imperative twin of [[GraftExtensions]] for sessions that are
  * already built (tests, the driver contract mains).
  */
object GraftExtensions {
  /** Arity-checked builder: wrong argument counts surface as an
    * analysis error, not an IndexOutOfBoundsException.
    */
  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression = { exprs =>
    if (exprs.length != n) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map("functionName" -> s"`$name`",
          "expectedNum" -> n.toString, "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    }
    f(exprs)
  }

  /** Literal-int parameter (signature widths, n-gram sizes): these
    * parameterize the generated code, so they must be foldable.
    */
  private def litInt(name: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
        org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal INT parameter, got: ${other.sql}")
  }

  val vectorDotBuilder: Seq[Expression] => Expression =
    arity("vector_dot", 2)(e => DotProductExpr(e.head, e(1)))

  /** Every graft native expression, SQL-callable: name, doc class,
    * arity-checked builder.
    */
  val sqlFunctions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vector_dot", classOf[DotProductExpr].getName, vectorDotBuilder),
    ("simhash64", classOf[SimHash64Expr].getName,
      arity("simhash64", 1)(e => SimHash64Expr(e.head))),
    ("fingerprint64", classOf[Fingerprint64Expr].getName,
      arity("fingerprint64", 1)(e => Fingerprint64Expr(e.head))),
    ("subword_estimate", classOf[SubwordEstExpr].getName,
      arity("subword_estimate", 1)(e => SubwordEstExpr(e.head))),
    ("sig_match_frac", classOf[SigMatchFracExpr].getName,
      arity("sig_match_frac", 2)(e => SigMatchFracExpr(e.head, e(1)))),
    ("word_ngrams", classOf[WordNgramsExpr].getName,
      arity("word_ngrams", 2)(e =>
        WordNgramsExpr(e.head, litInt("word_ngrams", e(1))))),
    ("minhash_sig", classOf[MinHashSigExpr].getName,
      arity("minhash_sig", 2)(e =>
        MinHashSigExpr(e.head, litInt("minhash_sig", e(1))))),
    ("feature_hash_embed", classOf[FeatureHashEmbedExpr].getName,
      arity("feature_hash_embed", 2)(e =>
        FeatureHashEmbedExpr(e.head, litInt("feature_hash_embed", e(1))))),
    ("unigram_hash_embed", classOf[UnigramHashEmbedExpr].getName,
      arity("unigram_hash_embed", 2)(e =>
        UnigramHashEmbedExpr(e.head, litInt("unigram_hash_embed", e(1))))),
    ("interleave_bits", classOf[graft.functions.InterleaveBitsExpr].getName,
      arity("interleave_bits", 2)(e =>
        graft.functions.InterleaveBitsExpr(e.head, e(1)))),
    ("opt_fence", classOf[graft.functions.OptimizationFence].getName,
      arity("opt_fence", 1)(e => graft.functions.OptimizationFence(e.head))),
    // aggregate builders return the AggregateFunction; the analyzer
    // wraps it in an AggregateExpression at resolution
    ("topk_by_score", classOf[graft.functions.TopKByScore].getName,
      arity("topk_by_score", 4)(e => graft.functions.TopKByScore(
        e.head, e(1), e(2), litInt("topk_by_score", e(3))))),
    ("topk_rows_by_score", classOf[graft.functions.TopKRowsByScore].getName,
      arity("topk_rows_by_score", 4)(e => graft.functions.TopKRowsByScore(
        e.head, e(1), e(2), litInt("topk_rows_by_score", e(3))))))
}

object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    GraftExtensions.sqlFunctions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, name, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(OptimizeSelfDot)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ OptimizeSelfDot
    }
  }
}
