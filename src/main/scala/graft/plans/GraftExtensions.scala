package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{CosineSim, HasCjkExpr, MinHashSig,
  MinHashSigFromHashes, NormSq, PunctCountExpr, ShingleHashes, SimHash64,
  StopCountExpr, TokenCountExpr, WordCountExpr, WordShingles, ZOrderCode}

/** Optimizer rule: `cosine_sim(x, x)` is 1.0 whenever `x` is a
  * non-null non-zero vector; self-comparisons show up in dedup
  * pipelines that join a corpus with itself, where they'd otherwise
  * burn a full dot product per row. Folded to a null-safe conditional
  * constant (zero vectors still evaluate — they return 0).
  */
object FoldSelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSim(a, b) if a.deterministic && a.semanticEquals(b) =>
      // 1.0 unless the vector is null/zero-norm; keep exact semantics
      // by testing the norm cheaply instead of the full pairwise form
      org.apache.spark.sql.catalyst.expressions.If(
        org.apache.spark.sql.catalyst.expressions.IsNull(a),
        org.apache.spark.sql.catalyst.expressions.Literal.create(null,
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.catalyst.expressions.If(
          org.apache.spark.sql.catalyst.expressions.GreaterThan(
            NormSq(a), org.apache.spark.sql.catalyst.expressions.Literal(0.0)),
          org.apache.spark.sql.catalyst.expressions.Literal(1.0),
          org.apache.spark.sql.catalyst.expressions.Literal(0.0)))
  }
}

/** SparkSessionExtensions entry point — the same injection mechanism
  * the reference configures for Iceberg
  * (`spark.sql.extensions=...IcebergSparkSessionExtensions`,
  * /root/reference/dags/utils/constants/constant.py:48). Registers the
  * engine's custom Catalyst expressions as SQL functions so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works exactly like the
  * DataFrame API path.
  *
  * Usage:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *     // or .withExtensions(new GraftExtensions)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def arity(args: Seq[Expression], n: Int, fn: String): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${args.length}")

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  // The expressions read tungsten arrays positionally (getFloat /
  // getUTF8String), so inputs MUST be coerced: an array<double> arg
  // read as floats returns garbage, not an error. Cast at the builder
  // (analysis-time failure for non-castable types, silent widening/
  // narrowing for numeric arrays — the same coercion built-ins get).
  private def asFloatArray(e: Expression): Expression = Cast(e, ArrayType(FloatType))
  private def asStringArray(e: Expression): Expression = Cast(e, ArrayType(StringType))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FoldSelfCosine)
    // metadata-only count(*) over lake tables (see MetadataAgg)
    ext.injectOptimizerRule(_ => new MetadataCountRule)
    // materialized-view query rewrite: MUST be injected before
    // LakeSqlRule — it matches the base table while it is still a
    // recognizable GraftSparkTable relation (see ViewRewriteRule)
    ext.injectPostHocResolutionRule(session => new ViewRewriteRule(session))
    // SQL over lake tables (SELECT / INSERT / CTAS / DELETE / UPDATE /
    // MERGE INTO through a GraftCatalog) — see LakeSqlRule
    ext.injectPostHocResolutionRule(session => new LakeSqlRule(session))

    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => { arity(args, 2, "cosine_sim")
        CosineSim(asFloatArray(args(0)), asFloatArray(args(1))) }))

    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => { arity(args, 2, "minhash_sig")
        MinHashSig(asStringArray(args(0)), intArg(args(1), "minhash_sig k")) }))

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => { arity(args, 1, "simhash64")
        SimHash64(asStringArray(args(0))) }))

    ext.injectFunction((
      FunctionIdentifier("simhash64_md5"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64_md5"),
      (args: Seq[Expression]) => { arity(args, 1, "simhash64_md5")
        SimHash64(asStringArray(args(0)), md5Bits = true) }))

    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => { arity(args, 2, "word_shingles")
        WordShingles(asStringArray(args(0)), intArg(args(1), "word_shingles n")) }))

    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => { arity(args, 2, "shingle_hashes")
        ShingleHashes(asStringArray(args(0)), intArg(args(1), "shingle_hashes n")) }))

    ext.injectFunction((
      FunctionIdentifier("minhash_sig_hashes"),
      new ExpressionInfo(classOf[MinHashSigFromHashes].getName, "minhash_sig_hashes"),
      (args: Seq[Expression]) => { arity(args, 2, "minhash_sig_hashes")
        MinHashSigFromHashes(
          Cast(args(0), ArrayType(org.apache.spark.sql.types.LongType)),
          intArg(args(1), "minhash_sig_hashes k")) }))

    ext.injectFunction((
      FunctionIdentifier("zorder_code"),
      new ExpressionInfo(classOf[ZOrderCode].getName, "zorder_code"),
      (args: Seq[Expression]) => ZOrderCode(args))) // own arity/type checks

    // exact bounded-state top-k aggregate — the analyzer wraps the
    // returned AggregateFunction in an AggregateExpression itself
    ext.injectFunction((
      FunctionIdentifier("topk_by"),
      new ExpressionInfo(classOf[graft.functions.TopKByScore].getName, "topk_by"),
      (args: Seq[Expression]) => { arity(args, 3, "topk_by")
        graft.functions.TopKByScore(
          Cast(args(0), org.apache.spark.sql.types.DoubleType),
          Cast(args(1), StringType),
          intArg(args(2), "topk_by k")) }))

    // bloom_might_contain(key, X'<serialized filter>') — the filter
    // must be a binary LITERAL (it is a driver-built artifact shipped
    // with the plan, exactly like the DataFrame-side RuntimeFilter
    // tier ships it; an arbitrary expression would re-deserialize per
    // row)
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[graft.functions.BloomMightContainExpr].getName,
        "bloom_might_contain"),
      (args: Seq[Expression]) => { arity(args, 2, "bloom_might_contain")
        args(1) match {
          case Literal(b: Array[Byte], org.apache.spark.sql.types.BinaryType) =>
            graft.functions.BloomMightContainExpr(args(0), b)
          case other => throw new IllegalArgumentException(
            s"bloom_might_contain filter must be a binary literal, got $other")
        } }))

    // exact-distinct bitmap segments + driver-free set algebra
    // (ClickHouse groupBitmap* surface)
    ext.injectFunction((
      FunctionIdentifier("bitmap64_agg"),
      new ExpressionInfo(classOf[graft.functions.BitmapAggExpr].getName, "bitmap64_agg"),
      (args: Seq[Expression]) => { arity(args, 1, "bitmap64_agg")
        // widen integral ids to long; anything else (e.g. a string id
        // column) must surface as an analysis error, not silently cast
        // to null and vanish from the aggregate
        args(0).dataType match {
          case org.apache.spark.sql.types.LongType =>
            graft.functions.BitmapAggExpr(args(0))
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType =>
            graft.functions.BitmapAggExpr(
              Cast(args(0), org.apache.spark.sql.types.LongType))
          case other => throw new IllegalArgumentException(
            s"bitmap64_agg expects an integral id column, got ${other.sql}")
        } }))
    ext.injectFunction((
      FunctionIdentifier("bitmap64_or_agg"),
      new ExpressionInfo(classOf[graft.functions.BitmapOrAggExpr].getName, "bitmap64_or_agg"),
      (args: Seq[Expression]) => { arity(args, 1, "bitmap64_or_agg")
        graft.functions.BitmapOrAggExpr(args(0)) }))
    ext.injectFunction((
      FunctionIdentifier("bitmap64_count"),
      new ExpressionInfo(classOf[graft.functions.BitmapCountExpr].getName, "bitmap64_count"),
      (args: Seq[Expression]) => { arity(args, 1, "bitmap64_count")
        graft.functions.BitmapCountExpr(args(0)) }))
    ext.injectFunction((
      FunctionIdentifier("bitmap64_and_count"),
      new ExpressionInfo(classOf[graft.functions.BitmapAndCountExpr].getName, "bitmap64_and_count"),
      (args: Seq[Expression]) => { arity(args, 2, "bitmap64_and_count")
        graft.functions.BitmapAndCountExpr(args(0), args(1)) }))
    ext.injectFunction((
      FunctionIdentifier("bitmap64_or_count"),
      new ExpressionInfo(classOf[graft.functions.BitmapOrCountExpr].getName, "bitmap64_or_count"),
      (args: Seq[Expression]) => { arity(args, 2, "bitmap64_or_count")
        graft.functions.BitmapOrCountExpr(args(0), args(1)) }))
    ext.injectFunction((
      FunctionIdentifier("bitmap64_remove"),
      new ExpressionInfo(classOf[graft.functions.BitmapRemoveExpr].getName, "bitmap64_remove"),
      (args: Seq[Expression]) => { arity(args, 2, "bitmap64_remove")
        graft.functions.BitmapRemoveExpr(args(0), args(1)) }))

    // single-pass text kernels (string → int/boolean; no coercion needed
    // beyond an implicit string cast)
    def textKernel(name: String, clazz: Class[_], build: Expression => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (args: Seq[Expression]) => { arity(args, 1, name)
          build(Cast(args(0), StringType)) }))
    textKernel("token_count", classOf[TokenCountExpr], TokenCountExpr.apply)
    textKernel("word_count", classOf[WordCountExpr], WordCountExpr.apply)
    textKernel("stop_count", classOf[StopCountExpr], StopCountExpr.apply)
    textKernel("punct_count", classOf[PunctCountExpr], PunctCountExpr.apply)
    textKernel("has_cjk", classOf[HasCjkExpr], HasCjkExpr.apply)
  }
}
