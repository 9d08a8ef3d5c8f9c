package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration + Column-API surface for graft's native expressions.
  *
  * Two registration paths:
  *   - [[GraftFunctions.register]] — imperative, idempotent; graft
  *     operators call it on their input's own session, so library users
  *     need no setup.
  *   - [[GraftExtensions]] — the SparkSessionExtensions injector for
  *     cluster-wide deployment (`spark.sql.extensions=graft.functions.GraftExtensions`),
  *     making the functions available to pure-SQL users too.
  */
object GraftFunctions {

  val cosineName = "graft_cosine_sim"
  val bucketName = "graft_hyperplane_bucket"
  val bloomName  = "graft_bloom_contains"
  val lnName     = "graft_ln"
  val pqCodesName = "graft_pq_codes"

  private def cosineBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$cosineName expects 2 arguments, got ${exprs.length}")
    CosineSimilarity(exprs.head, exprs(1))
  }

  private def intArg(e: Expression, what: String): Int = {
    require(e.foldable, s"$bucketName's $what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  private def bucketBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, s"$bucketName expects 3 arguments, got ${exprs.length}")
    HyperplaneBuckets(exprs.head,
      intArg(exprs(1), "nPlanes"), intArg(exprs(2), "planeOffset"))
  }

  private def bloomBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$bloomName expects 2 arguments, got ${exprs.length}")
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs.head, exprs(1))
  }

  private def lnBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"$lnName expects 1 argument, got ${exprs.length}")
    NativeLog(exprs.head)
  }

  /** [[pqCodesBuilder]] exposed for the extensions injector. */
  private[functions] def pqCodesExprBuilder: Seq[Expression] => Expression =
    pqCodesBuilder

  private def pqCodesBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2 || exprs.length == 3,
      s"$pqCodesName expects 2 or 3 arguments, got ${exprs.length}")
    require(exprs(1).foldable, s"$pqCodesName's codebooks must be a literal")
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val books = exprs(1).eval().asInstanceOf[ArrayData]
      .toObjectArray(ArrayType(ArrayType(DoubleType)))
      .map(_.asInstanceOf[ArrayData]
        .toObjectArray(ArrayType(DoubleType))
        .map(_.asInstanceOf[ArrayData].toDoubleArray()))
    val unitize = exprs.length == 3 && {
      require(exprs(2).foldable, s"$pqCodesName's unitize flag must be a literal")
      exprs(2).eval().asInstanceOf[Boolean]
    }
    PqCodes(exprs.head, books, unitize)
  }

  /** Register graft functions into an existing session (idempotent), plus
    * the HOF-cosine auto-acceleration rule (see
    * [[graft.plans.CosineRewriteRule]]) via experimental
    * extraOptimizations — the per-session counterpart of the
    * [[GraftExtensions]] injector. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      cosineName, cosineBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      bucketName, bucketBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      bloomName, bloomBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      lnName, lnBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      pqCodesName, pqCodesBuilder, "built-in")
    if (!spark.experimental.extraOptimizations.contains(graft.plans.CosineRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.CosineRewriteRule
  }

  /** Codegen'd one-pass cosine similarity between two array columns. The
    * caller's DataFrame session must have graft functions registered;
    * operators that use this call [[register]] themselves. */
  def cosineSim(a: Column, b: Column): Column = call_function(cosineName, a, b)

  /** Codegen'd one-pass hyperplane-LSH bucket id (all plane dot products
    * in a single fused loop — see [[HyperplaneBuckets]]). Same
    * registration contract as [[cosineSim]]. */
  def hyperplaneBucket(emb: Column, nPlanes: Int, planeOffset: Int): Column =
    call_function(bucketName, emb,
      org.apache.spark.sql.functions.lit(nPlanes),
      org.apache.spark.sql.functions.lit(planeOffset))

  /** Codegen'd Bloom-filter membership probe over a serialized
    * `org.apache.spark.util.sketch.BloomFilter` (the format
    * `DataFrame.stat.bloomFilter` produces) — Spark's own
    * `BloomFilterMightContain` runtime-filter expression surfaced as a
    * library function. `value` must be a LONG key (hash the probe column
    * with `xxhash64(...)` using the SAME expression that keyed the
    * sketch build). Same registration contract as [[cosineSim]]. */
  def bloomContains(filterBytes: Column, value: Column): Column =
    call_function(bloomName, filterBytes, value)

  /** Fused PQ code assignment over a unit-vector column — all m subspace
    * argmaxes in one native per-row loop (see [[PqCodes]] for the
    * bit-exactness contract vs the expression-forest formulation it
    * replaces). `books` rides as one array literal. Same registration
    * contract as [[cosineSim]]. */
  def pqCodes(unitVec: Column, books: Array[Array[Array[Double]]]): Column =
    call_function(pqCodesName, unitVec,
      org.apache.spark.sql.functions.typedLit(books.map(_.map(_.toSeq).toSeq).toSeq))

  /** [[pqCodes]] over the RAW `array<float|double>` embedding: the L2
    * normalization folds into the kernel, bit-identical to
    * `unitCol → pqCodes` (see [[PqCodes]]'s `unitize` contract). Use on
    * the corpus/scan side: without the interpreted `transform`/`aggregate`
    * HOFs in the projection the encode stage stays in whole-stage
    * codegen. Same registration contract as [[cosineSim]]. */
  def pqCodesRaw(rawVec: Column, books: Array[Array[Array[Double]]]): Column =
    call_function(pqCodesName, rawVec,
      org.apache.spark.sql.functions.typedLit(books.map(_.map(_.toSeq).toSeq).toSeq),
      org.apache.spark.sql.functions.lit(true))

  /** Natural log via the intrinsified `Math.log` — see [[NativeLog]] for
    * why this beats the built-in `log` (StrictMath) when the output faces
    * a cross-engine exact compare. Same registration contract as
    * [[cosineSim]]. */
  def nativeLn(x: Column): Column = call_function(lnName, x)
}

/** `spark.sql.extensions` injector (see [[GraftFunctions]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.cosineName),
      new ExpressionInfo(classOf[CosineSimilarity].getName, GraftFunctions.cosineName),
      exprs => CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.bucketName),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, GraftFunctions.bucketName),
      exprs => HyperplaneBuckets(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.bloomName),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        GraftFunctions.bloomName),
      exprs => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.lnName),
      new ExpressionInfo(classOf[NativeLog].getName, GraftFunctions.lnName),
      exprs => NativeLog(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.pqCodesName),
      new ExpressionInfo(classOf[PqCodes].getName, GraftFunctions.pqCodesName),
      GraftFunctions.pqCodesExprBuilder))
    // portable HOF cosine → fused native kernel, for every session query
    ext.injectOptimizerRule(_ => graft.plans.CosineRewriteRule)
    // SQL DELETE/UPDATE/MERGE on USING graft tables (see GraftSqlDml)
    ext.injectResolutionRule(session => new graft.plans.GraftSqlDml(session))
    // DESCRIBE HISTORY / VACUUM / OPTIMIZE / RESTORE (see GraftSqlParser)
    ext.injectParser((session, delegate) =>
      new graft.plans.GraftSqlParser(session, delegate))
    // SELECT * FROM table_changes('t', 0, 'id') — the SQL CDF face
    ext.injectTableFunction((
      FunctionIdentifier("table_changes"),
      new ExpressionInfo(classOf[graft.sources.GraftDataSource].getName,
        "table_changes"),
      exprs => graft.plans.GraftSqlDml.tableChanges(exprs)))
    ()
  }
}
