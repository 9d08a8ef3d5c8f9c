package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native one-pass random-hyperplane LSH bucket id.
  *
  * The DataFrame-API formulation (graft.similarity.Similarity.bucketCol)
  * computes one `aggregate(transform(...))` fold PER PLANE: `nPlanes`
  * interpreted walks over the embedding per row — the auto-scaled plane
  * count (log₂ of corpus size) makes that per-row cost grow with the
  * corpus. This expression fuses all plane dot products into ONE codegen'd
  * loop over the array: per-row cost is `dim × nPlanes` multiply-adds with
  * no per-element lambda interpretation and no re-walks.
  *
  * Parity: coefficient = ((1103515245·(globalPlane·dim + d) + 12345)
  * mod 2048) − 1024 in 64-bit integer arithmetic, accumulated in index
  * order per plane — bit-identical to the HOF formulation and the
  * `generate_series` oracle. `globalPlane = planeOffset + p` gives
  * independent hash tables disjoint plane streams, exactly like the
  * Column version.
  */
case class HyperplaneBuckets(child: Expression, nPlanes: Int, planeOffset: Int)
  extends UnaryExpression {

  require(nPlanes > 0 && nPlanes < 31, "nPlanes must fit an int bucket")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an array<float|double> argument, got $t")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hyperplane_bucket"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Double](nPlanes)
    var d = 0
    while (d < n) {
      val v = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      var p = 0
      while (p < nPlanes) {
        val idx = (planeOffset + p).toLong * n + d
        acc(p) += v * ((1103515245L * idx + 12345L) % 2048L - 1024L).toDouble
        p += 1
      }
      d += 1
    }
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      if (acc(p) >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // all locals freshName'd — a bare `d`/`p`/`v`/`idx` would shadow any
      // same-named local in the enclosing generated scope, which Janino
      // rejects, silently dropping the projection to interpreted eval
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val vv = ctx.freshName("v")
      val idx = ctx.freshName("idx")
      val v = if (isFloat) s"(double) $a.getFloat($d)" else s"$a.getDouble($d)"
      s"""
         |int $n = $a.numElements();
         |double[] $acc = new double[$nPlanes];
         |for (int $d = 0; $d < $n; $d++) {
         |  double $vv = $v;
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    long $idx = ($planeOffset + $p) * (long) $n + $d;
         |    $acc[$p] += $vv * (double) ((1103515245L * $idx + 12345L) % 2048L - 1024L);
         |  }
         |}
         |int $bucket = 0;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  if ($acc[$p] >= 0) $bucket |= (1 << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}
