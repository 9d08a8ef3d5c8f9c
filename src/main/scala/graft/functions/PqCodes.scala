package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused PQ code assignment: all `m` subspace argmaxes over a UNIT
  * vector column in one per-row loop.
  *
  * Replaces the expression forest the DataFrame formulation builds —
  * per subspace, k centroid scores each holding its own
  * `graft_cosine_sim(slice, literal)` kernel plus a shared-by-reference
  * norm fold, ~m×k cosine subtrees per row — whose generated/interpreted
  * evaluation dominated the PQ paths at bench scale (measured: the ADC
  * shortlist stage alone 2.8 s on a 2k-vector corpus; the whole stage
  * collapses to ~0.2 s with this kernel).
  *
  * BIT-EXACT parity with the replaced chain, op by op (this is load-
  * bearing: pqFit's learned codebooks and every persisted PQ index must
  * not move):
  *   - input is the already-unit-normalized `array<double>` column (the
  *     caller keeps computing unitCol exactly as before);
  *   - subspace slice = `slice(u, s*dsub+1, dsub)` semantics (clip at
  *     the array end, empty past it);
  *   - `nx` = sqrt of the index-ordered fold of slice squares;
  *   - per centroid: one index-ordered pass accumulating dot/na/nb over
  *     `min(|slice|, |centroid|)` elements — exactly
  *     [[CosineSimilarity]]'s loop — then
  *     `score = cos(slice,c) * nx * nc − n2/2` with nc = √n2 and
  *     n2 = Σc² precomputed DRIVER-side (same fold order as the old
  *     literals), and the zero-norm centroid special case
  *     `score = 0.0 − n2/2`;
  *   - argmax = `array_max` over `struct(score, cell)`: replace when the
  *     candidate struct compares GREATER — score compared with Spark's
  *     SQLOrderingUtil double ordering (NaN greatest, -0.0 == 0.0), score
  *     ties won by the higher cell (struct field 2), replicated below.
  *
  * `unitize = true` additionally folds the L2 normalization INTO the
  * kernel (input then is the RAW `array<float|double>` embedding):
  * norm = √(index-ordered fold of squares, squared in FLOAT when the
  * column is float — Multiply(float,float) is float — then widened),
  * and every element the kernel reads is `x/norm`, the exact double
  * `unitCol`'s `transform(v, x => x / n)` produces. This matters for
  * whole-stage codegen: `unitCol` is built from `ArrayTransform` /
  * `ArrayAggregate`, which are CodegenFallback and disqualify the whole
  * projection from codegen — with the fold inside the kernel the encode
  * projection is pure native expressions and stays in the generated
  * stage.
  */
case class PqCodes(child: Expression, books: Array[Array[Array[Double]]],
    unitize: Boolean = false)
  extends UnaryExpression {

  // Array fields compare by reference under case-class equality, so two
  // structurally identical PqCodes built separately would never be
  // semanticEquals / canonicalize the same (missed CSE and cached-plan
  // reuse, never wrong results). Deep-compare the codebooks instead.
  override def equals(other: Any): Boolean = other match {
    case p: PqCodes =>
      child == p.child && unitize == p.unitize && java.util.Arrays.deepEquals(
        books.asInstanceOf[Array[AnyRef]], p.books.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + unitize.hashCode()) +
      java.util.Arrays.deepHashCode(books.asInstanceOf[Array[AnyRef]])

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) if unitize => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>" +
        s"${if (unitize) " or array<float> (a raw embedding)" else " (a unit-normalized embedding)"}, got $other")
  }

  /** Float elements square in FLOAT inside unitCol's norm fold; the
    * kernel replicates that (lazy: the child may be unresolved at
    * construction). */
  private lazy val floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  private val dsub: Int = books.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

  /** Σc² per centroid via the same left fold the old driver literals
    * used (`c.map(x => x*x).sum`). */
  private val n2s: Array[Array[Double]] =
    books.map(_.map(c => c.map(x => x * x).sum))
  private val ncs: Array[Array[Double]] = n2s.map(_.map(math.sqrt))

  /** Spark's SQLOrderingUtil.compareDoubles (the ordering struct
    * comparison uses for DoubleType): total order with NaN greatest and
    * -0.0 == 0.0 — java.lang.Double.compare would order -0.0 < 0.0 and
    * diverge from the replaced array_max. */
  private def cmpD(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1 else if (x == y) 0
    else if (java.lang.Double.isNaN(x)) { if (java.lang.Double.isNaN(y)) 0 else 1 }
    else -1

  override def nullSafeEval(v: Any): Any = assign(v.asInstanceOf[ArrayData])

  /** Whole-stage codegen: evaluate the child natively and call the fused
    * kernel once per row through a bound reference — one virtual call,
    * versus CodegenFallback's `Expression.eval(row)` which (a) rebuilds
    * an input row per call and (b) disqualifies the ENTIRE enclosing
    * plan node from whole-stage codegen
    * (CollapseCodegenStages.supportCodegen rejects CodegenFallback
    * expressions), interpreting the surrounding projection too. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, u => s"${ev.value} = $kernel.assign($u);")
  }

  /** The per-row kernel (shared by interpreted eval and generated code). */
  def assign(v: ArrayData): ArrayData = {
    val len = v.numElements()
    // unit view of the input: with unitize the raw element divides by the
    // L2 norm exactly as unitCol's transform did (float squares stay
    // float inside the fold; the division widens); without it the input
    // IS the unit vector and reads through unchanged
    val norm: Double =
      if (!unitize) 1.0
      else {
        var acc = 0.0
        var i = 0
        while (i < len) {
          if (floatElems) { val f = v.getFloat(i); acc += (f * f).toDouble }
          else { val x = v.getDouble(i); acc += x * x }
          i += 1
        }
        math.sqrt(acc)
      }
    @inline def u(i: Int): Double =
      if (!unitize) v.getDouble(i)
      else (if (floatElems) v.getFloat(i).toDouble else v.getDouble(i)) / norm
    val m = books.length
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val start = s * dsub
      val take = math.max(0, math.min(dsub, len - start))
      var nxAcc = 0.0
      var i = 0
      while (i < take) {
        val x = u(start + i); nxAcc += x * x; i += 1
      }
      val nx = math.sqrt(nxAcc)
      val cents = books(s)
      var bestScore = 0.0
      var bestCell = -1
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        val nc = ncs(s)(c)
        val n2 = n2s(s)(c)
        val score =
          if (nc == 0.0) 0.0 - n2 / 2.0
          else {
            val nL = math.min(take, cent.length)
            var dot = 0.0; var na = 0.0; var nb = 0.0
            var j = 0
            while (j < nL) {
              val x = u(start + j); val y = cent(j)
              dot += x * y; na += x * x; nb += y * y
              j += 1
            }
            dot / (math.sqrt(na) * math.sqrt(nb)) * nx * nc - n2 / 2.0
          }
        // array_max replaces on strictly-greater struct compare; equal
        // scores fall through to the cell field, where the ascending
        // candidate index always wins — so replace on cmp >= 0
        if (bestCell < 0 || cmpD(score, bestScore) >= 0) {
          bestScore = score; bestCell = c
        }
        c += 1
      }
      codes(s) = bestCell
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}
