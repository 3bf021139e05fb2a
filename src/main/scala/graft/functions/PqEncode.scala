package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst PQ encoder, WITH codegen — the index BUILD's hot path
  * (the encode twin of [[AdcDot]], which covers the probe side). `left` is
  * the vector (array<double>, length m·dsub), `right` the FLATTENED
  * codebooks (array<double> literal, length m·ksub·dsub; subspace s's code
  * c starts at (s·ksub + c)·dsub): the value is the m argmin code ids,
  * subspace s choosing argmin_c Σ_j (v[s·dsub+j] − cb[...+j])².
  *
  * Exists because the higher-order formulation (per-subspace
  * `transform(typedLit(codebooks), c => aggregate(zip_with(slice(...))))`
  * + array_position(array_min)) runs interpreted — measured >25 min to
  * encode 2M×256-d at m=32/ksub=64 on 32 cores, i.e. the whole "build_s"
  * story of the ANN crossover was hiding in the first materialization.
  * This expression is the same mults at codegen speed.
  *
  * Distance accumulation is ascending-j per code, codes scanned ascending,
  * strict < keeps the FIRST minimum — bit-identical values and the same
  * tie-break as `array_position(dists, array_min(dists)) - 1`, so encoded
  * corpora (and every recall artifact derived from them) carry over
  * unchanged. FunctionsSpec pins expression-vs-HOF equality on fuzzed
  * vectors.
  */
final case class PqEncode(left: Expression, right: Expression,
    m: Int, ksub: Int, dsub: Int) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    PqEncode.encode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqEncode.encode($a, $b, $m, $ksub, $dsub);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_encode"
}

/** The OPQ sibling of [[PqEncode]]: rotated-space argmin via the
  * back-rotation fold (see PqIndex.backRotate) —
  * argmin_c ||(Rv)_s − c||² = argmin_c (‖c‖² − 2⟨v, u_{s,c}⟩), evaluated
  * against FULL-dim back-rotated code vectors. `right` packs
  * [n2 (m·ksub)] ++ [u flattened (m·ksub·dim)] as one literal. Same
  * bit-identity discipline as PqEncode: ascending-j dot fold, n2 − 2·dot,
  * first minimum — equal to the interpreted
  * zip_with(n2, transform(u, aggregate(...)))·array_position chain it
  * replaces (FunctionsSpec pins it).
  */
final case class PqEncodeRot(left: Expression, right: Expression,
    m: Int, ksub: Int, dim: Int) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    PqEncode.encodeRot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      m, ksub, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqEncode.encodeRot($a, $b, $m, $ksub, $dim);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeRot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_encode_rot"
}

object PqEncode {
  /** Column form: encode `vec` against codebooks[s][c][j], flattened to one
    * array<double> literal (m·ksub·dsub values — KBs; rides the task
    * binary like every codebook literal on the probe side). */
  def of(vec: org.apache.spark.sql.Column,
      codebooks: Seq[Seq[Seq[Double]]]): org.apache.spark.sql.Column = {
    val b = org.apache.spark.sql.GraftExpressionBridge
    val m = codebooks.size
    val ksub = codebooks.head.size
    val dsub = codebooks.head.head.size
    val flat: Seq[Double] = codebooks.flatten.flatten
    b.columnOf(PqEncode(b.expressionOf(vec),
      b.expressionOf(org.apache.spark.sql.functions.typedLit(flat)),
      m, ksub, dsub))
  }

  /** Column form of [[PqEncodeRot]]: codebooks give ‖c‖², `u` the full-dim
    * back-rotated code vectors (m × ksub × dim). */
  def ofRotated(vec: org.apache.spark.sql.Column,
      codebooks: Seq[Seq[Seq[Double]]],
      u: Seq[Seq[Seq[Double]]]): org.apache.spark.sql.Column = {
    val b = org.apache.spark.sql.GraftExpressionBridge
    val m = codebooks.size
    val ksub = codebooks.head.size
    val dim = u.head.head.size
    val n2: Seq[Double] = codebooks.flatMap(_.map(c => c.map(x => x * x).sum))
    val flat: Seq[Double] = n2 ++ u.flatten.flatten
    b.columnOf(PqEncodeRot(b.expressionOf(vec),
      b.expressionOf(org.apache.spark.sql.functions.typedLit(flat)),
      m, ksub, dim))
  }

  /** Shared by eval and generated code — keep the signature Java-friendly. */
  def encodeRot(vec: ArrayData, packed: ArrayData, m: Int, ksub: Int, dim: Int): ArrayData = {
    if (vec.numElements() < dim)
      throw new IllegalArgumentException(
        s"PqEncodeRot: embedding has ${vec.numElements()} elements, expected at least $dim")
    val codes = new Array[Int](m)
    val uBase = m * ksub
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val sc = s * ksub + c
        var dot = 0.0
        var j = 0
        val off = uBase + sc * dim
        while (j < dim) { dot += vec.getDouble(j) * packed.getDouble(off + j); j += 1 }
        val d = packed.getDouble(sc) - 2.0 * dot
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Shared by eval and generated code — keep the signature Java-friendly. */
  def encode(vec: ArrayData, cb: ArrayData, m: Int, ksub: Int, dsub: Int): ArrayData = {
    // surface a malformed embedding as a data error, not an opaque
    // ArrayIndexOutOfBounds from generated code (the HOF formulation this
    // expression replaced degraded to null-tolerant behavior instead)
    if (vec.numElements() < m * dsub)
      throw new IllegalArgumentException(
        s"PqEncode: embedding has ${vec.numElements()} elements, expected at least ${m * dsub} (m=$m, dsub=$dsub)")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val vOff = s * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val cOff = (s * ksub + c) * dsub
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val diff = vec.getDouble(vOff + j) - cb.getDouble(cOff + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }
}
