package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst ADC lookup-TABLE builder, WITH codegen — the probe-side
  * prepare step of every PQ/OPQ/IVFPQ search (r18). `left` is the probe
  * vector (array<double>), `right` the FLATTENED codebook constant
  * (array<double>, entry (s·ksub + c)·width + j = codebook[s][c][j]); the
  * value is the flat m·ksub table with
  *   out[s·ksub + c] = Σ_j pv[s·step + j] · cb[s][c][j]   (j < width).
  * Plain PQ tables pass step = width = dsub (each subspace reads its own
  * slice); OPQ tables pass step = 0, width = dim (each entry dots the FULL
  * vector against a back-rotated codebook column).
  *
  * Exists because the higher-order formulation —
  * `flatten(transform(typedLit(cbs), transform(_, aggregate(zip_with(...` —
  * runs interpreted (HOFs don't participate in whole-stage codegen) at
  * m·ksub·width multiplies per PROBE row; negligible for a 5-probe batch
  * query, but multiplied by ~500-probe micro-batches per trigger in
  * st_stream_ann at sf10 (and by the fine-tier table, whose m·ksub is
  * ~16× the coarse one's). Accumulation is the ascending-j fold of the
  * zip_with/aggregate it replaces — bit-identical (FunctionsSpec pins it).
  *
  * A probe too short for the strides yields NULL (defensive — every call
  * site dots a vector of exactly the codebooks' trained dimension).
  */
final case class AdcTable(left: Expression, right: Expression,
    m: Int, ksub: Int, width: Int, step: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    AdcTable.table(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      m, ksub, width, step)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.AdcTable.table($a, $b, $m, $ksub, $width, $step);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcTable =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_table"
}

object AdcTable {
  def table(pv: ArrayData, flat: ArrayData,
      m: Int, ksub: Int, width: Int, step: Int): GenericArrayData = {
    if (pv.numElements() < step * (m - 1) + width) return null
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val off = s * step
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * width
        var sum = 0.0
        var j = 0
        while (j < width) { sum += pv.getDouble(off + j) * flat.getDouble(base + j); j += 1 }
        out(s * ksub + c) = sum
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Flat-table column over a codebook constant: plain (strided) form. */
  def of(pv: org.apache.spark.sql.Column, cbs: Seq[Seq[Seq[Double]]]): org.apache.spark.sql.Column = {
    val dsub = cbs.head.head.size
    ofWidths(pv, cbs, width = dsub, step = dsub)
  }

  /** Flat-table column, explicit width/step (OPQ passes step 0, width dim). */
  def ofWidths(pv: org.apache.spark.sql.Column, cbs: Seq[Seq[Seq[Double]]],
      width: Int, step: Int): org.apache.spark.sql.Column = {
    val br = org.apache.spark.sql.GraftExpressionBridge
    val flat: Seq[Double] = cbs.flatten.flatten
    br.columnOf(AdcTable(br.expressionOf(pv),
      br.expressionOf(org.apache.spark.sql.functions.typedLit(flat)),
      m = cbs.size, ksub = cbs.head.size, width = width, step = step))
  }
}
