package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst ADC (asymmetric distance computation) table lookup, WITH
  * codegen — the PQ scan's hot path. `left` is a vector's m code ids
  * (array<int>), `right` a FLATTENED per-probe lookup table (array<double>,
  * length m·ksub, row s at offset s·ksub): the value is
  * Σ_s tbl[s·ksub + codes[s]] — m array reads and adds per candidate.
  *
  * Exists because the higher-order formulation
  * (`aggregate(zip_with(codes, tbl, element_at...))`) runs interpreted
  * (HOFs don't participate in whole-stage codegen) at ~µs per candidate —
  * measured 38-150 s for ~6M routed candidates on the 2M×256-d corpus,
  * SLOWER than the exact codegen'd cosine scan it exists to beat. This
  * expression is the same 16-64 adds at codegen speed.
  *
  * Accumulation order is ascending-s, matching the HOF fold exactly, so
  * results are bit-identical to the previous formulation (DataPlaneSpec's
  * recall and rerank contracts carry over unchanged).
  */
final case class AdcDot(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tbl = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var sum = 0.0
    var s = 0
    while (s < m) {
      sum += tbl.getDouble(s * ksub + codes.getInt(s))
      s += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val sum = ctx.freshName("sum")
      s"""
         |int $m = $a.numElements();
         |double $sum = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  $sum += $b.getDouble($s * $ksub + $a.getInt($s));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_dot"
}
