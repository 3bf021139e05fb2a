package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product with FOUR independent accumulators (stride-4 lanes summed
  * pairwise at the end) — the quadratic-prescreen hot path.
  *
  * Why it exists: [[DotProductExpr]]'s single-accumulator loop is bound by
  * the floating-add LATENCY chain (~4 cycles per element regardless of how
  * few operations the loop body holds — measured on the sf10 near-dup
  * scan: hoisting the fused cosine's 3-ops/element down to the 1-op dot
  * changed nothing, because superscalar hardware was already hiding the
  * extra multiplies under the same chain). Four independent chains let the
  * FPU retire ~4 adds per latency window; measured 18.6 → 8.9 s on the
  * 12.5G-pair sf10 scan.
  *
  * NOT bit-identical to the sequential fold: accumulation order is
  * (Σ lane0 + Σ lane1) + (Σ lane2 + Σ lane3), so values can differ from
  * [[DotProductExpr]] by ~n·ε relative (~1e-14 at 64 dims). Use ONLY
  * where the consumer tolerates that: threshold prescreens and 6-dp
  * rounded reports (a 1e-14 deviation flips a 6-dp rounding only if the
  * true value sits within 1e-14 of a 5e-7 boundary). Oracled/pinned
  * paths keep the sequential expressions.
  */
final case class DotProductUnrolled(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
    var i = 0
    val n4 = n - 3
    while (i < n4) {
      a0 += x.getDouble(i) * y.getDouble(i)
      a1 += x.getDouble(i + 1) * y.getDouble(i + 1)
      a2 += x.getDouble(i + 2) * y.getDouble(i + 2)
      a3 += x.getDouble(i + 3) * y.getDouble(i + 3)
      i += 4
    }
    while (i < n) { a0 += x.getDouble(i) * y.getDouble(i); i += 1 }
    (a0 + a1) + (a2 + a3)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // four INDEPENDENT fresh names: suffixing one freshName("acc") with
      // 0..3 can collide with a later freshName in the same codegen context
      // (e.g. acc_1 + "0" == a legitimate acc_10), which janino rejects and
      // whole-stage silently falls back to interpreted — forfeiting the
      // measured 2× this expression exists for
      val acc0 = ctx.freshName("acc0")
      val acc1 = ctx.freshName("acc1")
      val acc2 = ctx.freshName("acc2")
      val acc3 = ctx.freshName("acc3")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc0 = 0.0, $acc1 = 0.0, $acc2 = 0.0, $acc3 = 0.0;
         |  int $i = 0;
         |  for (; $i < $n - 3; $i += 4) {
         |    $acc0 += $a.getDouble($i) * $b.getDouble($i);
         |    $acc1 += $a.getDouble($i + 1) * $b.getDouble($i + 1);
         |    $acc2 += $a.getDouble($i + 2) * $b.getDouble($i + 2);
         |    $acc3 += $a.getDouble($i + 3) * $b.getDouble($i + 3);
         |  }
         |  for (; $i < $n; $i++) {
         |    $acc0 += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = ($acc0 + $acc1) + ($acc2 + $acc3);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductUnrolled =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product_unrolled"
}
