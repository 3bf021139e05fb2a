package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst element-wise vector subtraction over two double arrays,
  * WITH codegen — the residual step of the IVFPQ build/append encode
  * (r17). The `zip_with(v, centroid, (x, y) => x - y)` HOF it replaces is
  * CodegenFallback: it ran interpreted per row inside the otherwise fully
  * codegen'd encode projection (route → residual → PqEncode), measured as
  * the dominant share of a 22 s-cpu encode stage at sf0.1 (~90k rows).
  * Values are IEEE double subtraction element-by-element — bit-identical
  * to the zip_with lambda (FunctionsSpec pins it). Length mismatch → NULL
  * (the [[DotProductExpr]] contract; zip_with would pad with nulls, but
  * every call site subtracts a centroid of the vector's own dimension).
  */
final case class VecSub(left: Expression, right: Expression)
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
  // element nullability follows the inputs (the zip_with contract this
  // expression replaces): a null element in either input yields a null
  // output element, never a garbage double (r18, advice — previously
  // ArrayData.getDouble on a null slot read an arbitrary value)
  override def dataType: DataType = {
    val cn = Seq(left, right).exists(_.dataType match {
      case ArrayType(_, n) => n
      case _ => false
    })
    ArrayType(DoubleType, containsNull = cn)
  }
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VecSub.sub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // the generated guard mirrors the interpreted eval: sub() returns null on
  // a length mismatch, and without the isNull assignment whole-stage codegen
  // would write the null ArrayData into the output row and NPE (r18,
  // advice — the DotProductExpr/SqDist isNull contract)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.VecSub.sub($a, $b);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSub =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_sub"
}

object VecSub {
  def sub(a: ArrayData, b: ArrayData): GenericArrayData = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      // null elements propagate (zip_with's `x - y` lambda semantics);
      // isNullAt is a bitmask probe — no cost on the dense hot path
      out(i) = if (a.isNullAt(i) || b.isNullAt(i)) null
               else a.getDouble(i) - b.getDouble(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  def of(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val br = org.apache.spark.sql.GraftExpressionBridge
    br.columnOf(VecSub(br.expressionOf(a), br.expressionOf(b)))
  }
}
