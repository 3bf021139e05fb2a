package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DSIR hashed-n-gram bucket fold (t16) — the NbScore treatment applied to
  * the importance-weight pipeline. The feature stream per doc is its
  * unigrams plus space-joined bigrams; each feature's bucket is the FIRST
  * BYTE of md5(feature-utf8) — exactly `substr(md5(feat), 1, 2)` parsed as
  * hex, the definition the DuckDB oracle recomputes. The explode/join
  * formulation this replaces materialized ~150M feature ROWS per pass and
  * paid a corpus-wide join against the 256-row frequency table per
  * feature; here both passes are per-DOC folds in compiled code, so the
  * plan is scan → project (+ a 500k-row 256-wide posexplode for the
  * frequency sums) with no corpus-sized shuffle anywhere. Bigram digests
  * are fed token-bytes + ' ' + token-bytes through one reused
  * MessageDigest — byte-identical to md5 of the concatenated string,
  * with zero string allocation.
  */
object DsirHash {
  val Buckets = 256

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val space = Array[Byte](' ')

  private def bucketOf(md: java.security.MessageDigest): Int =
    md.digest()(0) & 0xff

  /** Per-doc bucket histogram: counts[256] over unigram + bigram features. */
  def counts(tokens: ArrayData): ArrayData = {
    val md = digests.get()
    val n = tokens.numElements()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = tokens.getUTF8String(i).getBytes
      i += 1
    }
    val c = new Array[Int](Buckets)
    i = 0
    while (i < n) {
      md.reset(); md.update(toks(i))
      c(bucketOf(md)) += 1
      if (i + 1 < n) {
        md.reset(); md.update(toks(i)); md.update(space); md.update(toks(i + 1))
        c(bucketOf(md)) += 1
      }
      i += 1
    }
    new GenericArrayData(c)
  }

  /** Per-doc weight fold: Σ weights[bucket(feat)] over the same feature
    * stream, accumulated in FEATURE ORDER (unigram i, bigram i — the
    * explode order of the formulation this replaces; the consumer divides
    * by the feature count and rounds to 6 dp, where the ~1e-15
    * order-sensitivity is invisible, the t8/t15 precedent). */
  def score(tokens: ArrayData, weights: ArrayData): Double = {
    val md = digests.get()
    val n = tokens.numElements()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = tokens.getUTF8String(i).getBytes
      i += 1
    }
    var acc = 0.0
    i = 0
    while (i < n) {
      md.reset(); md.update(toks(i))
      acc += weights.getDouble(bucketOf(md))
      if (i + 1 < n) {
        md.reset(); md.update(toks(i)); md.update(space); md.update(toks(i + 1))
        acc += weights.getDouble(bucketOf(md))
      }
      i += 1
    }
    acc
  }

  def countsOf(tokens: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val b = org.apache.spark.sql.GraftExpressionBridge
    b.columnOf(DsirBuckets(b.expressionOf(tokens)))
  }

  def scoreOf(tokens: org.apache.spark.sql.Column,
      weights: Seq[Double]): org.apache.spark.sql.Column = {
    val b = org.apache.spark.sql.GraftExpressionBridge
    b.columnOf(DsirScore(b.expressionOf(tokens),
      b.expressionOf(org.apache.spark.sql.functions.typedLit(weights))))
  }
}

/** counts[256] of md5-first-byte buckets over unigram+bigram features. */
final case class DsirBuckets(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    DsirHash.counts(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DsirHash.counts($a);")

  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)
  override def prettyName: String = "dsir_buckets"
}

/** Σ weights[bucket(feat)] over the unigram+bigram feature stream. */
final case class DsirScore(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DsirHash.score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DsirHash.score($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DsirScore =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dsir_score"
}
