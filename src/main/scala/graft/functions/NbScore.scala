package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, GraftExpressionBridge => B}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Packed Naive-Bayes scoring model: an open-addressing hash table of
  * token → per-term log-likelihood ratio, serialized to ONE binary value
  * so [[NbScore]] can fold a whole document in a single codegen'd pass.
  *
  * Why a byte table and not a broadcast-join: NB scoring is a PER-ROW
  * computation — Σ over a doc's own tokens of a per-token weight — that
  * SQL engines (ours until r13, and the DuckDB oracle still) can only
  * express by exploding the token stream, joining it against the vocab
  * table, and re-aggregating by doc. The explode/join/agg triple
  * materializes and hashes one row PER TOKEN; this model turns the same
  * fold into a projection: one scan, zero joins, zero aggregates, the
  * occurrence stream never exists as rows. At 100 TB the difference is a
  * whole shuffle-stage-free pass vs per-token UnsafeRow traffic.
  *
  * Layout (little-endian):
  *   int32  nSlots                    (power of two, load factor ≤ 0.5)
  *   f64    defaultLL                 (unseen-token weight: add-1 smoothing
  *                                     with zero counts — t19b's left join)
  *   slots  nSlots × (int32 poolOff, int32 len, f64 ll); len == -1 ⇒ empty
  *   pool   UTF-8 token bytes, concatenated
  *
  * Token equality is exact raw-byte comparison (no hashing shortcuts — the
  * oracle hash-compare demands exactness); the FNV-1a slot hash only picks
  * the probe start. Sizing is gated by the caller
  * ([[graft.llm.TextStats.BroadcastMaxVocabRows]]): a model this literal
  * carries rides the stage's one task-binary broadcast, the same bytes the
  * replaced broadcast join shipped.
  */
object NbModel {
  private val HeaderBytes = 12
  private val SlotBytes = 16

  private def fnv1a(b: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = off
    val end = off + len
    while (i < end) { h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  private def slotOf(h: Long, mask: Int): Int = ((h ^ (h >>> 32)).toInt) & mask

  /** Serialize distinct `words` (raw UTF-8 bytes) with their per-term
    * log-likelihood ratios. */
  def pack(words: Array[Array[Byte]], lls: Array[Double], defaultLL: Double): Array[Byte] = {
    require(words.length == lls.length, "words/lls length mismatch")
    var nSlots = 4
    while (nSlots < words.length * 2) nSlots <<= 1
    val mask = nSlots - 1
    val poolBytes = words.iterator.map(_.length.toLong).sum
    require(HeaderBytes + nSlots.toLong * SlotBytes + poolBytes < Int.MaxValue,
      s"NB model exceeds 2 GiB (${words.length} words)")
    val out = ByteBuffer.allocate(
      HeaderBytes + nSlots * SlotBytes + poolBytes.toInt).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(0, nSlots)
    out.putDouble(4, defaultLL)
    var i = 0
    while (i < nSlots) { out.putInt(HeaderBytes + i * SlotBytes + 4, -1); i += 1 }
    var poolPos = 0
    val poolBase = HeaderBytes + nSlots * SlotBytes
    i = 0
    while (i < words.length) {
      val w = words(i)
      var idx = slotOf(fnv1a(w, 0, w.length), mask)
      while (out.getInt(HeaderBytes + idx * SlotBytes + 4) != -1) idx = (idx + 1) & mask
      val off = HeaderBytes + idx * SlotBytes
      out.putInt(off, poolPos)
      out.putInt(off + 4, w.length)
      out.putDouble(off + 8, lls(i))
      System.arraycopy(w, 0, out.array(), poolBase + poolPos, w.length)
      poolPos += w.length
      i += 1
    }
    out.array()
  }

  /** Fold one document: returns [n_tok, Σ ll(token)] as a 2-element array.
    * Tokenization is byte-split on 0x20, reproducing `split(text, ' ')`
    * with Java's limit = -1 exactly — consecutive/leading/trailing spaces
    * yield empty-string tokens, empty text yields one empty token (UTF-8
    * continuation bytes are ≥ 0x80, so the byte scan can't split inside a
    * multi-byte character). Accumulation is token order, the same fold
    * order as the exploded formulation's map-side hash aggregate. Called
    * from generated code — keep the signature Java-friendly. */
  def score(text: UTF8String, model: Array[Byte]): ArrayData = {
    val bb = ByteBuffer.wrap(model).order(ByteOrder.LITTLE_ENDIAN)
    val nSlots = bb.getInt(0)
    val defaultLL = bb.getDouble(4)
    val mask = nSlots - 1
    val poolBase = HeaderBytes + nSlots * SlotBytes
    val tb = text.getBytes
    val n = tb.length
    var nTok = 0L
    var sum = 0.0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || tb(i) == ' ') {
        nTok += 1
        val tlen = i - start
        var idx = slotOf(fnv1a(tb, start, tlen), mask)
        var ll = 0.0
        var done = false
        while (!done) {
          val off = HeaderBytes + idx * SlotBytes
          val slen = bb.getInt(off + 4)
          if (slen == -1) { ll = defaultLL; done = true }
          else if (slen == tlen && {
            val so = poolBase + bb.getInt(off)
            var j = 0
            while (j < tlen && model(so + j) == tb(start + j)) j += 1
            j == tlen
          }) { ll = bb.getDouble(off + 8); done = true }
          else idx = (idx + 1) & mask
        }
        sum += ll
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(Array(nTok.toDouble, sum))
  }
}

/** Native Catalyst NB document scorer, WITH codegen — t19/t19b's score
  * pass. `left` is the document text (string), `right` the packed
  * [[NbModel]] (binary, a plan literal). Value: array<double>
  * [n_tok, Σ termLL] — the per-doc fold the explode/broadcast-join/agg
  * formulation computed with one row per TOKEN, now a pure projection.
  * See NbModel's scaladoc for semantics and the exactness argument.
  */
final case class NbScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, binary), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any, m: Any): Any =
    NbModel.score(t.asInstanceOf[UTF8String], m.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = graft.functions.NbModel.score($t, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NbScore =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "nb_score"
}

object NbScore {
  /** Column form: fold `text` against a driver-built model. */
  def of(text: Column, model: Array[Byte]): Column =
    B.columnOf(NbScore(B.expressionOf(text), Literal(model)))
}
