package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge => B}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64

/** Column wrappers for Spark's built-in Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind AQE's injected runtime filters). Spark keeps them OFF the SQL
  * function search path (internal-only registration), so library code
  * attaches them through the expression bridge; both sides are codegen'd,
  * and the aggregate folds a whole corpus into one binary value suitable
  * for broadcast.
  *
  * Sizing: `numBits ≈ 1.44 · n · log2(1/fpp)`; the membership probe's
  * false-positive rate only costs extra EXACT-verify work downstream
  * (Dedup.bloomIncrementalDedup), never wrong answers. */
object BloomMembership {

  /** Aggregate: fold xxhash64(c) of every input row into one Bloom filter
    * (binary). NULL on empty input. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    B.columnOf(new BloomFilterAggregate(
      B.expressionOf(xxhash64(c)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe: does the filter possibly contain xxhash64(c)? NULL filter →
    * NULL (an empty corpus matches nothing). No false negatives. */
  def mightContain(bloom: Column, c: Column): Column =
    B.columnOf(BloomFilterMightContain(
      B.expressionOf(bloom), B.expressionOf(xxhash64(c))))
}
