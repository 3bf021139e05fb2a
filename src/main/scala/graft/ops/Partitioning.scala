package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Value-aligned repartitioning: output partition INDEX == shard value.
  *
  * `Dataset.repartition(n, col)` hash-partitions — partition index is
  * `murmur3(col) % n`, so shard k does NOT land in file k and several
  * shards can share one output partition while others sit empty (the
  * round-7 x4 wart: 8 shard values over 8 hash buckets collide). A
  * training-data export wants shard_id ↔ output file to be 1:1 so loader
  * ranks and shard files align (Datasets.shardFiles assigns by sorted file
  * index).
  *
  * Spark-first fix, no RDD detour: for each target partition k pick a
  * SENTINEL long v_k whose murmur3 hash (seed 42 — the exact function
  * `HashPartitioning.partitionIdExpression` evaluates for a long column)
  * lands on partition k, then repartition on `CASE shard WHEN k THEN v_k`.
  * One shuffle, each row moves once, and the resulting physical partition
  * index equals the shard value by construction. AlignSpec locks the
  * index↔value contract against hash-function drift across Spark upgrades.
  */
object Partitioning {

  /** sentinels(n)(k) = smallest non-negative long hashing to partition k
    * of n under Spark's shuffle hash (Murmur3_x86_32.hashLong, seed 42). */
  private[ops] def sentinels(n: Int): Array[Long] = {
    require(n >= 1, s"partition count must be >= 1, got $n")
    val out = Array.fill(n)(-1L)
    var found = 0
    var v = 0L
    while (found < n) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(v, 42)
      val k = ((h % n) + n) % n
      if (out(k) < 0) { out(k) = v; found += 1 }
      v += 1
    }
    out
  }

  /** Repartition `df` into `n` partitions with partition index == `shard`
    * value. `shard` must evaluate to an integral value in [0, n); rows
    * outside that domain (or NULL) land in partition 0 — callers own the
    * domain invariant (x4 derives shard_id as `hash % n`, so it holds by
    * construction). */
  def alignByValue(df: DataFrame, shard: Column, n: Int): DataFrame = {
    val s = sentinels(n)
    val aligned = (1 until n).foldLeft(when(shard === 0, lit(s(0)))) {
      (acc, k) => acc.when(shard === k, lit(s(k)))
    }.otherwise(lit(s(0)))
    df.repartition(n, aligned)
  }
}
