package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed per-group ranking for LOW-CARDINALITY groups — the regime
  * where `Window.partitionBy(group)` collapses to |groups| tasks no matter
  * how large the cluster: rank functions force every partition's rows
  * through ONE task's sort, so percent_rank over 5 order-priorities runs
  * 5-way parallel on 60M rows locally and would put ~2×10⁹ rows in a
  * single task at 100 TB.
  *
  * The scale-right plan is the classic two-pass distributed rank (the same
  * counting trick `RDD.zipWithIndex` uses):
  *
  *   1. `repartitionByRange` on the FULL sort key (group first) +
  *      `sortWithinPartitions` — a range shuffle whose parallelism tracks
  *      the CLUSTER, not the group count; partition p holds a contiguous
  *      slice of the total order.
  *   2. `zipWithIndex` — one extra count-per-partition job, then each
  *      row's contiguous global index IS its 0-based rank in the total
  *      (group, order...) sort, independent of where range bounds fell
  *      (sort keys are made distinct by a tie-break column).
  *   3. per-group min(index) and count — a |groups|-row aggregate,
  *      broadcast back: rank_in_group = idx − min_idx(group).
  *
  * percent_rank/ntile then derive from (rank, n) with pure integer/IEEE
  * arithmetic, matching the SQL-standard definitions bit-for-bit (w3's
  * DuckDB oracle is the regression proof).
  */
object Ranks {

  /** Dispatch threshold for rank queries over low-cardinality groups: with
    * every group at or under this many rows, a single task's codegen'd
    * window sort is faster than the distributed rank's extra shuffle +
    * row-materialization constant (measured at the 100× corpus: 3M-row
    * groups — window 9.3 s vs distributed 8.9 s, the crossover); beyond
    * it, per-task sort state grows unboundedly with data while the
    * distributed plan's per-task share keeps shrinking as the cluster
    * grows. The stats probe that drives the choice is a |groups|-row
    * aggregate — one cheap job, the same shape AQE uses to re-plan. */
  val WindowMaxGroupRows: Long = 4000000L

  /** `df` + a 0-based `rank0` column: the row's rank within its `group` by
    * `order` (which must be made total/distinct via a tie-break column —
    * equal keys would get arbitrary but still distinct consecutive ranks).
    * Output parallelism = `parallelism` range partitions. */
  def groupRank(df: DataFrame, group: Column, order: Seq[Column],
      parallelism: Int): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(parallelism, (group +: order): _*)
      .sortWithinPartitions((group +: order): _*)
    val schema = sorted.schema
    // zipWithIndex: contiguous global index in partition order == rank in
    // the total sort order (range partitions are themselves ordered)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(indexed,
      schema.add("g_idx", org.apache.spark.sql.types.LongType, nullable = false))
  }

  /** SQL-standard ntile bucket from a 1-based rank and the group size:
    * bucket sizes differ by ≤1, larger buckets first — pure integer math,
    * identical in Spark and DuckDB. */
  def ntileOf(rank1: Column, n: Column, buckets: Int): Column = {
    // integer division via double floor — exact below 2^53, far above any
    // per-group row count this engine will see; `/` on Spark integer
    // columns returns double anyway, and double ops never throw under ANSI
    def idiv(a: Column, b: Column): Column =
      floor(a.cast("double") / b.cast("double")).cast("long")
    val base = idiv(n, lit(buckets))
    val rem = n.cast("long") - base * buckets
    val bigSpan = (base + 1) * rem
    when(rank1 <= bigSpan, idiv(rank1 - 1, base + 1) + 1)
      // greatest guards the base=0 (n < buckets) case: the when-branch
      // already covers every row there, but the otherwise expression is
      // still evaluated columnar-style and must not divide by zero
      .otherwise(rem + idiv(rank1 - bigSpan - 1, greatest(base, lit(1L))) + 1)
      .cast("int")
  }

  /** SQL-standard percent_rank from a 0-based rank and the group size:
    * rank0 / (n − 1), defined as 0 for single-row groups. */
  def percentRankOf(rank0: Column, n: Column): Column =
    when(n === 1, lit(0.0))
      .otherwise(rank0.cast("double") / (n.cast("double") - 1))

  /** The full distributed percent_rank + ntile(4) query shape (w3's scale
    * path): groupRank, per-group (min index, count) broadcast back, then
    * the arithmetic identities above. Emits (keyCol, pct_rank, quartile). */
  def percentRankNtile(df: DataFrame, group: Column, order: Seq[Column],
      keyCol: Column, parallelism: Int): DataFrame = {
    val ranked = groupRank(df, group, order, parallelism)
    val groupName = ranked.select(group).columns.head
    val stats = ranked.groupBy(group)
      .agg(min(col("g_idx")).as("min_idx"), count(lit(1)).as("n_grp"))
    ranked.join(broadcast(stats), groupName)
      .withColumn("r0", col("g_idx") - col("min_idx"))
      .select(keyCol,
        round(percentRankOf(col("r0"), col("n_grp")), 9).as("pct_rank"),
        ntileOf(col("r0") + 1, col("n_grp"), 4).as("quartile"))
  }
}
