package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._
import graft.llm.{Bpe, Dedup, Incremental, Mixture, Multimodal, Pipeline, Sampling, Similarity, TextStats}
import graft.streaming.{Streams, WindowedAggs}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared data-plane surface (SURVEY §2.B plus
  * the north-star LLM-pipeline extensions); `oracleSql` carries the DuckDB
  * equivalent for every SQL-expressible query. Engine-specific operators
  * (sketches, LSH, typed pipelines) are declared without an oracle and are
  * validated in the ScalaTest suites instead.
  */
object SparkEntry {

  /** All declared queries, grouped by operator family. */
  val allEntries: Seq[QueryDef] =
    Scans.entries ++ Projections.entries ++ Joins.entries ++
      Aggregations.entries ++ Windows.entries ++ Analytics.entries ++ SetOps.entries ++
      ScalarFns.entries ++ Dedup.entries ++ Similarity.entries ++
      TextStats.entries ++ Bpe.entries ++ Mixture.entries ++ Pipeline.entries ++
      Incremental.entries ++
      Multimodal.entries ++ Sampling.entries ++
      WindowedAggs.entries ++ Streams.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The Q5-shaped composition exercises scans + selective filters + five
    * joins (broadcast dims, shuffled facts) + aggregation end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    queries("x2_local_supplier_volume")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allEntries.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allEntries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
