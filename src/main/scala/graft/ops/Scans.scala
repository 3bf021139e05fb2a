package graft.ops

import graft.data.Tables
import org.apache.spark.sql.functions._

/** Scans / sources (SURVEY §2.B S1–S6).
  *
  * Provenance: the reference reads Parquet/Petastorm shards
  * (reference: maggy/core/patching/dataloader.py:99-137) and JSON trial dumps
  * (reference: maggy/trial.py:138-150); here each becomes a declarative scan
  * so Catalyst gets pushdown/pruning for free.
  */
object Scans {
  val entries: Seq[QueryDef] = Seq(
    // S1: bare parquet scan; count aggregates at the scan (no row materialization).
    QueryDef("s1_scan_count",
      "SELECT count(*) AS n FROM lineitem") { (s, d) =>
      Tables(s, d, "lineitem").agg(count(lit(1)).as("n"))
    },

    // S2: shard/worker-slice invariance — repartition must not change results.
    // (reference: maggy/core/patching/dataloader.py:124-130 shards by rank/world-size)
    QueryDef("s2_shard_invariance",
      "SELECT count(*) AS n, count(DISTINCT l_orderkey) AS n_orders FROM lineitem") { (s, d) =>
      Tables(s, d, "lineitem").repartition(32)
        .agg(count(lit(1)).as("n"), countDistinct(col("l_orderkey")).as("n_orders"))
    },

    // S3: JSON field extraction from a string column
    // (reference: maggy/trial.py:138-150 JSON (de)serialization of trials).
    QueryDef("s3_json_extract",
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       md5(props) AS props_hash
        |FROM events""".stripMargin) { (s, d) =>
      Tables(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        md5(col("props")).as("props_hash"))
    },

    // S6: in-memory generated dataset (deterministic, seedless — id-derived),
    // standing in for sampled-config generation (reference: maggy/searchspace.py:180-208).
    QueryDef("s6_generated_configs",
      """SELECT range AS id,
        |       md5(CAST(range AS VARCHAR)) AS config_hash,
        |       range % 10 AS bucket
        |FROM range(1000)""".stripMargin) { (s, _) =>
      s.range(1000).select(
        col("id"),
        md5(col("id").cast("string")).as("config_hash"),
        (col("id") % 10).as("bucket"))
    }
  )
}
