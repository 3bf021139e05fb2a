package graft.ops

import graft.data.Tables
import org.apache.spark.sql.functions._

/** Projection / filter / predicate surface (SURVEY §2.B P1–P4).
  *
  * Provenance: feature-list projection and feature ablation drop columns
  * (reference: maggy/ablation/ablator/loco.py:63-67); budget/status filters
  * (reference: maggy/optimizer/abstractoptimizer.py:171-181).
  * Both must reach the parquet scan as PushedFilters/ReadSchema.
  */
object Projections {
  val entries: Seq[QueryDef] = Seq(
    // P1: column projection — ReadSchema must contain exactly these columns.
    QueryDef("p1_project",
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem") { (s, d) =>
      Tables(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    },

    // P2: column drop (feature ablation as projection complement).
    QueryDef("p2_drop_columns",
      "SELECT p_partkey, p_name, p_type, p_size FROM part") { (s, d) =>
      Tables(s, d, "part").drop("p_brand", "p_retailprice")
    },

    // P3: predicate filter (pushed to the scan). TPC-H Q6-shaped row filter.
    QueryDef("p3_filter",
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-02 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") < lit("1998-09-02 00:00:00").cast("timestamp")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    },

    // P4: null-safe compares / optional fields
    // (reference: maggy/trial.py:71 — final_metric is None until finalized).
    QueryDef("p4_null_handling",
      """SELECT c_custkey,
        |       nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
        |       coalesce(nullif(c_mktsegment, 'BUILDING'), '<none>') AS seg_filled,
        |       (nullif(c_mktsegment, 'BUILDING') IS NULL) AS is_building
        |FROM customer""".stripMargin) { (s, d) =>
      val segOrNull = nullif(col("c_mktsegment"), lit("BUILDING"))
      Tables(s, d, "customer").select(
        col("c_custkey"),
        segOrNull.as("seg_or_null"),
        coalesce(segOrNull, lit("<none>")).as("seg_filled"),
        segOrNull.isNull.as("is_building"))
    }
  )
}
