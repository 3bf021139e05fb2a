package graft.ops

import graft.data.Tables
import org.apache.spark.sql.functions._

/** Sorts / limits / set operations (SURVEY §2.B O1–O4).
  *
  * Provenance: metric sorts (reference: maggy/optimizer/bayes/tpe.py:207),
  * warmup-buffer pop (bayes/base.py:233-240), final_store append
  * (optimization_driver.py:504-506), promoted-set difference (asha.py:119-121).
  */
object SetOps {
  val entries: Seq[QueryDef] = Seq(
    // O1+O2: multi-column global sort with limit (TakeOrderedAndProject).
    QueryDef("o1_sort_limit",
      """SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        |ORDER BY c_nationkey ASC, c_acctbal DESC, c_custkey LIMIT 50""".stripMargin) { (s, d) =>
      Tables(s, d, "customer")
        .orderBy(col("c_nationkey").asc, col("c_acctbal").desc, col("c_custkey"))
        .limit(50)
        .select("c_custkey", "c_nationkey", "c_acctbal")
    },

    // O3: union by name (final_store append semantics).
    QueryDef("o3_union",
      """SELECT c_custkey AS key, 'customer' AS src FROM customer WHERE c_acctbal > 9000
        |UNION ALL
        |SELECT s_suppkey AS key, 'supplier' AS src FROM supplier WHERE s_acctbal > 9000""".stripMargin) { (s, d) =>
      val c = Tables(s, d, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("key"), lit("customer").as("src"))
      val su = Tables(s, d, "supplier").filter(col("s_acctbal") > 9000)
        .select(col("s_suppkey").as("key"), lit("supplier").as("src"))
      c.unionByName(su)
    },

    // O4a: intersect — nations present in both customer and supplier.
    QueryDef("o4_intersect",
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin) { (s, d) =>
      Tables(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(Tables(s, d, "supplier").select(col("s_nationkey").as("nk")))
    },

    // O4b: except — orders that have no lineitems (non-empty on testdata;
    // the earlier nations-without-suppliers variant returned 0 rows, which
    // made the oracle check vacuous). Large-large: both sides shuffle on the
    // key, which is exactly the plan EXCEPT needs at scale.
    QueryDef("o4_except",
      """SELECT o_orderkey AS key FROM orders
        |EXCEPT
        |SELECT l_orderkey AS key FROM lineitem""".stripMargin) { (s, d) =>
      Tables(s, d, "orders").select(col("o_orderkey").as("key"))
        .except(Tables(s, d, "lineitem").select(col("l_orderkey").as("key")))
    },

    // O5: unpivot/melt — wide → long reshaping (the inverse of a10_pivot).
    // Spark's Dataset.unpivot expands each row map-side (no shuffle); the
    // oracle states the same contract as a UNION ALL, which is what the
    // operator means relationally.
    QueryDef("o5_unpivot",
      """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'retailprice', CAST(p_retailprice AS DOUBLE) FROM part""".stripMargin) { (s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").cast("double").as("retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
          "metric", "value")
    }
  )
}
