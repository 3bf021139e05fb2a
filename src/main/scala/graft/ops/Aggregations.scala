package graft.ops

import graft.data.Tables
import graft.ops.Exact._
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY §2.B A1–A9).
  *
  * Provenance: streaming best/worst/avg result updates (reference:
  * maggy/core/experiment_driver/optimization_driver.py:344-406), dedup of
  * configs (maggy/optimizer/abstractoptimizer.py:254-295), TPE γ-quantile
  * split (maggy/optimizer/bayes/tpe.py:206-216), metric-history assembly
  * (maggy/trial.py:93-108). All are hash aggregations with map-side partials.
  */
object Aggregations {
  val entries: Seq[QueryDef] = Seq(
    // A1: TPC-H Q1 — the canonical multi-aggregate hash groupBy.
    QueryDef("a1_groupby_agg",
      """SELECT l_returnflag, l_linestatus,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(22,8))) AS DOUBLE), 2) AS sum_qty,
        |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(22,8))) AS DOUBLE), 2) AS sum_base_price,
        |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,8))) AS DOUBLE), 2) AS sum_disc_price,
        |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(22,8))) AS DOUBLE), 2) AS sum_charge,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(22,8))) AS DOUBLE) / count(*), 6) AS avg_qty,
        |       round(CAST(sum(CAST(l_discount AS DECIMAL(22,8))) AS DOUBLE) / count(*), 6) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val discPrice = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          moneySum(discPrice).as("sum_disc_price"),
          moneySum(discPrice * (lit(1) + col("l_tax"))).as("sum_charge"),
          moneyAvg(col("l_quantity")).as("avg_qty"),
          moneyAvg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // A2: global (grand) aggregate, TPC-H Q6-shaped
    // (reference: ybest/yworst/ymean, maggy/optimizer/abstractoptimizer.py:402-442).
    QueryDef("a2_global_agg",
      """SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(22,8))) AS DOUBLE), 2) AS revenue,
        |       min(l_quantity) AS min_qty,
        |       max(l_quantity) AS max_qty,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07""".stripMargin) { (s, d) =>
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp")
          && col("l_discount").between(0.05, 0.07))
        .agg(
          moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          count(lit(1)).as("n"))
    },

    // A3: exact count-distinct (dedup semantics,
    // reference: maggy/optimizer/abstractoptimizer.py:254-295).
    QueryDef("a3_count_distinct",
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(DISTINCT l_returnflag) AS n_flags
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables(s, d, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_returnflag")).as("n_flags"))
    },

    // A3b: approximate count-distinct (HLL). Engine-specific sketch → no SQL
    // oracle; ScalaTest bounds it against the exact count.
    QueryDef.noOracle("a3_approx_count_distinct") { (s, d) =>
      Tables(s, d, "lineitem").agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
    },

    // A4: argmax per group — best order per customer (deterministic tiebreak)
    // (reference: best/worst update, optimization_driver.py:379-396).
    // max_by over struct(price, -orderkey) = one hash aggregate with map-side
    // partials — no window sort, no per-group shuffle of full rows. Ties on
    // price resolve to the LOWEST orderkey (negation flips the struct order),
    // matching the oracle's ORDER BY o_totalprice DESC, o_orderkey.
    QueryDef("a4_argmax",
      """SELECT o_custkey, o_orderkey AS best_order, o_totalprice AS best_price
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) = 1""".stripMargin) { (s, d) =>
      Tables(s, d, "orders")
        .groupBy("o_custkey")
        .agg(
          max_by(col("o_orderkey"), struct(col("o_totalprice"), -col("o_orderkey"))).as("best_order"),
          max(col("o_totalprice")).as("best_price"))
    },

    // A6: distinct projection (dropDuplicates on the projected key set).
    QueryDef("a6_distinct",
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") { (s, d) =>
      Tables(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct()
    },

    // A7: exact quantiles per group (TPE γ-split / median stopping rule,
    // reference: maggy/optimizer/bayes/tpe.py:206-216, earlystop/medianrule.py:44-46).
    QueryDef("a7_percentile",
      """SELECT c_nationkey,
        |       round(quantile_cont(c_acctbal, 0.5), 6) AS median_bal,
        |       round(quantile_cont(c_acctbal, 0.9), 6) AS p90_bal,
        |       count(*) AS n
        |FROM customer GROUP BY c_nationkey""".stripMargin) { (s, d) =>
      Tables(s, d, "customer")
        .groupBy("c_nationkey")
        .agg(
          round(expr("percentile(c_acctbal, 0.5)"), 6).as("median_bal"),
          round(expr("percentile(c_acctbal, 0.9)"), 6).as("p90_bal"),
          count(lit(1)).as("n"))
    },

    // A8: rollup nation → region (engine built-in; no reference analog).
    QueryDef("a8_rollup",
      """SELECT r_name, n_name,
        |       round(CAST(sum(CAST(c_acctbal AS DECIMAL(22,8))) AS DOUBLE), 2) AS total_bal,
        |       count(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin) { (s, d) =>
      Tables(s, d, "customer").as("c")
        .join(broadcast(Tables(s, d, "nation")).as("n"), col("c.c_nationkey") === col("n.n_nationkey"))
        .join(broadcast(Tables(s, d, "region")).as("r"), col("n.n_regionkey") === col("r.r_regionkey"))
        .rollup(col("r.r_name").as("r_name"), col("n.n_name").as("n_name"))
        .agg(moneySum(col("c_acctbal")).as("total_bal"), count(lit(1)).as("n_cust"))
    },

    // A13: conditional/filtered aggregation — per-group metrics computed
    // under different predicates in ONE pass (count_if / FILTER clause /
    // bool aggregates), instead of N filtered subqueries re-scanning the
    // fact. One aggregation, partial+final as usual.
    QueryDef("a13_filtered_agg",
      """SELECT l_returnflag,
        |       count(*) AS n,
        |       count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |       count(*) FILTER (WHERE l_quantity >= 30) AS n_bulk,
        |       CAST(bool_and(l_quantity > 0) AS BOOLEAN) AS all_positive,
        |       CAST(bool_or(l_discount = 0) AS BOOLEAN) AS any_no_discount
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          count_if(col("l_discount") > 0.05).as("n_discounted"),
          count_if(col("l_quantity") >= 30).as("n_bulk"),
          bool_and(col("l_quantity") > 0).as("all_positive"),
          bool_or(col("l_discount") === 0).as("any_no_discount"))
    },

    // A8c: full cube — every combination of the two axes including both
    // marginals and the grand total (completes the rollup/grouping-sets/cube
    // trio). One pass; Catalyst expands to an Expand + single aggregation.
    QueryDef("a8c_cube",
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n,
        |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(22,8))) AS DOUBLE), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderpriority)""".stripMargin) { (s, d) =>
      // Pre-aggregate on the FULL grouping key before the cube: Expand
      // multiplies its input by the number of grouping sets (×4 here)
      // BEFORE any aggregation, so cubing the raw join feeds 4× the fact
      // rows through partial agg — 13.6 s on the 100× corpus. The grouped
      // pre-image is |seg|×|prio| (~25) rows; count and an exact DECIMAL
      // sum re-aggregate losslessly (sum-of-counts / sum-of-sums, decimal
      // addition associative), and rounding happens once at the end, so
      // the oracle's direct-CUBE formulation hash-matches unchanged.
      val pre = Tables(s, d, "orders")
        .join(broadcast(Tables(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("pn"), sum(dec4(col("o_totalprice"))).as("pt"))
      pre.cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(sum(col("pn")).as("n"), round(sum(col("pt")).cast("double"), 2).as("total"))
    },

    // A7b: approx percentile (t-digest style sketch) — the streaming/
    // mergeable analog of a7's exact quantiles; engine-specific accuracy →
    // no SQL oracle; DataPlaneSpec bounds it against a7's exact values.
    QueryDef.noOracle("a7b_approx_percentile") { (s, d) =>
      Tables(s, d, "customer")
        .groupBy("c_nationkey")
        .agg(
          round(expr("approx_percentile(c_acctbal, 0.5, 1000)"), 6).as("median_bal"),
          round(expr("approx_percentile(c_acctbal, 0.9, 1000)"), 6).as("p90_bal"))
    },

    // A8b: explicit GROUPING SETS with grouping() markers — finer control
    // than rollup (the per-region and per-mktsegment marginals in one pass,
    // without the cross cells a cube would add).
    QueryDef("a8b_grouping_sets",
      """SELECT r_name, c_mktsegment,
        |       CAST(GROUPING(r_name) AS INT) AS g_region,
        |       CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
        |       round(CAST(sum(CAST(c_acctbal AS DECIMAL(22,8))) AS DOUBLE), 2) AS total_bal,
        |       count(*) AS n
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())""".stripMargin) { (s, d) =>
      Tables(s, d, "customer")
        .join(broadcast(Tables(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupingSets(
          Seq(Seq(col("r_name")), Seq(col("c_mktsegment")), Seq.empty),
          col("r_name"), col("c_mktsegment"))
        .agg(
          grouping(col("r_name")).cast("int").as("g_region"),
          grouping(col("c_mktsegment")).cast("int").as("g_seg"),
          moneySum(col("c_acctbal")).as("total_bal"),
          count(lit(1)).as("n"))
    },

    // A10: pivot (conditional aggregation spread into columns) — the
    // result-matrix shape (configs × budgets) of a multi-fidelity study.
    // Spark's relational pivot == oracle's CASE WHEN sums.
    QueryDef("a10_pivot",
      """SELECT l_returnflag,
        |       round(CAST(sum(CASE WHEN l_linestatus = 'F'
        |                    THEN CAST(l_quantity AS DECIMAL(22,8)) END) AS DOUBLE), 2) AS F,
        |       round(CAST(sum(CASE WHEN l_linestatus = 'O'
        |                    THEN CAST(l_quantity AS DECIMAL(22,8)) END) AS DOUBLE), 2) AS O
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(moneySum(col("l_quantity")))
    },

    // A11: statistical aggregates (stddev/variance/correlation/covariance) —
    // the spread/association measures a result analysis computes over trials.
    QueryDef("a11_stats_agg",
      """SELECT c_nationkey,
        |       round(stddev_samp(c_acctbal), 4) AS bal_sd,
        |       round(var_samp(c_acctbal), 4) AS bal_var,
        |       round(corr(c_acctbal, c_custkey), 6) AS bal_key_corr,
        |       round(covar_samp(c_acctbal, c_custkey), 4) AS bal_key_cov,
        |       count(*) AS n
        |FROM customer GROUP BY c_nationkey""".stripMargin) { (s, d) =>
      Tables(s, d, "customer")
        .groupBy("c_nationkey")
        .agg(
          round(stddev_samp(col("c_acctbal")), 4).as("bal_sd"),
          round(var_samp(col("c_acctbal")), 4).as("bal_var"),
          round(corr(col("c_acctbal"), col("c_custkey")), 6).as("bal_key_corr"),
          round(covar_samp(col("c_acctbal"), col("c_custkey")), 4).as("bal_key_cov"),
          count(lit(1)).as("n"))
    },

    // A12: skew-salted two-stage aggregation. l_returnflag has 3 values —
    // a direct groupBy at 100 TB funnels a third of the table into one
    // reducer. Stage 1 groups by (key, salt=orderkey%16) so the heavy key
    // spreads over 16 reducers; stage 2 combines the 16 partials per key.
    // Decimal partials keep the two-stage sum exact, so the result is
    // bit-equal to the oracle's one-shot GROUP BY.
    QueryDef("a12_salted_agg",
      """SELECT l_returnflag,
        |       count(*) AS n,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(22,8))) AS DOUBLE), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"), pmod(col("l_orderkey"), lit(16)).as("salt"))
        .agg(count(lit(1)).as("pn"), sum(dec4(col("l_quantity"))).as("pq"))
        .groupBy("l_returnflag")
        .agg(
          sum(col("pn")).as("n"),
          round(sum(col("pq")).cast("double"), 2).as("sum_qty"))
    },

    // A9: ordered history assembly per key
    // (reference: metric_history append, maggy/trial.py:93-108).
    QueryDef("a9_collect_sorted",
      """SELECT user_id,
        |       string_agg(event_type, '|' ORDER BY event_type) AS type_seq,
        |       count(*) AS n
        |FROM events GROUP BY user_id""".stripMargin) { (s, d) =>
      Tables(s, d, "events")
        .groupBy("user_id")
        .agg(
          array_join(array_sort(collect_list(col("event_type"))), "|").as("type_seq"),
          count(lit(1)).as("n"))
    }
  )
}
