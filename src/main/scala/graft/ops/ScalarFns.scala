package graft.ops

import graft.data.Tables
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY §2.B "Scalar functions").
  *
  * Provenance: prefix-group matching (reference: maggy/ablation/ablator/
  * loco.py:123-126 — startswith), duration math (maggy/util.py:256-272),
  * uniform sampling + clip (maggy/searchspace.py:195-205,384-399), Hyperband
  * budget log/pow (maggy/pruner/hyperband.py:115-124), trial-id md5
  * (maggy/trial.py:110-136). All codegen'd built-ins — no UDFs.
  */
object ScalarFns {
  val entries: Seq[QueryDef] = Seq(
    // String functions.
    QueryDef("f_string",
      """SELECT p_partkey,
        |       lower(p_name) AS name_lo,
        |       upper(p_brand) AS brand_up,
        |       length(p_name) AS name_len,
        |       concat(p_brand, '#', p_type) AS brand_type,
        |       substr(p_name, 1, 5) AS name_pfx,
        |       (p_type LIKE 'STANDARD%') AS is_standard,
        |       levenshtein(p_brand, 'Brand#13') AS lev,
        |       regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
        |       md5(p_name) AS name_hash
        |FROM part""".stripMargin) { (s, d) =>
      Tables(s, d, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lo"),
        upper(col("p_brand")).as("brand_up"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        col("p_type").like("STANDARD%").as("is_standard"),
        levenshtein(col("p_brand"), lit("Brand#13")).as("lev"),
        regexp_extract(col("p_type"), "([A-Z]+)", 1).as("first_word"),
        md5(col("p_name")).as("name_hash"))
    },

    // Date/time functions (durations: reference maggy/util.py:256-272).
    QueryDef("f_datetime",
      """SELECT o_orderkey,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
        |       year(o_orderdate) AS order_year,
        |       month(o_orderdate) AS order_mon,
        |       datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since,
        |       epoch_us(o_orderdate) // 1000000 AS unix_sec
        |FROM orders""".stripMargin) { (s, d) =>
      Tables(s, d, "orders").select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("order_month"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_mon"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000").as("unix_sec"))
    },

    // Math functions (log/pow from Hyperband budgets; clip from searchspace).
    QueryDef("f_math",
      """SELECT l_orderkey, l_linenumber,
        |       round(ln(l_extendedprice), 6) AS log_price,
        |       round(sqrt(l_quantity), 6) AS sqrt_qty,
        |       round(pow(l_discount, 2), 9) AS disc_sq,
        |       round(exp(l_discount), 6) AS exp_disc,
        |       greatest(l_tax, l_discount) AS hi,
        |       least(l_tax, l_discount) AS lo,
        |       abs(l_quantity - 25) AS qty_dev,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |       l_orderkey % 7 AS key_mod
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(log(col("l_extendedprice")), 6).as("log_price"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
        round(pow(col("l_discount"), 2), 9).as("disc_sq"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        greatest(col("l_tax"), col("l_discount")).as("hi"),
        least(col("l_tax"), col("l_discount")).as("lo"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        (col("l_orderkey") % 7).as("key_mod"))
    },

    // String functions, second bundle: padding/translation/splitting.
    QueryDef("f_string2",
      """SELECT p_partkey,
        |       lpad(p_brand, 12, '*') AS brand_lpad,
        |       rpad(p_brand, 12, '*') AS brand_rpad,
        |       translate(p_type, 'AEO', 'aeo') AS type_tr,
        |       split_part(p_name, ' ', 1) AS first_word,
        |       reverse(p_brand) AS brand_rev,
        |       repeat('-', p_size % 5) AS dashes,
        |       replace(p_type, 'STANDARD', 'STD') AS type_std,
        |       instr(p_name, 'a') AS first_a,
        |       ascii(p_brand) AS first_code,
        |       chr(65 + p_size % 26) AS size_chr
        |FROM part""".stripMargin) { (s, d) =>
      Tables(s, d, "part").select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("brand_lpad"),
        rpad(col("p_brand"), 12, "*").as("brand_rpad"),
        translate(col("p_type"), "AEO", "aeo").as("type_tr"),
        split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
        reverse(col("p_brand")).as("brand_rev"),
        repeat(lit("-"), (col("p_size") % 5).cast("int")).as("dashes"),
        regexp_replace(col("p_type"), "STANDARD", "STD").as("type_std"),
        instr(col("p_name"), "a").as("first_a"),
        ascii(col("p_brand")).as("first_code"),
        chr(lit(65) + col("p_size") % 26).as("size_chr"))
    },

    // Date/time functions, second bundle: calendar parts + arithmetic.
    QueryDef("f_datetime2",
      """SELECT o_orderkey,
        |       day(o_orderdate) AS dom,
        |       quarter(o_orderdate) AS qtr,
        |       weekofyear(o_orderdate) AS iso_week,
        |       last_day(o_orderdate) AS month_end,
        |       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus_30d,
        |       make_date(year(o_orderdate), month(o_orderdate), 1) AS month_start
        |FROM orders""".stripMargin) { (s, d) =>
      Tables(s, d, "orders").select(
        col("o_orderkey"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        last_day(col("o_orderdate")).as("month_end"),
        date_add(col("o_orderdate"), 30).as("plus_30d"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("month_start"))
    },

    // Math functions, second bundle: logs, roots, sign, bit ops.
    QueryDef("f_math2",
      """SELECT l_orderkey, l_linenumber,
        |       round(log2(l_extendedprice), 6) AS log2_price,
        |       round(log10(l_extendedprice), 6) AS log10_price,
        |       CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_side,
        |       round(cbrt(l_quantity), 6) AS qty_cbrt,
        |       l_orderkey & 255 AS key_lo,
        |       xor(l_orderkey, l_partkey) AS key_mix,
        |       l_linenumber << 3 AS ln_shift,
        |       CAST(round(l_extendedprice, -2) AS DOUBLE) AS price_hundreds
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(log(2.0, col("l_extendedprice")), 6).as("log2_price"),
        round(log(10.0, col("l_extendedprice")), 6).as("log10_price"),
        signum(col("l_discount") - 0.05).cast("long").as("disc_side"),
        round(cbrt(col("l_quantity")), 6).as("qty_cbrt"),
        col("l_orderkey").bitwiseAND(255).as("key_lo"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("key_mix"),
        shiftleft(col("l_linenumber"), 3).as("ln_shift"),
        round(col("l_extendedprice"), -2).as("price_hundreds"))
    },

    // Map functions (params-dict semantics, reference: maggy/trial.py:68).
    // The map is built from columns and immediately deconstructed with
    // map_keys/map_values/element_at — the oracle computes the same values
    // directly, so the map round-trip must be the identity. Spark map()
    // preserves insertion order, making map_values deterministic.
    QueryDef("f_map",
      """SELECT p_partkey,
        |       3 AS n_keys,
        |       'brand,name,type' AS keys_sorted,
        |       p_brand AS brand,
        |       p_type  AS typ,
        |       concat_ws('|', p_brand, p_type, p_name) AS vals
        |FROM part""".stripMargin) { (s, d) =>
      val m = map(
        lit("brand"), col("p_brand"),
        lit("type"), col("p_type"),
        lit("name"), col("p_name"))
      Tables(s, d, "part").select(
        col("p_partkey"),
        size(m).as("n_keys"),
        array_join(array_sort(map_keys(m)), ",").as("keys_sorted"),
        element_at(m, "brand").as("brand"),
        element_at(m, "type").as("typ"),
        array_join(map_values(m), "|").as("vals"))
    },

    // Array functions over the embedding column (J9 building blocks).
    QueryDef("f_array",
      """SELECT vec_id,
        |       len(embedding) AS dim,
        |       round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
        |       round(CAST(embedding[64] AS DOUBLE), 6) AS last_elem,
        |       label
        |FROM embeddings""".stripMargin) { (s, d) =>
      Tables(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_elem"),
        round(element_at(col("embedding"), 64).cast("double"), 6).as("last_elem"),
        col("label"))
    },

    // Higher-order array functions: filter / exists / forall / aggregate —
    // the lambda surface LLM-pipeline feature code leans on (all codegen'd
    // scalar loops, no UDFs). DuckDB expresses exists/forall via
    // list_filter lengths; aggregate via list_sum over a transform (both
    // engines fold sequentially, and round(…,6) absorbs any last-ulp drift).
    QueryDef("f_array2",
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT vec_id,
        |       len(list_filter(e, x -> x > 0.5)) AS n_big,
        |       len(list_filter(e, x -> x > 0)) > 0 AS has_pos,
        |       len(list_filter(e, x -> abs(x) <= 2)) = len(e) AS all_bounded,
        |       round(list_sum(list_transform(e, x -> abs(x))), 6) AS l1_norm
        |FROM v""".stripMargin) { (s, d) =>
      val e = col("embedding").cast("array<double>")
      Tables(s, d, "embeddings").select(
        col("vec_id"),
        size(filter(e, x => x > 0.5)).as("n_big"),
        exists(e, x => x > 0).as("has_pos"),
        forall(e, x => abs(x) <= 2).as("all_bounded"),
        round(aggregate(e, lit(0.0), (acc, x) => acc + abs(x)), 6).as("l1_norm"))
    }
  )
}
