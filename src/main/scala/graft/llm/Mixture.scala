package graft.llm

import graft.data.Tables
import graft.ops.QueryDef
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixture operators over `documents` (north-star extension): the
  * data-mixing pass every large-scale training pipeline runs between
  * dedup/filtering and shard export — compute per-domain sampling weights
  * (temperature-scaled, the multilingual-training recipe: p_i ∝ n_i^α keeps
  * low-resource domains from vanishing and high-resource domains from
  * dominating), then draw a deterministic per-domain sample realizing those
  * weights under a document budget.
  *
  * Reference tie-in: the reference's only sampling machinery is searchspace
  * config sampling (maggy/searchspace.py:180-208), which fixes the seeded-
  * determinism requirement; the mixture math itself is the standard public
  * recipe (temperature/alpha-scaled multinomial over domain sizes).
  *
  * Scale design: both operators reduce the corpus to ONE row per domain
  * before any non-map-side work. x5 is a single map-side-combined groupBy
  * (domain cardinality is thousands at 100 TB — the whole-frame window over
  * it is KB-sized, a driver-scale step on purpose). x6 routes the per-domain
  * rates back through a BROADCAST join and keeps rows with a pure map-side
  * hash predicate — the corpus itself never shuffles, exactly like p5/p6:
  * retry-invariant, partitioning-invariant, no RNG.
  *
  * Exactness: α = 0.5 via sqrt, which IEEE 754 requires correctly rounded
  * (unlike pow/ln) — Spark and DuckDB produce bit-identical weights from
  * identical counts; the final weight is round(·, 6) so the ≤1-ulp
  * summation-order variance of the 20-domain sqrt-sum cannot surface.
  */
object Mixture {

  private def toks = split(col("text"), " ")

  /** Document budget for x6 — small enough that sf0.01's 25-doc domains get
    * rate < 1 (the interesting regime) and sf0.001's ~2-doc domains hit the
    * rate-cap branch (min(1, ·)), so both CASE arms are oracle-exercised. */
  private[graft] val SampleBudget = 200

  val entries: Seq[QueryDef] = Seq(
    // x5: temperature-scaled mixture weights per domain (`source`), plus the
    // token allocation each domain receives under a 1M-token budget.
    // alloc = floor(budget · w) — floor, not round, because floor is exact
    // on doubles while round's tie semantics differ across engines.
    QueryDef("x5_mixture_weights",
      """WITH ct AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT *, sqrt(CAST(n_tokens AS DOUBLE)) AS sw FROM ct)
        |SELECT source, n_docs, n_tokens,
        |       round(sw / sum(sw) OVER (), 6) AS weight,
        |       CAST(floor(1000000 * sw / sum(sw) OVER ()) AS BIGINT) AS alloc_tokens
        |FROM w""".stripMargin) { (s, d) =>
      val ct = Tables(s, d, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(toks)).cast("long").as("n_tokens"))
      val w = ct.withColumn("sw", sqrt(col("n_tokens").cast("double")))
      // whole-frame window: one row per domain exists by this point, so the
      // single-partition window is KB-sized at any corpus scale
      val total = sum(col("sw")).over(Window.partitionBy())
      w.select(
        col("source"), col("n_docs"), col("n_tokens"),
        round(col("sw") / total, 6).as("weight"),
        floor(lit(1000000) * col("sw") / total).cast("long").as("alloc_tokens"))
    },

    // x6: realize the x5 mixture as an actual sample under a document
    // budget: per-domain keep-rate r_i = min(1, budget·w_i / n_docs_i),
    // membership decided by the Knuth-hash uniform on doc_id (Sampling
    // .keyUniform) — deterministic, map-side, oracle-replicable. The rates
    // frame is one row per domain → broadcast join; the corpus never
    // shuffles (only the final per-domain aggregate does).
    QueryDef("x6_mixture_sample",
      s"""WITH ct AS (
         |  SELECT source, count(*) AS n_docs,
         |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |w AS (SELECT source, n_docs,
         |             sqrt(CAST(n_tokens AS DOUBLE)) / sum(sqrt(CAST(n_tokens AS DOUBLE))) OVER () AS wt
         |      FROM ct),
         |r AS (SELECT source,
         |             CASE WHEN $SampleBudget * wt / n_docs > 1.0 THEN 1.0
         |                  ELSE $SampleBudget * wt / n_docs END AS rate
         |      FROM w)
         |SELECT d.source, count(*) AS n_kept, CAST(sum(d.doc_id) AS BIGINT) AS key_sum
         |FROM documents d JOIN r USING (source)
         |WHERE CAST((d.doc_id * 2654435761) % 2147483648 AS DOUBLE) / 2147483648 < r.rate
         |GROUP BY d.source""".stripMargin) { (s, d) =>
      val docs = Tables(s, d, "documents")
      val ct = docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(toks)).cast("long").as("n_tokens"))
      docs.join(broadcast(ratesFor(ct, SampleBudget)), "source")
        .filter(Sampling.keyUniform(col("doc_id")) < col("rate"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).cast("long").as("key_sum"))
    },

    // x7: the END-TO-END prep manifest — the composition a pipeline actually
    // commits: C4-style quality gate (t11's predicate, shared code) →
    // exact dedup keepers (d1 semantics: min doc_id per md5(text)) →
    // temperature mixture RE-COMPUTED over the survivors (weights must
    // follow the filtered corpus, not the raw one) → budgeted deterministic
    // sample → per-domain manifest (docs, tokens, keeper id-sum). Every
    // stage is individually oracle-checked (t11/d1/x5/x6); this query
    // checks they COMPOSE — aliasing, null-handling, and determinism
    // survive the chain. Scale: gate+fingerprint are map-side; the dedup
    // groupBy shuffles 16-byte hashes + ints (never text); everything after
    // operates on one row per domain or a broadcast-joined map-side filter.
    QueryDef("x7_pipeline_manifest",
      s"""WITH gated AS (
         |  SELECT doc_id, source, text,
         |         len(string_split(text, ' ')) AS n_tokens
         |  FROM documents
         |  WHERE ${TextStats.qualityPassSql}),
         |ded AS (
         |  SELECT min(doc_id) AS keeper, min(source) AS source,
         |         min(n_tokens) AS n_tokens
         |  FROM gated GROUP BY md5(text)),
         |ct AS (
         |  SELECT source, count(*) AS n_docs,
         |         CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |  FROM ded GROUP BY source),
         |w AS (SELECT source, n_docs,
         |             sqrt(CAST(n_tokens AS DOUBLE)) / sum(sqrt(CAST(n_tokens AS DOUBLE))) OVER () AS wt
         |      FROM ct),
         |r AS (SELECT source,
         |             CASE WHEN $SampleBudget * wt / n_docs > 1.0 THEN 1.0
         |                  ELSE $SampleBudget * wt / n_docs END AS rate
         |      FROM w)
         |SELECT d.source, count(*) AS n_docs,
         |       CAST(sum(d.n_tokens) AS BIGINT) AS total_tokens,
         |       CAST(sum(d.keeper) AS BIGINT) AS keeper_sum
         |FROM ded d JOIN r USING (source)
         |WHERE CAST((d.keeper * 2654435761) % 2147483648 AS DOUBLE) / 2147483648 < r.rate
         |GROUP BY d.source""".stripMargin) { (s, d) =>
      val survivors = Tables(s, d, "documents")
        .filter(TextStats.qualityPass)
        .select(col("doc_id"), col("source"), size(toks).as("n_tokens"),
          md5(col("text")).as("h"))
        .groupBy("h")
        .agg(min(col("doc_id")).as("keeper"), min(col("source")).as("source"),
          min(col("n_tokens")).as("n_tokens"))
      val ct = survivors.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).cast("long").as("n_tokens"))
      survivors.join(broadcast(ratesFor(ct, SampleBudget)), "source")
        .filter(Sampling.keyUniform(col("keeper")) < col("rate"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          sum(col("keeper")).cast("long").as("keeper_sum"))
    }
  )

  /** Per-domain keep-rates realizing the sqrt-temperature mixture under a
    * document budget: rate_i = min(1, budget·w_i / n_docs_i). Input: one
    * row per domain with (source, n_docs, n_tokens); output: (source,
    * rate) — KB-sized, meant to ride a broadcast join back to the corpus.
    * Shared by x6 (raw corpus) and x7 (post-gate/dedup survivors). */
  def ratesFor(perSource: org.apache.spark.sql.DataFrame, budget: Int): org.apache.spark.sql.DataFrame = {
    val total = sum(sqrt(col("n_tokens").cast("double"))).over(Window.partitionBy())
    perSource
      .withColumn("wt", sqrt(col("n_tokens").cast("double")) / total)
      .select(col("source"),
        least(lit(1.0), lit(budget) * col("wt") / col("n_docs")).as("rate"))
  }
}
