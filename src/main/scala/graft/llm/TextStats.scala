package graft.llm

import graft.data.Tables
import graft.ops.QueryDef
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (north-star extension):
  * language ID (dictionary-hit scoring), quality scoring, token counting,
  * document fingerprinting. All columnar built-ins — the shuffles carry
  * (doc_id, token-hash) pairs, never full texts.
  */
object TextStats {

  private def toks = split(col("text"), " ")

  /** Tiny per-language marker dictionary for the heuristic language-ID.
    * Deterministic + SQL-expressible so the oracle can replicate it. */
  val langDict: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of",
    "es" -> "el", "es" -> "la", "es" -> "de",
    "fr" -> "le", "fr" -> "la", "fr" -> "et",
    "de" -> "der", "de" -> "die", "de" -> "und")

  private val dictValuesSql =
    langDict.map { case (l, w) => s"('$l','$w')" }.mkString(", ")

  /** t14's per-(doc, gram) count table — (doc_id, gh: long, c: long), one
    * row per distinct 5-gram a doc contains. Extracted so PlanSpec can
    * audit the gram-build half of the plan (generator discipline, map-side
    * combine, single corpus scan); the query plans this build once per
    * branch (see the t14 QueryDef comment for the two-scan rationale). Gram key = one multi-arg xxhash64 over the
    * 5 tokens (the d7b idiom): no per-gram string allocation, 8-byte join
    * keys (see the t14 QueryDef comment for the oracle-parity argument). */
  private[graft] def boilerplateGramCounts(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Tables(s, d, "documents").filter(size(toks) >= 5)
      .select(col("doc_id"), toks.as("ts"))
      .select(col("doc_id"),
        transform(sequence(lit(1), size(col("ts")) - 4), i =>
          xxhash64((0 until 5).map(j => element_at(col("ts"), i + j)): _*)).as("ghs"))
      .select(col("doc_id"), explode_outer(col("ghs")).as("gh"))
      .groupBy("doc_id", "gh").agg(count(lit(1)).as("c"))

  val entries: Seq[QueryDef] = Seq(
    // Language ID: count dictionary hits per (doc, lang); argmax with a
    // deterministic tie order; docs with zero hits → 'und'.
    QueryDef("t1_lang_id",
      s"""WITH dict(lang, word) AS (VALUES $dictValuesSql),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         |scores AS (
         |  SELECT t.doc_id, d.lang, count(*) AS hits
         |  FROM tok t JOIN dict d ON t.word = d.word
         |  GROUP BY t.doc_id, d.lang),
         |best AS (
         |  SELECT doc_id, lang AS pred_lang, hits,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
         |  FROM scores)
         |SELECT doc_id, coalesce(b.pred_lang, 'und') AS pred_lang,
         |       coalesce(b.hits, 0) AS hits
         |FROM documents LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)""".stripMargin) { (s, d) =>
      val docs = Tables(s, d, "documents")
      val dict = broadcast(s.createDataFrame(langDict).toDF("lang", "word"))
      val tok = docs.select(col("doc_id"), explode(toks).as("word"))
      val scores = tok.join(dict, "word").groupBy("doc_id", "lang").agg(count(lit(1)).as("hits"))
      val w = Window.partitionBy("doc_id").orderBy(col("hits").desc, col("lang"))
      val best = scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      docs.select("doc_id").join(best, Seq("doc_id"), "left_outer")
        .select(
          col("doc_id"),
          coalesce(col("lang"), lit("und")).as("pred_lang"),
          coalesce(col("hits"), lit(0L)).as("hits"))
    },

    // Quality scoring: length, token count, type-token ratio, stopword ratio,
    // mean token length — the standard cheap text-quality features.
    QueryDef("t2_quality_score",
      """SELECT doc_id,
        |       length(text) AS n_chars_m,
        |       len(string_split(text, ' ')) AS n_tokens,
        |       round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
        |             len(string_split(text, ' ')), 6) AS ttr,
        |       round(CAST(len(list_filter(string_split(text, ' '),
        |                       x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) /
        |             len(string_split(text, ' ')), 6) AS stopword_ratio,
        |       round((CAST(length(text) AS DOUBLE) - len(string_split(text, ' ')) + 1) /
        |             len(string_split(text, ' ')), 6) AS mean_tok_len
        |FROM documents""".stripMargin) { (s, d) =>
      val nTok = size(toks)
      Tables(s, d, "documents").select(
        col("doc_id"),
        length(col("text")).as("n_chars_m"),
        nTok.as("n_tokens"),
        round(size(array_distinct(toks)).cast("double") / nTok, 6).as("ttr"),
        round(size(filter(toks, x => x.isin("the", "a", "of", "and"))).cast("double") / nTok, 6)
          .as("stopword_ratio"),
        round((length(col("text")).cast("double") - nTok + 1) / nTok, 6).as("mean_tok_len"))
    },

    // Global token frequency (vocabulary histogram) — explode + count.
    QueryDef("t3_token_freq",
      """SELECT word, count(*) AS n, count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word""".stripMargin) { (s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), explode(toks).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
    },

    // BPE-style pre-tokenization counting: a GPT-2-ish regex (contraction
    // suffixes | space-prefixed letter runs | digit runs | punctuation runs
    // | whitespace) — kept lookahead-free so Java regex (Spark) and RE2
    // (DuckDB) agree. The piece count is the standard "token budget"
    // estimate a training pipeline computes per document.
    QueryDef("t5_bpe_tokens",
      """SELECT doc_id,
        |       len(pieces) AS n_pieces,
        |       len(list_distinct(pieces)) AS n_unique,
        |       round(CAST(len(pieces) AS DOUBLE) /
        |             len(string_split(text, ' ')), 6) AS pieces_per_word
        |FROM (
        |  SELECT doc_id, text,
        |         regexp_extract_all(text,
        |           '''(?:ll|ve|re|[sdmt])| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+') AS pieces
        |  FROM documents)""".stripMargin) { (s, d) =>
      // lit() keeps the backslashes intact — a SQL string literal would
      // strip the \p / \s escapes before the regex engine saw them
      val pat = "'(?:ll|ve|re|[sdmt])| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
      val pieces = regexp_extract_all(col("text"), lit(pat), lit(0))
      Tables(s, d, "documents").select(
        col("doc_id"),
        size(pieces).as("n_pieces"),
        size(array_distinct(pieces)).as("n_unique"),
        round(size(pieces).cast("double") / size(toks), 6).as("pieces_per_word"))
    },

    // Document fingerprint: minimum md5 over rolling 5-token shingles
    // (winnowing-style). md5 exists in both engines → oracle-checkable.
    QueryDef("t4_fingerprint",
      """SELECT doc_id,
        |       list_min(list_transform(
        |         range(1, greatest(len(string_split(text,' ')) - 3, 2)),
        |         i -> md5(array_to_string(string_split(text,' ')[i:i+4], ' ')))) AS fingerprint
        |FROM documents""".stripMargin) { (s, d) =>
      // Shingle string via concat_ws over element_at, NOT slice+array_join:
      // the slice formulation allocates an array copy AND a joined string
      // per shingle inside the interpreted higher-order eval — measured
      // 13.5 s at the 100× corpus vs ~5 s for this shape (t14's idiom).
      // Tail clamp parity: past-the-end try_element_at yields null — even
      // under ANSI mode, where plain element_at would throw
      // INVALID_ARRAY_INDEX_IN_ELEMENT_AT on any doc shorter than 5 tokens
      // — and concat_ws skips nulls, which is exactly the clamped slice's
      // join (and DuckDB's ts[i:i+4] clamped slice in the oracle).
      val t = Tables(s, d, "documents")
        .select(col("doc_id"), toks.as("ts"))
      val sh = transform(
        sequence(lit(1), greatest(size(col("ts")) - 4, lit(1))),
        i => md5(concat_ws(" ", (0 until 5).map(j => try_element_at(col("ts"), i + j)): _*)))
      t.select(col("doc_id"), array_min(sh).as("fingerprint"))
    },

    // BPE vocabulary training, core step: corpus-wide adjacent token-pair
    // frequencies (each merge round of a BPE trainer picks argmax of exactly
    // this table). Window-lead over the per-doc token sequence — one
    // (doc_id)-keyed shuffle, then the counting aggregate; HAVING >= 5
    // because only frequent pairs are merge candidates.
    QueryDef("t7_merge_pairs",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
        |         generate_subscripts(string_split(text,' '), 1) AS pos
        |  FROM documents)
        |SELECT a.tok AS w1, b.tok AS w2, count(*) AS n
        |FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |GROUP BY w1, w2 HAVING count(*) >= 5""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("doc_id").orderBy("pos")
      Tables(s, d, "documents")
        .select(col("doc_id"), posexplode(toks).as(Seq("pos", "w1")))
        .withColumn("w2", lead(col("w1"), 1).over(w))
        .filter(col("w2").isNotNull)
        .groupBy("w1", "w2")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 5)
    },

    // Unigram log-probability scoring (perplexity proxy): p(word) from
    // corpus frequencies, per-doc mean of -ln p — the cheap quality signal
    // pipelines threshold on before an LM-based pass. Two aggregations and
    // a token→freq join; the 1-row total broadcasts. (ln is not
    // correctly-rounded across libms, but the per-doc MEAN rounded to 1e-6
    // is ~10 orders of magnitude above any last-ulp drift.)
    QueryDef("t8_unigram_logprob",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents),
        |freq AS (SELECT word, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY word),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq)
        |SELECT doc_id, count(*) AS n_tokens,
        |       round(avg(-ln(c / t)), 6) AS avg_neg_logprob
        |FROM tok JOIN freq USING (word) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin) { (s, d) =>
      val tok = Tables(s, d, "documents").select(col("doc_id"), explode(toks).as("word"))
      val freq = tok.groupBy("word").agg(count(lit(1)).cast("double").as("c"))
      val tot = freq.agg(sum(col("c")).as("t"))
      tok.join(freq, "word")
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(-log(col("c") / col("t"))), 6).as("avg_neg_logprob"))
    },

    // Text cleaning: lowercase → strip non-alphanumerics → collapse runs of
    // spaces → trim. The canonical pre-tokenization normalization pass;
    // output is hashed so the oracle compares full cleaned strings without
    // shipping them. Narrow map-side work — no shuffle at any scale.
    // (DuckDB regexp_replace needs the 'g' flag for replace-all; Spark
    // replaces all matches by default.)
    QueryDef("t6_clean_text",
      """SELECT doc_id, md5(clean) AS clean_hash, length(clean) AS clean_len
        |FROM (
        |  SELECT doc_id,
        |         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                             '  +', ' ', 'g')) AS clean
        |  FROM documents)""".stripMargin) { (s, d) =>
      // Single-pass native expression ≡ the regex chain (CleanText scaladoc
      // + FunctionsSpec equality property); the chain was the one scan
      // where JVM-regex stepping set the constant at the 100× corpus.
      val clean = org.apache.spark.sql.GraftExpressionBridge.columnOf(
        graft.functions.CleanText(
          org.apache.spark.sql.GraftExpressionBridge.expressionOf(col("text"))))
      Tables(s, d, "documents").select(
        col("doc_id"), md5(clean).as("clean_hash"), length(clean).as("clean_len"))
    },

    // Sequence packing: concat-and-chunk documents into fixed token-budget
    // bins (the GPT-style pretraining batch layout). Docs are ordered
    // deterministically (doc_id) inside (source, shard) and a doc's bin is
    // where its exclusive running token offset lands; a doc straddling a
    // boundary belongs to the bin its first token falls in, so bins can
    // overflow by at most one document — exactly concat-then-chunk
    // semantics. 100 TB note: a single running sum per source would
    // serialize each source into one partition; the shard key (doc_id % 4
    // here; hash-bucket count sized to corpus/partition-target in
    // deployment) bounds every window partition while leaving bin quality
    // unchanged — packing loses nothing by being computed per shard.
    QueryDef("t9_pack_sequences",
      """WITH t AS (
        |  SELECT source, doc_id % 4 AS shard, doc_id,
        |         len(string_split(text,' ')) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT source, shard, doc_id, tok,
        |         coalesce(sum(tok) OVER (PARTITION BY source, shard ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM t)
        |SELECT source, shard, CAST(off // 512 AS BIGINT) AS bin_id,
        |       count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("source", "shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, d, "documents")
        .select(col("source"), (col("doc_id") % 4).as("shard"),
          col("doc_id"), size(toks).cast("long").as("tok"))
        .withColumn("off", coalesce(sum(col("tok")).over(w), lit(0L)))
        .withColumn("bin_id", expr("off div 512"))
        .groupBy("source", "shard", "bin_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("bin_tokens"))
    },

    // Gopher-style intra-document repetition features: top-bigram fraction
    // and duplicate-bigram fraction, plus the keep decision pipelines
    // threshold on (published rule: drop when the top 2-gram exceeds a
    // fixed share; threshold here is 0.05 so both outcomes occur on the
    // synthetic corpus). The shuffle carries (doc_id, bigram) pairs — the
    // same explode-group shape as t3 — and the per-doc reduction is a
    // plain hash aggregate; no all-pairs or per-doc sort anywhere.
    QueryDef("t10_repetition",
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents
        |           WHERE len(string_split(text,' ')) >= 2),
        |b AS (
        |  SELECT doc_id, bg FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(ts)),
        |                          i -> ts[i] || ' ' || ts[i+1])) AS bg
        |    FROM t)),
        |g AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |       round(CAST(max(c) AS DOUBLE)/sum(c), 6) AS top_bigram_frac,
        |       round(1.0 - CAST(count(*) AS DOUBLE)/sum(c), 6) AS dup_bigram_frac,
        |       (CAST(max(c) AS DOUBLE)/sum(c) < 0.05) AS keep
        |FROM g GROUP BY doc_id""".stripMargin) { (s, d) =>
      // Stage the token array, then the bigram array, each as its own
      // projection, and explode only a bound column: Generate evaluates
      // complex generators interpreted, and an inlined `split()` inside the
      // lambda would re-run per element (O(tokens²) per doc — the pathology
      // round 4 fixed in Dedup.sharedTokens). CollapseProject keeps the
      // stages separate because `ts` is referenced more than once.
      // explode_outer, not explode: InferFiltersFromGenerate would add a
      // `size(bgs) > 0` filter and push it below the projections, re-inlining
      // the whole split-per-element tree into the scan filter; the outer
      // variant is skipped by that rule, and `size(toks) >= 2` already
      // guarantees a non-empty non-null bigram array, so results are equal.
      val g = Tables(s, d, "documents").filter(size(toks) >= 2)
        .select(col("doc_id"), toks.as("ts"))
        .select(col("doc_id"),
          transform(sequence(lit(0), size(col("ts")) - 2), i =>
            concat(element_at(col("ts"), i + 1), lit(" "),
              element_at(col("ts"), i + 2))).as("bgs"))
        .select(col("doc_id"), explode_outer(col("bgs")).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      g.groupBy("doc_id").agg(
        sum(col("c")).as("n_bigrams"),
        round(max(col("c")).cast("double") / sum(col("c")), 6).as("top_bigram_frac"),
        round(lit(1.0) - count(lit(1)).cast("double") / sum(col("c")), 6).as("dup_bigram_frac"),
        (max(col("c")).cast("double") / sum(col("c")) < 0.05).as("keep"))
    },

    // t11: rule-based quality FILTER (C4-style: Raffel et al. 2020 §2.2
    // drops short/low-diversity/stopword-free pages) composed from the t2
    // features, reported as per-domain survival — the go/no-go dashboard a
    // filtering pass produces before committing a corpus. Thresholds are
    // set so every rule fires on the testdata (no dead predicates).
    // Scale: filter + aggregate are both map-side-combined; the only
    // shuffle carries one row per (source) — nothing at corpus scale moves.
    // Exactness: every ratio is one IEEE division of exact integers, and
    // the comparisons are against short decimal constants — no libm calls,
    // so Spark and DuckDB agree bit-for-bit (the t2/p5 precedent).
    QueryDef("t11_quality_filter", t11Sql) { (s, d) =>
      Tables(s, d, "documents")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(qualityPass, 1)).as("n_kept"),
          round(count(when(qualityPass, 1)).cast("double") / count(lit(1)), 6).as("keep_rate"))
    },

    // t12: curriculum binning — split the corpus into quality quartiles
    // (type-token ratio as the proxy score) the way a curriculum-ordered
    // training run consumes data: easy/clean bins first. NOT a global
    // ntile: a whole-corpus ntile is a range-partitioned global sort. The
    // scale-right plan computes the three quartile BOUNDARIES in one tiny
    // aggregate, broadcasts that single row back, and bins MAP-SIDE with a
    // CASE chain — the corpus is read once, never sorted, never shuffled
    // except the final 4-row rollup. Boundary comparisons use the
    // UNROUNDED quantile values: both engines interpolate with the same
    // IEEE ops over exact int-ratio inputs, so the cut is bit-identical
    // (rounding only the REPORTED lo/hi columns — the a7 precedent).
    QueryDef("t12_curriculum_bins",
      """WITH f AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
        |           len(string_split(text, ' ')) AS ttr
        |  FROM documents),
        |q AS (SELECT quantile_cont(ttr, 0.25) AS q1, quantile_cont(ttr, 0.5) AS q2,
        |             quantile_cont(ttr, 0.75) AS q3 FROM f)
        |SELECT CASE WHEN ttr <= q1 THEN 1 WHEN ttr <= q2 THEN 2
        |            WHEN ttr <= q3 THEN 3 ELSE 4 END AS bin,
        |       count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |       round(min(ttr), 6) AS ttr_lo, round(max(ttr), 6) AS ttr_hi
        |FROM f CROSS JOIN q
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val f = Tables(s, d, "documents")
        .select(col("doc_id"), size(toks).as("n_tokens"), ttrCol.as("ttr"))
      val q = f.agg(
        expr("percentile(ttr, 0.25)").as("q1"),
        expr("percentile(ttr, 0.5)").as("q2"),
        expr("percentile(ttr, 0.75)").as("q3"))
      f.crossJoin(broadcast(q))
        .select(
          when(col("ttr") <= col("q1"), 1)
            .when(col("ttr") <= col("q2"), 2)
            .when(col("ttr") <= col("q3"), 3).otherwise(4).as("bin"),
          col("n_tokens"), col("ttr"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          round(min(col("ttr")), 6).as("ttr_lo"),
          round(max(col("ttr")), 6).as("ttr_hi"))
    },

    // t13: PII scrub — the redaction pass a corpus runs before release.
    // The full battery (email / IPv4 / phone regexes + a term blocklist)
    // is applied in one map-side projection; per-doc match counts come
    // off the ORIGINAL text and the scrubbed text is reported as
    // (md5, length) so the oracle verifies full string equality without
    // shipping corpus text through the compare. The synthetic corpus
    // contains no digits or '@', so the structured-PII counts are zero
    // here (DataPlaneSpec proves the regexes on planted fixtures); the
    // blocklist fires on 455/500 docs. Patterns stay in the Java∩RE2
    // dialect (no lookarounds; \b and \d are ASCII-identical on this
    // data), and Spark's replace-all default matches DuckDB's 'g' flag.
    // Scale: narrow per-row projection, no shuffle at any corpus size.
    QueryDef("t13_pii_scrub", t13Sql) { (s, d) =>
      val scrubbed = PiiPatterns.rules.foldLeft(col("text")) {
        case (c, (pat, repl)) => regexp_replace(c, pat, repl)
      }
      val counts = PiiPatterns.rules.map { case (pat, _) =>
        size(regexp_extract_all(col("text"), lit(pat), lit(0)))
      }
      Tables(s, d, "documents").select(
        col("doc_id"),
        counts(0).cast("long").as("n_email"),
        counts(1).cast("long").as("n_ip"),
        counts(2).cast("long").as("n_phone"),
        counts(3).cast("long").as("n_blocked"),
        md5(scrubbed).as("scrub_hash"),
        length(scrubbed).cast("long").as("scrub_len"))
    },

    // t14: duplicated-5-gram fraction (Gopher Table A1's dup_ngram_frac
    // family / the RefinedWeb boilerplate signal): a span is boilerplate
    // when its 5-gram occurs in ≥2 DISTINCT documents, and a doc is
    // dropped when boilerplate covers more than 20% of its spans. Unlike
    // the d-family (pairwise similarity) this is a corpus-wide df filter:
    // per-(doc,gram) counts aggregate map-side-combined, the df table is
    // one more aggregate over those rows, and the join back is gram-keyed
    // — the shuffles carry (doc_id, 32-byte md5(gram), count), never
    // text, and nothing is quadratic. Gram staging reuses the t10 guard
    // (pre-projected token array, bound-attribute explode_outer) so the
    // generator never re-splits per element.
    QueryDef("t14_boilerplate_spans",
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents
        |           WHERE len(string_split(text,' ')) >= 5),
        |g AS (SELECT doc_id, md5(unnest(list_transform(range(1, len(ts)-3),
        |                      i -> array_to_string(ts[i:i+4], ' ')))) AS gh
        |      FROM t),
        |c AS (SELECT doc_id, gh, count(*) AS c FROM g GROUP BY 1, 2),
        |df AS (SELECT gh, count(*) AS df FROM c GROUP BY 1)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_spans,
        |       CAST(sum(c) FILTER (WHERE df >= 2) AS BIGINT) AS n_boiler,
        |       round(CAST(coalesce(sum(c) FILTER (WHERE df >= 2), 0) AS DOUBLE) /
        |             sum(c), 6) AS boiler_frac,
        |       (CAST(coalesce(sum(c) FILTER (WHERE df >= 2), 0) AS DOUBLE) /
        |             sum(c) <= 0.2) AS keep
        |FROM c JOIN df USING (gh) GROUP BY doc_id""".stripMargin) { (s, d) =>
      // gram key = one multi-arg xxhash64 over the 5 tokens (the d7b
      // idiom): no per-gram string allocation, and the df join moves
      // 8-byte longs instead of 32-byte hex — the md5-string formulation
      // measured 63 s at the 100× corpus, this one ~3 s. The oracle keeps
      // md5 strings (DuckDB has no xxhash64); every REPORTED column is a
      // count over gram equivalence classes, which both keyings induce
      // identically (any 64-bit collision would flip a count and fail the
      // hash-compare — none observed; the d4 family sets the precedent).
      // df via a gram-keyed AGGREGATE over a checkpointed c, NOT a count
      // window over gh: the window ships every (doc_id, gh, c) row for a
      // given gram to ONE task, and a corpus-universal boilerplate 5-gram
      // has df ≈ n_docs — at deployment scale that single task receives
      // billions of rows. groupBy("gh").count() is skew-proof: map-side
      // partial counts mean the reducer for the hottest gram sees one
      // partial per upstream partition, never the rows. The gram-count
      // build plans TWICE (df branch + probe branch) ON PURPOSE — this is
      // the d10 checkpoint arithmetic revisited: through round 10a the
      // build was localCheckpoint'ed so both branches read one
      // materialization, on the theory that planning twice loses. Measured
      // at the 100x corpus: cold-JVM the two-scan plan wins (10.1 s vs
      // 17.6 s), in steady-state Bench conditions it is a wash (10-12 s
      // both ways) — the (doc_id, gh, c) frame is nearly positional-sized
      // (~0.8 rows per token position), so materializing it buys nothing.
      // What decides it is MEMORY: this was the GB-scale checkpoint that
      // had to be released inside Bench's timed window to avoid OOMing the
      // sf10 suite; two scans have no resident footprint at all.
      // Checkpoint only post-aggregation-SMALL frames (t17's
      // distinct-bigram table); rescan corpus-sized streams.
      val c = boilerplateGramCounts(s, d)
      val dfTab = c.groupBy("gh").agg(count(lit(1)).as("df"))
      val boiler = sum(when(col("df") >= 2, col("c")))
      val frac = coalesce(boiler, lit(0L)).cast("double") / sum(col("c"))
      c.join(dfTab, "gh").groupBy("doc_id")
        .agg(sum(col("c")).cast("long").as("n_spans"),
          boiler.cast("long").as("n_boiler"),
          round(frac, 6).as("boiler_frac"),
          (frac <= 0.2).as("keep"))
    },

    // Moore-Lewis contrastive data selection (Moore & Lewis 2010,
    // "Intelligent Selection of Language Model Training Data"): score each
    // doc by the per-token mean log-ratio of an IN-DOMAIN unigram LM
    // (here: the src0 slice, Laplace-smoothed over the corpus vocabulary)
    // against the GENERAL corpus LM; keep docs the in-domain model likes
    // better. The standard relevance filter a pipeline runs between quality
    // gating and mixture sampling. Plan: ONE shared token explode feeds a
    // single (word)-keyed aggregate carrying BOTH counts (general + the
    // FILTER'd in-domain), its 3-number rollup broadcasts, and the score
    // pass is one token-keyed join + per-doc aggregate — two passes over
    // the token stream total, shuffles carry (word, 2 doubles) and
    // (doc_id, partials), never text. At 100 TB the vocab-sized freq table
    // shuffles by word; here it broadcasts. ln drift: per-doc MEAN rounded
    // to 1e-6 per the t8 precedent; `keep` compares the ROUNDED score so
    // both engines threshold the same number.
    QueryDef("t15_domain_relevance",
      """WITH tok AS (SELECT doc_id, source, unnest(string_split(text,' ')) AS word
        |             FROM documents),
        |freq AS (SELECT word, CAST(count(*) AS DOUBLE) AS cg,
        |                CAST(count(*) FILTER (WHERE source = 'src0') AS DOUBLE) AS ci
        |         FROM tok GROUP BY word),
        |tot AS (SELECT CAST(sum(cg) AS DOUBLE) AS tg, CAST(sum(ci) AS DOUBLE) AS ti,
        |               CAST(count(*) AS DOUBLE) AS v FROM freq)
        |SELECT doc_id, n_tokens, ml_score, ml_score > 0 AS keep FROM (
        |  SELECT doc_id, count(*) AS n_tokens,
        |         round(avg(ln((ci + 1) / (ti + v)) - ln(cg / tg)), 6) AS ml_score
        |  FROM tok JOIN freq USING (word) CROSS JOIN tot
        |  GROUP BY doc_id)""".stripMargin) { (s, d) =>
      val tok = Tables(s, d, "documents")
        .select(col("doc_id"), col("source"), explode(toks).as("word"))
      val freq = tok.groupBy("word").agg(
        count(lit(1)).cast("double").as("cg"),
        count(when(col("source") === "src0", 1)).cast("double").as("ci"))
      val tot = freq.agg(sum("cg").as("tg"), sum("ci").as("ti"),
        count(lit(1)).cast("double").as("v"))
      tok.join(freq, "word").crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(log((col("ci") + 1) / (col("ti") + col("v"))) -
            log(col("cg") / col("tg"))), 6).as("ml_score"))
        .select(col("doc_id"), col("n_tokens"), col("ml_score"),
          (col("ml_score") > 0).as("keep"))
    },

    // DSIR (Xie et al. 2023, "Data Selection for Language Models via
    // Importance Resampling"): per-doc importance weight = mean log-ratio
    // of target vs raw distributions over HASHED n-gram features
    // (unigrams + bigrams → md5-prefix bucket, B = 256; target = the src0
    // slice, add-1 smoothing over the bucket space). The published
    // successor to t15's Moore-Lewis selection — and the reason it scales
    // past it: the feature table is FIXED-SIZE (≤ B rows no matter the
    // corpus), so both the frequency table and the totals ride broadcasts
    // at any scale, where t15's vocab-sized table must shuffle by word at
    // 100 TB. Two passes over the feature stream (one aggregate, one
    // broadcast-join + per-doc aggregate); shuffles carry (doc_id,
    // partials) only. ln drift: per-doc MEAN rounded to 1e-6 (the
    // t8/t15 precedent); `keep` thresholds the ROUNDED score.
    QueryDef("t16_dsir_weights",
      """WITH t AS (SELECT doc_id, source, string_split(text,' ') AS ts FROM documents),
        |f AS (SELECT doc_id, source, substr(md5(feat),1,2) AS b FROM (
        |   SELECT doc_id, source,
        |          unnest(ts || list_transform(range(1, len(ts)),
        |                                      i -> ts[i] || ' ' || ts[i+1])) AS feat
        |   FROM t)),
        |freq AS (SELECT b, CAST(count(*) AS DOUBLE) AS cg,
        |                CAST(count(*) FILTER (WHERE source='src0') AS DOUBLE) AS ci
        |         FROM f GROUP BY b),
        |tot AS (SELECT CAST(sum(cg) AS DOUBLE) AS tg, CAST(sum(ci) AS DOUBLE) AS ti
        |        FROM freq)
        |SELECT doc_id, n_feats, dsir_score, dsir_score > 0 AS keep FROM (
        |  SELECT doc_id, count(*) AS n_feats,
        |         round(avg(ln((ci+1)/(ti+256)) - ln((cg+1)/(tg+256))), 6) AS dsir_score
        |  FROM f JOIN freq USING (b) CROSS JOIN tot GROUP BY doc_id)""".stripMargin) { (s, d) =>
      val t = Tables(s, d, "documents")
        .select(col("doc_id"), col("source"), toks.as("ts"))
      // Fused bucket folds (r14, the NbScore treatment — see
      // functions/DsirHash.scala): the former explode/join formulation
      // materialized ~150M feature rows per pass and joined every one
      // against the 256-row frequency table (12.6-19.7 s at sf10 vs
      // DuckDB's 2.7 — the one line left above the 2× band). Now:
      //   pass 1: per-doc bucket HISTOGRAM (one compiled md5 fold per
      //     doc) → 256-wide posexplode of 500k narrow rows → the global +
      //     src0 bucket counts (the only shuffle, ~128M (int,int) pairs);
      //   weights: the 256-entry log-ratio table packs driver-side (the
      //     frequency table is ≤ 256 rows at ANY corpus size — that is
      //     DSIR's scaling argument);
      //   pass 2: scan → project — Σ weights[bucket(feat)] per doc in
      //     feature order, /n_feats, round 6 dp. No corpus-sized join
      //     remains; the oracle still recomputes every feature's md5
      //     bucket from scratch. Measured sf10: 19.7 → ~1.0 s warm
      //     (2.7× FASTER than the pinned DuckDB 2.73 s; was 7.2× slower).
      val cnts = t.select(col("source"),
        graft.functions.DsirHash.countsOf(col("ts")).as("c"))
      val freqRows = cnts
        .select(col("source"), posexplode(col("c")).as(Seq("b", "cnt")))
        .groupBy("b").agg(
          sum(col("cnt")).cast("double").as("cg"),
          sum(when(col("source") === "src0", col("cnt")).otherwise(0)).cast("double").as("ci"))
        .collect()
      val cgArr = new Array[Double](graft.functions.DsirHash.Buckets)
      val ciArr = new Array[Double](graft.functions.DsirHash.Buckets)
      freqRows.foreach { r =>
        cgArr(r.getInt(0)) = r.getDouble(1); ciArr(r.getInt(0)) = r.getDouble(2)
      }
      val (tg, ti) = (cgArr.sum, ciArr.sum)
      val weights: Seq[Double] = (0 until graft.functions.DsirHash.Buckets).map(b =>
        math.log((ciArr(b) + 1) / (ti + 256)) - math.log((cgArr(b) + 1) / (tg + 256)))
      val n = size(col("ts"))
      val nFeats = (n + when(n >= 2, n - 1).otherwise(0)).cast("long")
      t.select(col("doc_id"), nFeats.as("n_feats"),
          round(graft.functions.DsirHash.scoreOf(col("ts"), weights) /
            nFeats.cast("double"), 6).as("dsir_score"))
        .select(col("doc_id"), col("n_feats"), col("dsir_score"),
          (col("dsir_score") > 0).as("keep"))
    },

    // CCNet-style perplexity filter (Wenzek et al. 2019): per-doc mean
    // negative log-likelihood under a bigram LM with add-1 smoothing —
    // the "does a language model like this text" gate that sits between
    // rule-based quality (t11) and relevance selection (t15/t16). The LM
    // here is trained on the corpus itself (self-perplexity, the
    // deduped-corpus idiom); a deployment trains it once on a REFERENCE
    // corpus, at which point the bigram/context tables are fixed-size and
    // broadcast like t16's buckets — the corpus-keyed shuffles below are
    // the training half, paid once. History counts use w1's occurrences
    // AS A CONTEXT (not raw unigram counts): the correct conditional
    // denominator. Log-domain output (ppl = e^nll): exp would amplify
    // 1e-6 ln drift across engines into rounding-boundary hashes; the
    // t8/t15 round-the-mean precedent stays exact. `keep` thresholds the
    // ROUNDED score; 3.4 ≈ the sf0.01 median, so both outcomes are live.
    QueryDef("t17_bigram_perplexity",
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents
        |           WHERE len(string_split(text,' ')) >= 2),
        |bg AS (SELECT doc_id,
        |              unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS big,
        |              unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS w1
        |       FROM t),
        |cb AS (SELECT big, CAST(count(*) AS DOUBLE) AS cb FROM bg GROUP BY big),
        |ch AS (SELECT w1, CAST(count(*) AS DOUBLE) AS ch FROM bg GROUP BY w1),
        |vv AS (SELECT CAST(count(DISTINCT word) AS DOUBLE) AS v
        |       FROM (SELECT unnest(string_split(text,' ')) AS word FROM documents))
        |SELECT doc_id, n_bigrams, nll, nll <= 3.4 AS keep FROM (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |         round(avg(-ln((cb + 1) / (ch + v))), 6) AS nll
        |  FROM bg JOIN cb USING (big) JOIN ch USING (w1) CROSS JOIN vv
        |  GROUP BY doc_id)""".stripMargin) { (s, d) =>
      val docs = Tables(s, d, "documents")
      val t = docs.filter(size(toks) >= 2).select(col("doc_id"), toks.as("ts"))
      val n = size(col("ts"))
      // Staged struct array + explode_outer (the d10 inferred-filter
      // lesson; the old inner explode of the raw transform re-planned the
      // generator pass per consumer AND carried the filter clone —
      // 23.0 s at sf10 in the r10b suite, 8.0 s now). Keys are multi-arg
      // xxhash64 (the t14/d7b idiom): the count joins move 8-byte longs,
      // never bigram strings; every reported column is a count over key
      // equivalence classes, which both keyings induce identically absent
      // a 64-bit collision (hash-compare would catch one).
      val bg = t.select(col("doc_id"), transform(sequence(lit(1), n - 1),
          i => struct(
            xxhash64(try_element_at(col("ts"), i), try_element_at(col("ts"), i + 1)).as("bh"),
            xxhash64(try_element_at(col("ts"), i)).as("wh"))).as("gs"))
        .select(col("doc_id"), explode_outer(col("gs")).as("p"))
        .select(col("doc_id"), col("p.bh").as("bh"), col("p.wh").as("wh"))
      // ONE aggregation of the bigram stream to the distinct-bigram table
      // (bh, wh, c) — post-aggregation small, so THIS is the frame worth
      // checkpointing (the t14 arithmetic; checkpointing the corpus-sized
      // bg stream itself measured 9.5 s vs 8.1 s for this shape, and
      // 4.4 s vs 6.5 s warm). Both LM tables derive from it without
      // touching the corpus again: cb = Σ over contexts, ch = Σ over
      // continuations. Total corpus passes: the probe + this build + the
      // vocab count = 3, vs 4 for the naive plan.
      val cbw = graft.data.Frames.trackedCheckpoint(
        bg.groupBy("bh", "wh").agg(count(lit(1)).as("c")))
      val cb = cbw.groupBy("bh").agg(sum("c").cast("double").as("cb"))
      val ch = cbw.groupBy("wh").agg(sum("c").cast("double").as("ch"))
      val vv = docs.select(toks.as("ts"))
        .select(explode_outer(col("ts")).as("word"))
        .agg(countDistinct(col("word")).cast("double").as("v"))
      bg.join(cb, "bh").join(ch, "wh").crossJoin(broadcast(vv))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(-log((col("cb") + 1) / (col("ch") + col("v")))), 6).as("nll"))
        .select(col("doc_id"), col("n_bigrams"), col("nll"),
          (col("nll") <= 3.4).as("keep"))
    },

    // t17b: the DEPLOYMENT shape of t17 — CCNet proper (Wenzek et al. 2019
    // train the LM on a REFERENCE corpus, then score the crawl against it).
    // The LM trains on the fixed reference slice (src0 — the t15/t16
    // precedent), so both count tables are reference-sized and FIXED as the
    // corpus grows: they broadcast at every scale, and the score pass is
    // map-side — one corpus scan, two broadcast-hash joins, one doc-keyed
    // aggregate. None of t17's corpus-keyed training shuffles are re-paid:
    // a 100 TB crawl scored against a reference LM pays exactly one pass.
    // Unseen bigrams/contexts hit add-1 smoothing with zero counts (left
    // joins + coalesce): nll_i = -ln((cb+1)/(ch+V)). keep thresholds the
    // ROUNDED score (t17 precedent); 3.5 ≈ the sf0.01 median nll, so
    // both outcomes are live.
    QueryDef("t17b_perplexity_score",
      """WITH t AS (SELECT doc_id, source, string_split(text,' ') AS ts FROM documents
        |           WHERE len(string_split(text,' ')) >= 2),
        |bg AS (SELECT doc_id, source,
        |              unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS big,
        |              unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS w1
        |       FROM t),
        |cb AS (SELECT big, CAST(count(*) AS DOUBLE) AS cb FROM bg WHERE source = 'src0' GROUP BY big),
        |ch AS (SELECT w1, CAST(count(*) AS DOUBLE) AS ch FROM bg WHERE source = 'src0' GROUP BY w1),
        |vv AS (SELECT CAST(count(DISTINCT word) AS DOUBLE) AS v
        |       FROM (SELECT unnest(string_split(text,' ')) AS word FROM documents WHERE source = 'src0'))
        |SELECT doc_id, n_bigrams, nll, nll <= 3.5 AS keep FROM (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |         round(avg(-ln((coalesce(cb, 0) + 1) / (coalesce(ch, 0) + v))), 6) AS nll
        |  FROM bg LEFT JOIN cb USING (big) LEFT JOIN ch USING (w1) CROSS JOIN vv
        |  GROUP BY doc_id)""".stripMargin) { (s, d) =>
      val docs = Tables(s, d, "documents")
      val t = docs.filter(size(toks) >= 2)
        .select(col("doc_id"), col("source"), toks.as("ts"))
      val n = size(col("ts"))
      // same staged-struct + explode_outer + xxhash64 keying as t17 (the
      // d10 inferred-filter lesson; 8-byte join keys, count-equivalence
      // classes identical to the oracle's string keys absent a collision)
      def bigrams(src: org.apache.spark.sql.DataFrame) = src
        .select(col("doc_id"), transform(sequence(lit(1), n - 1),
          i => struct(
            xxhash64(try_element_at(col("ts"), i), try_element_at(col("ts"), i + 1)).as("bh"),
            xxhash64(try_element_at(col("ts"), i)).as("wh"))).as("gs"))
        .select(col("doc_id"), explode_outer(col("gs")).as("p"))
        .select(col("doc_id"), col("p.bh").as("bh"), col("p.wh").as("wh"))
      // TRAIN half: reference-slice only — the source filter pushes into
      // its own pruned scan, so the LM build touches |src0| rows, not the
      // corpus, and its output is fixed-size w.r.t. the corpus decade
      val refBg = bigrams(t.filter(col("source") === "src0"))
      val cbw = refBg.groupBy("bh", "wh").agg(count(lit(1)).as("c"))
      val cb = cbw.groupBy("bh").agg(sum("c").cast("double").as("cb"))
      val ch = cbw.groupBy("wh").agg(sum("c").cast("double").as("ch"))
      val vv = docs.filter(col("source") === "src0")
        .select(explode_outer(toks).as("word"))
        .agg(countDistinct(col("word")).cast("double").as("v"))
      // SCORE half: one corpus pass, broadcast-hash joins only, then the
      // doc-keyed aggregate — no corpus-keyed shuffle anywhere
      bigrams(t).join(broadcast(cb), Seq("bh"), "left_outer")
        .join(broadcast(ch), Seq("wh"), "left_outer")
        .crossJoin(broadcast(vv))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(-log((coalesce(col("cb"), lit(0.0)) + 1) /
            (coalesce(col("ch"), lit(0.0)) + col("v")))), 6).as("nll"))
        .select(col("doc_id"), col("n_bigrams"), col("nll"),
          (col("nll") <= 3.5).as("keep"))
    },

    // t19: CCNet/fastText-style QUALITY CLASSIFIER as multinomial Naive
    // Bayes with add-1 smoothing — the supervised sibling of t17's LM
    // filter (Wenzek et al. 2019 train a classifier on a reference corpus
    // and keep what scores "reference-like"; Brown et al. 2020 do the same
    // for GPT-3's quality filter). Weak labels here: docs from a pinned
    // reference-source set are the positive class (the Wikipedia-as-
    // positive trick), and every doc gets its log-odds score + keep
    // decision. NB chosen over logistic regression deliberately: training
    // is PURE COUNTING, so the whole train+apply pipeline is one
    // deterministic dataflow with an exact SQL oracle — no float gradient
    // whose partial-sum order varies across engines.
    //
    // Scale shape (r13): two corpus scans, ZERO occurrence-stream
    // shuffles — and the score scan is now a pure PROJECTION. Train = one
    // map-side-combined aggregate of the token stream to the checkpointed
    // vocab count table; smoothing totals + the dispatch vocab size fold
    // into ONE driver-side read of that checkpoint and priors into
    // another. Score (r13, fused) = pack the vocab into an NbModel binary
    // (same bytes the r10-r12 broadcast join shipped) and fold each doc
    // with the codegen'd NbScore expression — the explode/broadcast-join/
    // doc-agg triple that paid one UnsafeRow + hash probe + agg update
    // PER TOKEN is gone. Measured at sf10 (scale_r13/t19_fused_sf10.json):
    // 5.69 → 1.48 s warm, vs same-boot DuckDB 0.87 s — ratio 5.2× → 1.7×,
    // closing the r11/r12 weak flag structurally. A vocab beyond the
    // threshold takes the Zipf-proof per-doc term-frame fallback
    // (DataPlaneSpec asserts branch agreement). An r12 experiment that
    // tokenized ONCE into a checkpointed term frame measured 6.1 → 9.2 s
    // at sf10 — the (doc, w) shuffle + GB-scale string checkpoint cost
    // more than the columnar re-scan they save — and was reverted; the
    // negative result is kept here so it isn't retried. Log-odds stays in
    // log domain (the t8/t15/t17 rounding precedent); `keep` thresholds
    // the ROUNDED score. A deployment trains once and packs once — see
    // t19b.
    QueryDef("t19_nb_classifier",
      """WITH lbl AS (SELECT doc_id, source IN ('src1','src2','src3','src4') AS pos,
        |                    string_split(text,' ') AS ts FROM documents),
        |tok AS (SELECT doc_id, pos, unnest(ts) AS w FROM lbl),
        |tw AS (SELECT w, count(*) FILTER (WHERE pos) AS c1,
        |              count(*) FILTER (WHERE NOT pos) AS c0 FROM tok GROUP BY w),
        |tots AS (SELECT CAST(sum(c1) AS DOUBLE) AS tot1, CAST(sum(c0) AS DOUBLE) AS tot0,
        |                CAST(count(*) AS DOUBLE) AS v FROM tw),
        |pri AS (SELECT CAST(count(*) FILTER (WHERE pos) AS DOUBLE) AS n1,
        |               CAST(count(*) FILTER (WHERE NOT pos) AS DOUBLE) AS n0 FROM lbl)
        |SELECT doc_id, n_tok, log_odds, log_odds > 0 AS keep FROM (
        |  SELECT doc_id, count(*) AS n_tok,
        |         round(ln(n1 / n0) +
        |               sum(ln((c1 + 1) / (tot1 + v)) - ln((c0 + 1) / (tot0 + v))), 6) AS log_odds
        |  FROM tok JOIN tw USING (w) CROSS JOIN tots CROSS JOIN pri
        |  GROUP BY doc_id, n1, n0)""".stripMargin) { (s, d) =>
      nbClassifier(Tables(s, d, "documents"),
        Seq("src1", "src2", "src3", "src4"))
    },

    // t19b: the DEPLOYMENT shape of t19 — train the NB count tables ONCE on
    // a fixed labeled slice (md5(doc_id) < '33', the held-out ~20% a
    // pipeline labels once — the p5-p7 hash idiom, deliberately
    // uncorrelated with source (testdata's source IS doc_id % 20, so any
    // modulus slice would miss entire classes); positives as in t19), then
    // score EVERY doc against the broadcast tables. The training tables
    // are slice-sized and fixed as the corpus grows (the t16 rationale —
    // no measured dispatch needed: they broadcast at every scale), so
    // scoring a 100 TB crawl is one corpus scan → map-side broadcast-hash
    // join → ONE doc-keyed aggregate (the occurrence stream never
    // shuffles); none of the training aggregation is re-paid. Tokens
    // unseen in the slice hit add-1 smoothing with zero counts (left join
    // + coalesce). Same rounding/threshold discipline as t19.
    QueryDef("t19b_nb_score",
      """WITH lbl AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) < '33' AS tr,
        |                    source IN ('src1','src2','src3','src4') AS pos,
        |                    string_split(text,' ') AS ts FROM documents),
        |tok AS (SELECT doc_id, tr, pos, unnest(ts) AS w FROM lbl),
        |tw AS (SELECT w, count(*) FILTER (WHERE pos) AS c1,
        |              count(*) FILTER (WHERE NOT pos) AS c0
        |       FROM tok WHERE tr GROUP BY w),
        |tots AS (SELECT CAST(sum(c1) AS DOUBLE) AS tot1, CAST(sum(c0) AS DOUBLE) AS tot0,
        |                CAST(count(*) AS DOUBLE) AS v FROM tw),
        |pri AS (SELECT CAST(count(*) FILTER (WHERE pos) AS DOUBLE) AS n1,
        |               CAST(count(*) FILTER (WHERE NOT pos) AS DOUBLE) AS n0
        |        FROM lbl WHERE tr)
        |SELECT doc_id, n_tok, log_odds, log_odds > 0 AS keep FROM (
        |  SELECT doc_id, count(*) AS n_tok,
        |         round(ln(n1 / n0) +
        |               sum(ln((coalesce(c1, 0) + 1) / (tot1 + v)) -
        |                   ln((coalesce(c0, 0) + 1) / (tot0 + v))), 6) AS log_odds
        |  FROM tok LEFT JOIN tw USING (w) CROSS JOIN tots CROSS JOIN pri
        |  GROUP BY doc_id, n1, n0)""".stripMargin) { (s, d) =>
      val docs = Tables(s, d, "documents")
      val pos = col("source").isin("src1", "src2", "src3", "src4")
      val tr = md5(col("doc_id").cast("string")) < "33"
      // TRAIN half: the slice filter prunes its own scan, so the count
      // table build touches ~20% of the corpus once and its output is
      // slice-sized and FIXED as the corpus grows (the t16 rationale) —
      // collected straight into the packed NbModel (the same bytes the
      // pre-r13 broadcast join shipped); smoothing totals fold into the
      // same driver-side pass over the collected rows
      val rows = docs.filter(tr)
        .select(col("doc_id"), pos.as("pos"), explode(toks).as("w"))
        .groupBy("w").agg(
          sum(when(col("pos"), 1L).otherwise(0L)).as("c1"),
          sum(when(col("pos"), 0L).otherwise(1L)).as("c0"))
        .collect()
      val tot1 = rows.iterator.map(_.getLong(1)).sum.toDouble
      val tot0 = rows.iterator.map(_.getLong(2)).sum.toDouble
      val p = docs.filter(tr).agg(
        sum(when(pos, 1L).otherwise(0L)).cast("double").as("n1"),
        sum(when(pos, 0L).otherwise(1L)).cast("double").as("n0")).head()
      // SCORE half (r13, fused): one corpus scan whose only operator is
      // the codegen'd NbScore projection — no explode, no join, no
      // doc-keyed aggregate; tokens unseen in the slice hit the model's
      // default (add-1 smoothing with zero counts — the SQL left join's
      // coalesce) and still count into n_tok, exactly as the left join did
      nbScoreFused(docs,
          nbPack(rows, tot1, tot0, rows.length.toDouble),
          math.log(p.getDouble(0) / p.getDouble(1)))
        .select(col("doc_id"), col("n_tok"), col("log_odds"),
          (col("log_odds") > 0).as("keep"))
    },

    // t20: BM25 top-k retrieval for a pinned query — the scoring pass a
    // pipeline runs for retrieval-based decontamination ("which training
    // docs does this eval question retrieve?") and targeted data selection.
    // Okapi BM25 with the Lucene idf (always positive), k1=1.2, b=0.75.
    //
    // Scale shape: for a FIXED small query there is no inverted index to
    // build and no explode — per-term tf is a map-side array filter inside
    // the one corpus scan's codegen; df/N/avgdl reduce to ONE row that
    // broadcasts; the ranking is a global top-k (TakeOrdered: per-partition
    // heaps, k rows to the driver — never a full sort). One scan, one
    // 1-row broadcast, zero wide shuffles at any corpus size. Ordering is
    // cross-engine deterministic: rank on the ROUNDED score, ties to the
    // lower doc_id.
    QueryDef("t20_bm25_topk",
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        |tf AS (SELECT doc_id, len(ts) AS dl,
        |              len(list_filter(ts, x -> x = 'spark')) AS tf1,
        |              len(list_filter(ts, x -> x = 'join')) AS tf2,
        |              len(list_filter(ts, x -> x = 'window')) AS tf3
        |       FROM t),
        |st AS (SELECT count(*) AS n, avg(dl) AS avgdl,
        |              sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |              sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
        |              sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
        |       FROM tf)
        |SELECT doc_id, CAST(dl AS BIGINT) AS n_tok,
        |       round(ln((n - df1 + 0.5) / (df1 + 0.5) + 1) * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |           + ln((n - df2 + 0.5) / (df2 + 0.5) + 1) * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |           + ln((n - df3 + 0.5) / (df3 + 0.5) + 1) * tf3 * 2.2 / (tf3 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS score
        |FROM tf CROSS JOIN st
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      bm25TopK(Tables(s, d, "documents"),
        Seq("spark", "join", "window"), 20)
    }
  )

  /** t20's plan (see the QueryDef comment): one scan computing per-term
    * tf map-side, a 1-row broadcast of (N, avgdl, df_t), map-side scoring,
    * global top-k. Exposed for DataPlaneSpec's recount and PlanSpec. */
  private[graft] def bm25TopK(docs: org.apache.spark.sql.DataFrame,
      terms: Seq[String], k: Int): org.apache.spark.sql.DataFrame = {
    val (k1, b) = (1.2, 0.75)
    val tfCols = terms.indices.map { i =>
      size(filter(toks, x => x === terms(i))).as(s"tf${i + 1}")
    }
    val tf = docs.select(
      col("doc_id") +: size(toks).as("dl") +: tfCols: _*)
    val dfAggs = terms.indices.map(i =>
      sum(when(col(s"tf${i + 1}") > 0, 1L).otherwise(0L)).as(s"df${i + 1}"))
    val st = tf.agg(count(lit(1)).as("n"),
      avg(col("dl")).as("avgdl") +: dfAggs: _*)
    val norm = lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))
    val score = terms.indices.map { i =>
      val (tfc, dfc) = (col(s"tf${i + 1}"), col(s"df${i + 1}"))
      log((col("n") - dfc + 0.5) / (dfc + 0.5) + 1) *
        tfc * (k1 + 1) / (tfc + norm)
    }.reduce(_ + _)
    tf.crossJoin(broadcast(st))
      .select(col("doc_id"), col("dl").cast("long").as("n_tok"),
        round(score, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** t19's vocab table packs into a driver-built [[graft.functions.NbModel]]
    * when it holds at most this many terms (tens of MB of (w, c1, c0)
    * rows — the same bytes the pre-r13 broadcast join collected to the
    * driver); a vocab beyond it takes the shuffle-join fallback — on the
    * per-doc TERM frame, never the raw occurrence stream. */
  val BroadcastMaxVocabRows = 1000000L

  /** Pack a collected (w, c1, c0) vocab table into the [[graft.functions
    * .NbModel]] binary: termLL(w) = ln((c1+1)/(tot1+v)) − ln((c0+1)/(tot0+v)),
    * unseen tokens smooth with zero counts (the SQL left join's coalesce).
    * Driver-side math.log on the same doubles the replaced column
    * expression computed — DataPlaneSpec pins branch agreement at 6 dp. */
  private def nbPack(rows: Array[org.apache.spark.sql.Row],
      tot1: Double, tot0: Double, v: Double): Array[Byte] = {
    val words = new Array[Array[Byte]](rows.length)
    val lls = new Array[Double](rows.length)
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      words(i) = r.getString(0).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      lls(i) = math.log((r.getLong(1) + 1L) / (tot1 + v)) -
        math.log((r.getLong(2) + 1L) / (tot0 + v))
      i += 1
    }
    graft.functions.NbModel.pack(words, lls,
      math.log(1.0 / (tot1 + v)) - math.log(1.0 / (tot0 + v)))
  }

  /** The fused NB score pass: ONE corpus scan whose only operator is a
    * projection running [[graft.functions.NbScore]] — the occurrence
    * stream never exists as rows (no explode, no join, no doc-keyed
    * aggregate; the pre-r13 broadcast-join formulation paid one UnsafeRow
    * + hash probe + hash-agg update PER TOKEN). Null text yields no row,
    * matching `explode(split(...))` which emits nothing for it. */
  private def nbScoreFused(docs: org.apache.spark.sql.DataFrame,
      model: Array[Byte], prior: Double): org.apache.spark.sql.DataFrame =
    docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.NbScore.of(col("text"), model).as("ns"))
      .select(col("doc_id"),
        col("ns").getItem(0).cast("long").as("n_tok"),
        round(lit(prior) + col("ns").getItem(1), 6).as("log_odds"))

  /** t19's plan (see the QueryDef comment). `forceShuffle` pins the
    * big-vocab fallback branch so DataPlaneSpec can prove the two branches
    * agree; the declared query always dispatches on the measured vocab.
    * Exposed for DataPlaneSpec's brute-force fixtures and PlanSpec. */
  private[graft] def nbClassifier(docs: org.apache.spark.sql.DataFrame,
      posSources: Seq[String],
      forceShuffle: Boolean = false): org.apache.spark.sql.DataFrame = {
    val pos = col("source").isin(posSources: _*)
    val tok = docs.select(col("doc_id"), pos.as("pos"), explode(toks).as("w"))
    // train: ONE aggregation of the occurrence stream to the vocab count
    // table — partial aggregation absorbs the Zipf-hot key map-side, the
    // shuffle carries vocab-sized partials only, and the result is
    // checkpointed so statistics + broadcast share blocks. (An r12
    // experiment pre-aggregated to a checkpointed per-doc TERM frame so
    // the corpus tokenized once for train AND score — measured 6.1 →
    // 9.2 s at sf10: the (doc, w) shuffle + GB-scale checkpoint of token
    // STRINGS cost more than the second columnar scan they save. Two
    // scans with ZERO occurrence-stream shuffles is the right plan.)
    val tw = graft.data.Frames.trackedCheckpoint(
      tok.groupBy("w").agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("c0")))
    // smoothing totals + the broadcast-dispatch vocab size fold into ONE
    // driver-side read of the vocab-sized checkpoint (r12: was a separate
    // count() dispatch job plus totals/priors frames riding two
    // crossJoin broadcasts); priors collapse to two doubles off a
    // source-column-only scan
    val t = tw.agg(sum("c1").cast("double"), sum("c0").cast("double"),
      count(lit(1)).cast("double")).head()
    val (tot1, tot0, v) = (t.getDouble(0), t.getDouble(1), t.getDouble(2))
    val p = docs.agg(sum(when(pos, 1L).otherwise(0L)).cast("double"),
      sum(when(pos, 0L).otherwise(1L)).cast("double")).head()
    val prior = math.log(p.getDouble(0) / p.getDouble(1))
    val termLL = log((col("c1") + 1) / (tot1 + v)) -
      log((col("c0") + 1) / (tot0 + v))
    val score =
      if (!forceShuffle && v <= BroadcastMaxVocabRows)
        // fused score (r13): pack the checkpointed vocab into an NbModel
        // binary (the same bytes the broadcast join shipped) and fold each
        // doc in one codegen'd projection — the score pass has NO explode,
        // NO join, NO aggregate. Every token is in-vocab by construction
        // (train saw this same corpus), so the model's unseen default
        // never fires and n_tok equals the old inner join's count.
        nbScoreFused(docs, nbPack(tw.collect(), tot1, tot0, v), prior)
      else {
        // Zipf-proof fallback for a vocab too big to broadcast: pre-
        // aggregate to the per-doc TERM frame (doc-keyed, skew-proof,
        // join input cut by mean term frequency), then shuffle-join on w
        // (AQE skew-split covers residual hot terms). tf-weighted sums
        // equal the occurrence sums up to FP associativity; DataPlaneSpec
        // asserts branch agreement at 6 dp.
        val dtf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        dtf.join(tw, "w")
          .groupBy("doc_id")
          .agg(sum(col("tf")).as("n_tok"),
            round(lit(prior) + sum(col("tf") * termLL), 6).as("log_odds"))
      }
    score.select(col("doc_id"), col("n_tok"), col("log_odds"),
      (col("log_odds") > 0).as("keep"))
  }

  /** The t11/t12 quality proxy: per-doc type-token ratio — an exact
    * division of exact ints, so cross-engine bit-identical. */
  private def ttrCol = size(array_distinct(toks)).cast("double") / size(toks)

  /** The t11 rule conjunction (C4-style doc-level gate) as a reusable
    * predicate over a `text` column — shared by t11's survival report and
    * the x7 end-to-end pipeline manifest so the two can never drift. */
  def qualityPass: org.apache.spark.sql.Column = {
    val nTok = size(toks)
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    val stopR = size(filter(toks, x => x.isin("the", "a", "of", "and")))
      .cast("double") / nTok
    val mtl = (length(col("text")).cast("double") - nTok + 1) / nTok
    nTok >= 30 && ttr >= 0.40 && stopR >= 0.02 && mtl <= 4.8
  }

  /** The same gate in DuckDB SQL, as a WHERE-clause fragment over a
    * `text` column (kept textually adjacent to [[qualityPass]]).
    * `def`, not `val`: `entries` is initialized ABOVE and t11Sql
    * interpolates this — a val would still be null at that point. */
  def qualityPassSql: String =
    """len(string_split(text, ' ')) >= 30
      |  AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
      |        len(string_split(text, ' ')) >= 0.40
      |  AND CAST(len(list_filter(string_split(text, ' '),
      |          x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) /
      |        len(string_split(text, ' ')) >= 0.02
      |  AND (CAST(length(text) AS DOUBLE) - len(string_split(text, ' ')) + 1) /
      |        len(string_split(text, ' ')) <= 4.8""".stripMargin

  private def t11Sql: String =
    s"""SELECT source, count(*) AS n_docs,
       |       count(*) FILTER (WHERE $qualityPassSql) AS n_kept,
       |       round(CAST(count(*) FILTER (WHERE $qualityPassSql) AS DOUBLE) /
       |             count(*), 6) AS keep_rate
       |FROM documents GROUP BY source""".stripMargin

  /** t13's redaction battery, in application order. Each pattern is valid
    * and identical under BOTH Java regex (Spark) and RE2 (DuckDB): no
    * lookarounds/backrefs, and `\b`/`\d` agree because the data is ASCII.
    * Shared by the Spark builder, the SQL oracle, and DataPlaneSpec's
    * planted-PII fixtures — one source of truth for the dialect subset. */
  object PiiPatterns {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
    val ipv4 = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
    val phone = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
    val terms = "\\b(customer|vector)\\b"
    val rules: Seq[(String, String)] = Seq(
      email -> "<EMAIL>", ipv4 -> "<IP>", phone -> "<PHONE>", terms -> "<TERM>")
  }

  private def t13Sql: String = {
    val Seq(e, i, p, b) = PiiPatterns.rules.map(_._1)
    s"""SELECT doc_id,
       |       CAST(len(regexp_extract_all(text, '$e')) AS BIGINT) AS n_email,
       |       CAST(len(regexp_extract_all(text, '$i')) AS BIGINT) AS n_ip,
       |       CAST(len(regexp_extract_all(text, '$p')) AS BIGINT) AS n_phone,
       |       CAST(len(regexp_extract_all(text, '$b')) AS BIGINT) AS n_blocked,
       |       md5(scrubbed) AS scrub_hash,
       |       CAST(length(scrubbed) AS BIGINT) AS scrub_len
       |FROM (
       |  SELECT doc_id, text,
       |         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |           text, '$e', '<EMAIL>', 'g'), '$i', '<IP>', 'g'),
       |           '$p', '<PHONE>', 'g'), '$b', '<TERM>', 'g') AS scrubbed
       |  FROM documents)""".stripMargin
  }
}
