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
      val sh = transform(
        sequence(lit(1), greatest(size(toks) - 4, lit(1))),
        i => md5(array_join(slice(toks, i, lit(5)), " ")))
      Tables(s, d, "documents").select(col("doc_id"), array_min(sh).as("fingerprint"))
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
      val clean = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), "  +", " "))
      Tables(s, d, "documents").select(
        col("doc_id"), md5(clean).as("clean_hash"), length(clean).as("clean_len"))
    }
  )
}
