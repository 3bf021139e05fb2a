package graft.llm

import graft.data.Tables
import graft.ops.QueryDef
import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH, RegexTokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table (north-star extension;
  * exact-dup semantics from config dedup, reference:
  * maggy/optimizer/abstractoptimizer.py:254-295).
  *
  * Scale design: every variant is a groupBy/join on a *derived key* (hash,
  * fingerprint, band bucket) so the shuffle moves only (key, doc_id) pairs,
  * never the document text. At 100 TB: hash keys are ~32 bytes/doc → the
  * dedup shuffle is ~3 orders of magnitude smaller than the corpus.
  */
object Dedup {

  /** Tokenize on single spaces (testdata is space-separated words). */
  private def tokens = split(col("text"), " ")

  val entries: Seq[QueryDef] = Seq(
    // Exact dedup: md5(text) as the group key; keeper = lowest doc_id.
    QueryDef("d1_exact_dedup",
      """SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keeper
        |FROM documents GROUP BY md5(text)""".stripMargin) { (s, d) =>
      Tables(s, d, "documents")
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
    },

    // Bag-of-words dedup: order-insensitive fingerprint (sorted token join).
    // Catches shuffled near-duplicates that exact hashing misses.
    QueryDef("d2_tokenbag_dedup",
      """SELECT md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS bag_hash,
        |       count(*) AS n_docs, min(doc_id) AS keeper
        |FROM documents
        |GROUP BY 1""".stripMargin) { (s, d) =>
      Tables(s, d, "documents")
        .groupBy(md5(array_join(array_sort(tokens), " ")).as("bag_hash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
    },

    // Exact n-gram (3-shingle) Jaccard between probe docs (doc_id % 50 = 0)
    // and same-source candidates — the oracle-checkable ground truth that the
    // MinHash/SimHash approximations are validated against in tests.
    QueryDef("d4_ngram_jaccard",
      """WITH sh AS (
        |  SELECT doc_id, source,
        |         list_distinct(list_transform(
        |           range(1, len(string_split(text,' ')) - 1),
        |           i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS shingles
        |  FROM documents)
        |SELECT a.doc_id AS probe_id, b.doc_id AS cand_id,
        |       round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |             (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
        |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE a.doc_id % 50 = 0""".stripMargin) { (s, d) =>
      val docs = Tables(s, d, "documents")
      val sh = docs.select(
        col("doc_id"), col("source"),
        array_distinct(transform(
          sequence(lit(1), size(tokens) - 2),
          i => array_join(slice(tokens, i, lit(3)), " "))).as("shingles"))
      val a = sh.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("probe_id"), col("source"), col("shingles").as("sh_a"))
      val b = sh.select(col("doc_id").as("cand_id"), col("source"), col("shingles").as("sh_b"))
      val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
      a.join(b, Seq("source")).filter(col("probe_id") < col("cand_id"))
        .select(
          col("probe_id"), col("cand_id"),
          round(inter / (size(col("sh_a")) + size(col("sh_b")) - inter), 6).as("jaccard"))
    },

    // SimHash (64-bit) near-dup buckets. Engine-specific hash (xxhash64) →
    // no SQL oracle; ScalaTest checks hamming(simhash) small for near-dups.
    QueryDef.noOracle("d5_simhash") { (s, d) =>
      simhash(Tables(s, d, "documents"))
    },

    // MinHash+LSH near-dup candidate pairs via MLlib (seeded, engine-
    // deterministic; LSH recall is probabilistic → rows-only + ScalaTest
    // validation against d4's exact Jaccard).
    QueryDef.noOracle("d3_minhash_pairs") { (s, d) =>
      minhashPairs(Tables(s, d, "documents"), jaccardDistThreshold = 0.6)
    }
  )

  /** 64-bit SimHash over token xxhash64 values: per doc, for each of 64 bit
    * positions sum ±1 across token hashes, sign → bit. Pure columnar
    * (explode + groupBy), no UDF; shuffle carries (doc_id, hash) longs only. */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    // weight per bit: +1 if bit set else -1; aggregate via sum over shiftright&1
    val bitCols = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val agg = tok.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** MinHash-LSH candidate pairs with exact Jaccard distance on candidates.
    * MLlib pipeline: tokenize → binary term vector → MinHashLSH(seed) →
    * approxSimilarityJoin (band-bucket join under the hood). */
  def minhashPairs(docs: DataFrame, jaccardDistThreshold: Double): DataFrame = {
    val tokenizer = new RegexTokenizer()
      .setInputCol("text").setOutputCol("toks").setPattern(" ")
    val toks = tokenizer.transform(docs)
    val cv = new CountVectorizer()
      .setInputCol("toks").setOutputCol("tf").setBinary(true)
      .fit(toks)
    // MinHashLSH requires ≥1 non-zero entry; every doc has ≥1 token so the
    // binary term vector is never empty.
    val vecs = cv.transform(toks).select("doc_id", "tf")
    val mh = new MinHashLSH().setInputCol("tf").setOutputCol("mh")
      .setNumHashTables(8).setSeed(42L)
    val model = mh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, jaccardDistThreshold, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"),
        round(col("jaccard_dist"), 6).as("jaccard_dist"))
      .filter(col("doc_a") < col("doc_b"))
  }
}
