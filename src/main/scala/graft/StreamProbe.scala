package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"PROBE $tag ${(System.nanoTime() - t0) / 1e9}"); r
    }
    val docs = graft.data.Tables(spark, d, "documents")
    docs.count()
    val sh = graft.llm.Dedup.shingleSets(docs)
    t("sh-noop") { sh.write.mode("overwrite").format("noop").save() }
    val shP = sh.persist()
    t("sh-persist-count") { shP.count() }
    t("sh-cached-noop") { shP.write.mode("overwrite").format("noop").save() }
    val sizes = shP.select(col("doc_id"), size(col("sh")).as("n"))
    val tok = shP.select(col("doc_id"), explode(col("sh")).as("h"))
    val scored = tok.select(col("doc_id").as("doc_a"), col("h"))
      .join(tok.select(col("doc_id").as("doc_b"), col("h")), "h")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).cast("double").as("n_inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")), 6).as("jaccard"))
    t("scored-noop-shcached") { scored.write.mode("overwrite").format("noop").save() }
    val scP = scored.persist()
    t("scored-persist-count") { scP.count() }
    t("scored-cached-filter-noop") { scP.filter(col("jaccard") >= 0.8).write.mode("overwrite").format("noop").save() }
    spark.stop()
  }
}
