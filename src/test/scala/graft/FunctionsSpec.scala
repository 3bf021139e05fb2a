package graft

import graft.functions.{CosineSimilarity, Scored, TopKAggregator}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-style tests for the custom Catalyst pieces (seeded generators —
  * deterministic but broad). The aggregator properties matter because Spark
  * merges partial buffers in a NONDETERMINISTIC order on a real cluster;
  * local[32] rarely exercises adversarial partitionings/merge orders, so
  * they are generated here instead.
  */
class FunctionsSpec extends AnyFunSuite {

  private def brute(k: Int, xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
    xs.sortBy { case (id, s) => (-s, id) }.take(k)

  test("TopKAggregator equals sort-take-k under arbitrary partitioning and merge order") {
    val rng = new Random(7)
    for (_ <- 1 to 300) {
      val n = rng.nextInt(60)
      // small id range forces score ties → exercises the id tiebreak
      val xs = List.fill(n)((rng.nextInt(50).toLong, (rng.nextInt(40) - 20) / 2.0))
      val k = 1 + rng.nextInt(8)
      val nParts = 1 + rng.nextInt(5)
      val agg = new TopKAggregator(k)
      val buffers = xs.grouped(math.max(1, n / nParts + 1)).toSeq
        .map(_.foldLeft(agg.zero)((b, x) => agg.reduce(b, Scored(x._1, x._2))))
      val shuffled = rng.shuffle(buffers)
      val merged = shuffled.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == brute(k, xs),
        s"k=$k parts=$nParts xs=$xs")
    }
  }

  test("TopKAggregator merge is associative") {
    val rng = new Random(11)
    for (_ <- 1 to 200) {
      def xs() = List.fill(rng.nextInt(30))((rng.nextInt(40).toLong, rng.nextDouble() * 10 - 5))
      val (a, b, c) = (xs(), xs(), xs())
      val k = 1 + rng.nextInt(6)
      val agg = new TopKAggregator(k)
      def buf(l: List[(Long, Double)]) =
        l.foldLeft(agg.zero)((acc, x) => agg.reduce(acc, Scored(x._1, x._2)))
      val left = agg.merge(agg.merge(buf(a), buf(b)), buf(c))
      val right = agg.merge(buf(a), agg.merge(buf(b), buf(c)))
      assert(left == right)
    }
  }

  test("cosine_similarity is callable from plain SQL after registration") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("fn-spec")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // config-path registration may be skipped if another suite created the
    // session first (getOrCreate) — the runtime path must cover that
    graft.functions.GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
    val ortho = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(0.0d, 2.0d)) AS c").head().getDouble(0)
    assert(math.abs(ortho) < 1e-12)
  }

  test("CosineSimilarity eval matches the plain Scala formulation bit-for-bit") {
    val rng = new Random(13)
    for (_ <- 1 to 300) {
      val n = 1 + rng.nextInt(16)
      val a = Array.fill(n)(rng.nextDouble() * 10 - 5)
      val b = Array.fill(n)(rng.nextDouble() * 10 - 5)
      val expr = CosineSimilarity(
        Literal(ArrayData.toArrayData(a), ArrayType(DoubleType)),
        Literal(ArrayData.toArrayData(b), ArrayType(DoubleType)))
      val got = expr.eval(null).asInstanceOf[Double]
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      val want = dot / math.sqrt(na * nb)
      assert(java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(want))
    }
  }
}
