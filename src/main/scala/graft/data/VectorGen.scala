package graft.data

import org.apache.spark.sql.SparkSession

/** Parameterized vector-corpus generator for the ANN crossover measurement.
  *
  * Same generative family as [[ScaleGen]]'s embeddings (seeded spherical
  * Gaussian clusters, every row a pure function of (SEED, vec_id)) but with
  * the corpus size, dimensionality, and cluster count as arguments — the
  * regime where the IVFPQ tier's reason to exist is measurable: the exact
  * scan's probes×n×dim cost grows with BOTH n and dim, while the ADC scan
  * reads m bytes per candidate and routes away (1 − nProbe/k) of them.
  *
  * The cluster-center weight scales with √(dim/64): ScaleGen's fixed
  * 3·center + N(0,1) noise keeps a constant per-dimension SNR only at its
  * fixed dim = 64 (noise norm grows with √dim), so without the rescale a
  * higher-dim corpus would degenerate toward unclustered noise and measure
  * the generator, not the index.
  *
  * Usage: runMain graft.data.VectorGen [outDir] [nVec] [dim] [nClusters]
  * Writes <outDir>/embeddings.parquet in the shipped schema
  * (vec_id long, embedding array<float>, label int).
  */
object VectorGen {
  private val SEED = 1042L

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("/tmp/graft_scale/vec2m")
    val nVec = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val dim = args.lift(2).map(_.toInt).getOrElse(256)
    val nClusters = args.lift(3).map(_.toInt).getOrElse(64)

    val spark = SparkSession.builder()
      .appName("graft-vectorgen")
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val centerScale = 3.0 * math.sqrt(dim / 64.0)
    val centers: Array[Array[Double]] = {
      val r = new java.util.Random(mix(SEED + 7))
      Array.fill(nClusters) {
        val c = Array.fill(dim)(r.nextGaussian())
        val n = math.sqrt(c.map(x => x * x).sum)
        c.map(_ / n)
      }
    }
    val centersB = spark.sparkContext.broadcast(centers)
    val k = nClusters
    val cs = centerScale
    val embs = spark.range(nVec)
      .repartition(Runtime.getRuntime.availableProcessors() * 4)
      .mapPartitions { it =>
        val cents = centersB.value
        it.map { id =>
          val rng = new java.util.Random(mix(SEED ^ (id + 0x5eed)))
          val label = (id % k).toInt
          val v = cents(label).map(c => cs * c + rng.nextGaussian())
          val n = math.sqrt(v.map(x => x * x).sum)
          (id.toLong, v.map(x => (x / n).toFloat), label)
        }
      }
      .toDF("vec_id", "embedding", "label")
    embs.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val written = spark.read.parquet(s"$out/embeddings.parquet").count()
    println(s"VECTORGEN n=$written dim=$dim clusters=$nClusters out=$out")
    spark.stop()
  }
}
