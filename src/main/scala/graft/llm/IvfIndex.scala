package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor index.
  *
  * Build: KMeans over the corpus → each vector assigned to its nearest centroid
  * ("cell"). Search: route each probe to its nProbe nearest centroids, scan
  * only those cells. At 100 TB the corpus would be written out partitioned by
  * `cell` (partition pruning turns the probe scan into a subset read); here
  * the cell assignment is computed inline on the same plan shape.
  */
object IvfIndex {

  def annSearch(probes: DataFrame, corpus: DataFrame, k: Int, nClusters: Int, nProbe: Int): DataFrame = {
    val spark = corpus.sparkSession
    val vecs = corpus.select(col("vec_id"), col("embedding"),
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val km = new KMeans().setK(nClusters).setSeed(42L).setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(vecs)
    val assigned = model.transform(vecs).select(col("vec_id"), col("embedding"), col("cell"))

    // centroids as a broadcastable lookup
    val centroids = model.clusterCenters.zipWithIndex.map { case (v, i) => (i, v.toArray) }
    val centDf = broadcast(spark.createDataFrame(centroids.toSeq).toDF("cell", "centroid"))

    // route each probe to its nProbe nearest centroids
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").cast("array<double>").as("pv"))
    val wRoute = Window.partitionBy("probe_id").orderBy(col("cdist"), col("cell"))
    val routed = p.crossJoin(centDf)
      .withColumn("cdist",
        aggregate(zip_with(col("pv"), col("centroid"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, v) => a + v))
      .withColumn("rr", row_number().over(wRoute))
      .filter(col("rr") <= nProbe)
      .select(col("probe_id"), col("pv"), col("cell"))

    // scan only the routed cells
    val cand = assigned.select(col("vec_id").as("cand_id"),
      col("embedding").cast("array<double>").as("cv"), col("cell"))
    val scored = cand.join(broadcast(routed), Seq("cell"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("cos_raw", Similarity.cosine(col("pv"), col("cv")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos_raw").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("cand_id"), round(col("cos_raw"), 6).as("cosine"), col("rn"))
  }
}
