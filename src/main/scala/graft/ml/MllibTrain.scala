package graft.ml

import graft.data.Tables
import org.apache.spark.ml.{Pipeline, PipelineStage}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical MLlib training setup over the testdata: predict whether a
  * lineitem was returned from its numeric measures. A weak-but-real binary
  * task whose point is the experiment plumbing (per-trial Pipeline fits,
  * hyperparameters from the TrialContext, stage/feature ablation), not
  * model quality.
  */
object MllibTrain {

  val FeatureCols: Seq[String] = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Binary-label training frame; cached by the caller if reused per trial. */
  def lineitemFrame(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "lineitem").select(
      (col("l_returnflag") === "R").cast("double").as("label"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))

  /** Named, ablatable pipeline stages. The LR reads the scaler output when
    * the scaler is present, the raw assembled vector when it was ablated —
    * stage ablation must rewire adjacent stages, exactly like the
    * reference's Keras layer ablation rebuilds the model JSON
    * (maggy/ablation/ablator/loco.py:99-136). */
  def logisticStages(
      features: Seq[String],
      regParam: Double,
      elasticNet: Double,
      useScaler: Boolean): Seq[(String, PipelineStage)] = {
    val assembler = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("rawFeatures")
    val scaler = new StandardScaler()
      .setInputCol("rawFeatures").setOutputCol("scaledFeatures").setWithMean(true)
    val lr = new LogisticRegression()
      .setRegParam(regParam).setElasticNetParam(elasticNet)
      .setFeaturesCol(if (useScaler) "scaledFeatures" else "rawFeatures")
      .setLabelCol("label")
      .setMaxIter(25)
    if (useScaler) Seq("assembler" -> assembler, "scaler" -> scaler, "lr" -> lr)
    else Seq("assembler" -> assembler, "lr" -> lr)
  }

  /** Fit the pipeline on train, return area-under-ROC on test. When a
    * reporter is given, the LR training objective history is broadcast per
    * iteration — the engine analog of the reference's Keras callbacks
    * reporting loss at epoch end (maggy/core/utils/callbacks.py:21-66),
    * which is also what feeds GP interim-results mode. */
  def fitAuc(
      stages: Seq[PipelineStage],
      train: DataFrame,
      test: DataFrame,
      reporter: Option[graft.exec.Reporter] = None): Double = {
    val model = new Pipeline().setStages(stages.toArray).fit(train)
    for {
      r <- reporter
      lr <- model.stages.collectFirst { case m: org.apache.spark.ml.classification.LogisticRegressionModel => m }
      (loss, i) <- lr.summary.objectiveHistory.zipWithIndex
    } r.broadcast(loss, i.toLong)
    new BinaryClassificationEvaluator()
      .setLabelCol("label").setMetricName("areaUnderROC")
      .evaluate(model.transform(test))
  }
}
