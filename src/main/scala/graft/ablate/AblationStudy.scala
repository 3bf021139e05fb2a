package graft.ablate

import graft.core.{HV, Trial}
import org.apache.spark.sql.DataFrame

/** Declarative ablation study (reference: maggy/ablation/ablationstudy.py:123-128,253-347).
  * Features ablate data-plane columns; components ablate model pieces (the
  * engine ablates MLlib Pipeline stages instead of Keras layers). */
final case class AblationStudy(
    features: Set[String] = Set.empty,
    components: Set[String] = Set.empty,
    componentGroups: Set[Set[String]] = Set.empty,
    prefixGroups: Set[String] = Set.empty)

/** Leave-One-Component-Out trial generator (reference:
  * maggy/ablation/ablator/loco.py:26-261): base trial + one trial per
  * included feature + per component + per group + per prefix group.
  */
object Loco {
  val BaseMarker = "__base__"

  /** The ablation trial plan. Trial-id hashes only the ablation keys
    * (reference: maggy/trial.py:62-67). */
  def trials(study: AblationStudy, allComponents: Set[String] = Set.empty): Seq[Trial] = {
    val base = ablationTrial(BaseMarker, BaseMarker)
    val feat = study.features.toSeq.sorted.map(f => ablationTrial(f, BaseMarker))
    val comp = study.components.toSeq.sorted.map(c => ablationTrial(BaseMarker, c))
    val groups = study.componentGroups.toSeq.map(_.toSeq.sorted.mkString(","))
      .sorted.map(g => ablationTrial(BaseMarker, g))
    val prefixes = study.prefixGroups.toSeq.sorted.map { p =>
      val members = allComponents.filter(_.startsWith(p)).toSeq.sorted.mkString(",")
      ablationTrial(BaseMarker, if (members.nonEmpty) members else p)
    }
    base +: (feat ++ comp ++ groups ++ prefixes)
  }

  private def ablationTrial(feature: String, component: String): Trial =
    new Trial(
      Map("ablated_feature" -> HV.S(feature), "ablated_layer" -> HV.S(component)),
      sampleType = "ablation")

  /** Feature ablation is a projection complement (reference:
    * maggy/ablation/ablator/loco.py:63-67 removes the feature from the
    * TFRecord feature list; here: Catalyst prunes the column at the scan). */
  def ablateFeature(df: DataFrame, trial: Trial): DataFrame =
    trial.params("ablated_feature") match {
      case HV.S(BaseMarker) => df
      case HV.S(f) => df.drop(f)
      case _ => df
    }

  /** The ablated stage names a trial asks to drop — the engine analog of the
    * reference rebuilding the Keras model JSON without the named layer(s)
    * (maggy/ablation/ablator/loco.py:99-136). Rewiring adjacent stages is
    * the pipeline builder's concern, same as layer ablation can rewire
    * tensors. Empty set = base trial. */
  def ablatedStages(trial: Trial): Set[String] =
    trial.params.get("ablated_layer") match {
      case Some(HV.S(BaseMarker)) | None => Set.empty
      case Some(HV.S(spec)) => spec.split(",").toSet
      case _ => Set.empty
    }

  /** The ablated feature name, if the trial ablates one. */
  def ablatedFeature(trial: Trial): Option[String] =
    trial.params.get("ablated_feature") match {
      case Some(HV.S(BaseMarker)) | None => None
      case Some(HV.S(f)) => Some(f)
      case _ => None
    }
}
