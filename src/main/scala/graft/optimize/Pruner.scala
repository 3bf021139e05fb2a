package graft.optimize

import graft.core.Trial

import scala.collection.mutable

sealed trait PrunerDecision
final case class RunNew(budget: Double) extends PrunerDecision
final case class Promote(trialId: String, budget: Double) extends PrunerDecision
case object PrunerIdle extends PrunerDecision
case object PrunerDone extends PrunerDecision

/** Multi-fidelity pruner subroutine contract (reference:
  * maggy/pruner/hyperband.py pruning_routine returning
  * {trial_id|None, budget} / "IDLE" / None). */
trait Pruner {
  def initialize(maxTrials: Int): Unit
  def pruningRoutine(
      completed: Option[Trial],
      finalStore: mutable.ArrayBuffer[Trial],
      trialStore: mutable.LinkedHashMap[String, Trial]): PrunerDecision
  /** Called by the optimizer with the id of the trial created for the last
    * RunNew/Promote decision. */
  def trackIssued(trialId: String): Unit = {}
  /** Called by the optimizer when the last RunNew decision could NOT be
    * filled (config supply exhausted): the pruner must roll back whatever
    * it reserved for the slot, or the rung under-fills forever. */
  def trackSkipped(): Unit = {}
}

/** Synchronous-iteration Hyperband (reference: maggy/pruner/hyperband.py).
  *
  * Budget math (reference :66-135): maxShRungs = -⌊log(min/max)/log(η)⌋ + 1;
  * geometric budgets budget_r = max·η^(r - maxShRungs + 1); SH iteration k
  * starts with n0_k = ⌊maxShRungs/(k+1)⌋·η^k configs at rung k... wait, per
  * reference: iteration k (0-indexed) skips the first k rungs, i.e. starts at
  * rung k with n0 = ⌊maxShRungs/(k+1)⌋·η^(maxShRungs-1-k) configs. Promotion:
  * sort rung ASCENDING by metric (min-convention — the reference's Hyperband
  * sorts asc while ASHA sorts desc; replicated as-is, SURVEY §4.3.4) and take
  * the top n_{r+1} into the next rung.
  */
final class Hyperband(eta: Int = 3, resourceMin: Double = 1, resourceMax: Double = 9)
    extends Pruner {

  val maxShRungs: Int = (-math.floor(math.log(resourceMin / resourceMax) / math.log(eta)) + 1).toInt
  /** budget at rung r (r = 0..maxShRungs-1): min·η^r, capped at max. */
  def budgetFor(rung: Int): Double = math.min(resourceMin * math.pow(eta, rung), resourceMax)

  /** One successive-halving iteration: rungs startRung..maxShRungs-1
    * (iteration i skips the first i budget levels; reference
    * hyperband.py:197-218: n_rungs = maxShRungs-1-i,
    * n0 = ⌊maxShRungs/(n_rungs+1)⌋·η^n_rungs). */
  final class ShIteration(val startRung: Int) {
    private val nRungs = maxShRungs - 1 - startRung
    val n0: Int = math.max(1,
      (maxShRungs.toDouble / (nRungs + 1)).floor.toInt * math.pow(eta, nRungs).toInt)
    def configsAt(rung: Int): Int = math.max(1, n0 / math.pow(eta, rung - startRung).toInt)

    val rungTrials: mutable.Map[Int, mutable.ArrayBuffer[String]] =
      mutable.Map(startRung -> mutable.ArrayBuffer.empty)
    val promotedFrom: mutable.Set[String] = mutable.Set.empty
    var newIssued = 0

    def currentRung: Int = rungTrials.keys.max

    def isComplete(finalized: String => Boolean): Boolean =
      currentRung == maxShRungs - 1 &&
        rungTrials(currentRung).size >= configsAt(currentRung) &&
        rungTrials(currentRung).forall(finalized)
  }

  private var iterations: Seq[ShIteration] = Seq.empty

  def initialize(maxTrials: Int): Unit = {
    iterations = (0 until maxShRungs).map(k => new ShIteration(k))
  }

  def pruningRoutine(
      completed: Option[Trial],
      finalStore: mutable.ArrayBuffer[Trial],
      trialStore: mutable.LinkedHashMap[String, Trial]): PrunerDecision = {

    def isFinalized(id: String) = finalStore.exists(_.trialId == id)
    def metricOf(id: String): Double =
      finalStore.find(_.trialId == id).flatMap(_.finalMetric).getOrElse(Double.PositiveInfinity)

    for (it <- iterations) {
      // 1) fill the iteration's start rung with fresh configs
      if (it.newIssued < it.n0) {
        it.newIssued += 1
        return RunNewTracked(it, it.startRung)
      }
      // 2) promote within the iteration when a rung is fully finalized
      for (rung <- it.startRung until maxShRungs - 1) {
        val members = it.rungTrials.getOrElse(rung, mutable.ArrayBuffer.empty)
        val nextMembers = it.rungTrials.getOrElse(rung + 1, mutable.ArrayBuffer.empty)
        val target = it.configsAt(rung)
        val nextTarget = it.configsAt(rung + 1)
        if (members.size >= target && members.forall(isFinalized) && nextMembers.size < nextTarget) {
          // promotion sorts ASCENDING (min-convention; reference hyperband.py:506-514)
          val candidates = members.filterNot(it.promotedFrom.contains)
            .sortBy(metricOf)
          candidates.headOption match {
            case Some(id) =>
              it.promotedFrom += id
              it.rungTrials.getOrElseUpdate(rung + 1, mutable.ArrayBuffer.empty)
              return PromoteTracked(it, rung + 1, id)
            case None => // all promoted already
          }
        }
      }
    }
    if (iterations.forall(_.isComplete(isFinalized)) && trialStore.isEmpty) PrunerDone
    else PrunerIdle
  }

  // -- tracking helpers: the optimizer calls trackIssued with the created id --
  private var pendingTrack: Option[(ShIteration, Int)] = None
  private def RunNewTracked(it: ShIteration, rung: Int): PrunerDecision = {
    pendingTrack = Some((it, rung))
    RunNew(budgetFor(rung))
  }
  private def PromoteTracked(it: ShIteration, rung: Int, srcId: String): PrunerDecision = {
    pendingTrack = Some((it, rung))
    Promote(srcId, budgetFor(rung))
  }
  override def trackIssued(trialId: String): Unit = pendingTrack match {
    case Some((it, rung)) =>
      it.rungTrials.getOrElseUpdate(rung, mutable.ArrayBuffer.empty) += trialId
      pendingTrack = None
    case None =>
  }

  /** Roll back an unfilled RunNew reservation (see Pruner.trackSkipped):
    * without this the iteration counts a config that never ran, its start
    * rung can never reach n0, and the schedule stalls in Idle forever. */
  override def trackSkipped(): Unit = pendingTrack match {
    case Some((it, rung)) =>
      if (rung == it.startRung && it.newIssued > 0) it.newIssued -= 1
      pendingTrack = None
    case None =>
  }
}
