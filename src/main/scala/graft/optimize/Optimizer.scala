package graft.optimize

import graft.core._

import java.util.SplittableRandom
import scala.collection.mutable

/** What the driver does next for a freed executor (reference return values
  * Trial | "IDLE" | None, maggy/optimizer/randomsearch.py:23-113). */
sealed trait Suggestion
final case class NewTrial(trial: Trial) extends Suggestion
case object Idle extends Suggestion
case object Done extends Suggestion

/** Async optimizer contract (reference: maggy/optimizer/abstractoptimizer.py).
  * Driver-side, single-threaded access (the digestion thread owns it). */
trait Optimizer {
  protected var searchspace: Searchspace = _
  protected var numTrials: Int = 0
  protected var direction: Direction.Value = Direction.Max
  protected var rng: SplittableRandom = _

  /** Finalized trials, in finalization order (final_store). */
  val finalStore: mutable.ArrayBuffer[Trial] = mutable.ArrayBuffer.empty
  /** Busy trials by id (trial_store). */
  val trialStore: mutable.LinkedHashMap[String, Trial] = mutable.LinkedHashMap.empty

  def initialize(searchspace: Searchspace, numTrials: Int, direction: Direction.Value, seed: Long): Unit = {
    this.searchspace = searchspace
    this.numTrials = numTrials
    this.direction = direction
    this.rng = new SplittableRandom(seed)
    validate()
    init()
  }

  protected def validate(): Unit = {}
  protected def init(): Unit = {}

  /** Ask for the next trial after `completed` finished (None on startup). */
  def getSuggestion(completed: Option[Trial]): Suggestion

  /** Bookkeeping called by the driver. */
  def noteStarted(t: Trial): Unit = trialStore.put(t.trialId, t)
  def noteFinalized(t: Trial): Unit = { trialStore.remove(t.trialId); finalStore += t }

  /** A trial died (train-fn exception or executor loss): drop it from the
    * busy store WITHOUT finalizing, so Done-detection and surrogate fits
    * never see it (reference: status ERROR, maggy/core/rpc.py:415-437). */
  def noteErrored(t: Trial): Unit = trialStore.remove(t.trialId)

  /** Duplicate-config check against busy + finalized trials (reference:
    * maggy/optimizer/abstractoptimizer.py:254-295). */
  def hparamsExist(t: Trial): Boolean = {
    val p = t.paramsSansBudget
    trialStore.valuesIterator.exists(_.paramsSansBudget == p) ||
      finalStore.iterator.exists(_.paramsSansBudget == p)
  }

  /** Metric in min-convention (max problems negate; reference:
    * maggy/optimizer/abstractoptimizer.py:186-252). */
  protected def minMetric(t: Trial): Double = {
    val m = t.finalMetric.getOrElse(Double.NaN)
    if (direction == Direction.Max) -m else m
  }

  def ybest: Double = if (finalStore.isEmpty) Double.NaN else finalStore.iterator.map(minMetric).min

  /** Shared pruner dispatch for optimizers running under a multi-fidelity
    * schedule (reference: BaseAsyncBO pruner integration,
    * maggy/optimizer/bayes/base.py:170-240): the pruner owns budgets and
    * promotions; `fresh` supplies the config for a new rung-0 run, or None
    * when every resample collided with an existing config — then the slot is
    * skipped (Idle while work remains, Done otherwise), mirroring the
    * non-pruner exhausted path: a reissued duplicate would collide on
    * trialId = md5(params incl. budget) and corrupt the driver's trial store
    * (reference stops too: bayes/base.py:288-301). */
  protected def prunerDispatch(p: Pruner, completed: Option[Trial], fresh: Double => Option[Trial]): Suggestion =
    p.pruningRoutine(completed, finalStore, trialStore) match {
      case PrunerDone => if (trialStore.nonEmpty) Idle else Done
      case PrunerIdle => Idle
      case RunNew(budget) =>
        fresh(budget) match {
          case None =>
            // roll back the pruner's slot reservation, or its rung
            // bookkeeping counts a config that never ran and stalls
            p.trackSkipped()
            if (trialStore.nonEmpty) Idle else Done
          case Some(base) =>
            val t = new Trial(base.paramsSansBudget + ("budget" -> HV.D(budget)),
              sampleType = base.sampleType, budget = Some(budget))
            p.trackIssued(t.trialId)
            NewTrial(t)
        }
      case Promote(trialId, budget) =>
        val src = finalStore.find(_.trialId == trialId)
          .getOrElse(throw new IllegalStateException(s"pruner promoted unknown trial $trialId"))
        val t = new Trial(src.paramsSansBudget + ("budget" -> HV.D(budget)),
          sampleType = "promoted", budget = Some(budget))
        p.trackIssued(t.trialId)
        NewTrial(t)
    }
}

/** Uniform random search; pre-samples the full trial budget at init and pops
  * per request (reference: maggy/optimizer/randomsearch.py:23-113). Supports
  * a multi-fidelity pruner subroutine (Hyperband). */
final class RandomSearch(pruner: Option[Pruner] = None) extends Optimizer {
  private val buffer = mutable.Queue.empty[Trial]

  override protected def validate(): Unit = {
    require(searchspace.containsContinuous,
      "random search requires at least one continuous (double/int) hyperparameter")
  }

  override protected def init(): Unit = pruner match {
    case None =>
      var attempts = 0
      while (buffer.size < numTrials && attempts < numTrials * 10) {
        val t = new Trial(searchspace.sample(rng))
        if (!buffer.exists(_.trialId == t.trialId)) buffer += t
        attempts += 1
      }
    case Some(p) => p.initialize(numTrials)
  }

  def getSuggestion(completed: Option[Trial]): Suggestion = pruner match {
    case None =>
      if (buffer.nonEmpty) NewTrial(buffer.dequeue())
      else if (trialStore.nonEmpty) Idle
      else Done
    case Some(p) =>
      p.pruningRoutine(completed, finalStore, trialStore) match {
        case PrunerDone => if (trialStore.nonEmpty) Idle else Done
        case PrunerIdle => Idle
        case RunNew(budget) =>
          // budget is part of params so promoted re-runs get distinct ids
          // (reference keeps 'budget' in the params dict and strips it for
          // dup checks, maggy/optimizer/abstractoptimizer.py:274-295)
          val t = new Trial(searchspace.sample(rng) + ("budget" -> HV.D(budget)),
            sampleType = "random", budget = Some(budget))
          p.trackIssued(t.trialId)
          NewTrial(t)
        case Promote(trialId, budget) =>
          val src = finalStore.find(_.trialId == trialId)
            .getOrElse(throw new IllegalStateException(s"pruner promoted unknown trial $trialId"))
          val t = new Trial(src.paramsSansBudget + ("budget" -> HV.D(budget)),
            sampleType = "promoted", budget = Some(budget))
          p.trackIssued(t.trialId)
          NewTrial(t)
      }
  }
}

/** Grid search — cartesian product of discrete/categorical axes (reference:
  * maggy/optimizer/gridsearch.py:33-92; rejects continuous params). */
final class GridSearch extends Optimizer {
  private val buffer = mutable.Queue.empty[Trial]

  override protected def validate(): Unit =
    require(!searchspace.containsContinuous,
      "grid search requires all params discrete/categorical")

  override protected def init(): Unit = {
    searchspace.grid().foreach(cfg => buffer += new Trial(cfg, sampleType = "grid"))
    numTrials = buffer.size
  }

  def getSuggestion(completed: Option[Trial]): Suggestion =
    if (buffer.nonEmpty) NewTrial(buffer.dequeue())
    else if (trialStore.nonEmpty) Idle
    else Done
}

/** N identical empty-param runs (reference: maggy/optimizer/singlerun.py:21-37). */
final class SingleRun extends Optimizer {
  private var issued = 0
  def getSuggestion(completed: Option[Trial]): Suggestion =
    if (issued < numTrials) {
      issued += 1
      // distinct ids per run: index param (the reference hashes app/run ids)
      NewTrial(new Trial(Map("run_index" -> HV.L(issued.toLong)), sampleType = "single"))
    } else if (trialStore.nonEmpty) Idle
    else Done
}

/** Asynchronous successive halving (reference: maggy/optimizer/asha.py).
  *
  * Rungs 0..maxRung with budgets resourceMin·rf^rung; on each completed
  * trial, scan rungs top-down and promote the best finalized not-yet-promoted
  * trial that is in the top 1/rf of its rung; otherwise sample a fresh random
  * config into rung 0. Sorts DESCENDING by final metric (reference
  * asha.py:165-166 — per-algorithm convention, do not "fix").
  */
final class Asha(reductionFactor: Int = 2, resourceMin: Double = 1, resourceMax: Double = 4)
    extends Optimizer {

  val maxRung: Int = (math.log(resourceMax / resourceMin) / math.log(reductionFactor)).floor.toInt
  // rung -> trial ids that entered it
  private val rungMembers = mutable.Map.empty[Int, mutable.ArrayBuffer[String]]
  private val promoted = mutable.Set.empty[String]
  private val trialRung = mutable.Map.empty[String, Int]
  private var created = 0

  override protected def validate(): Unit = {
    require(reductionFactor >= 2, "reduction factor must be >= 2")
    require(resourceMin > 0 && resourceMax > resourceMin, "invalid resource bounds")
    require(numTrials >= math.pow(reductionFactor, maxRung + 1),
      s"num_trials ($numTrials) must be >= rf^(maxRung+1) (${math.pow(reductionFactor, maxRung + 1).toInt})")
  }

  def budgetFor(rung: Int): Double = resourceMin * math.pow(reductionFactor, rung)

  /** Finalized members of a rung sorted descending by final metric, top k
    * (reference: asha.py:161-169). */
  private def topK(rung: Int, k: Int): Seq[Trial] = {
    val members = rungMembers.getOrElse(rung, mutable.ArrayBuffer.empty)
    members.flatMap(id => finalStore.find(_.trialId == id))
      .sortBy(t => -t.finalMetric.getOrElse(Double.NegativeInfinity))
      .take(k).toSeq
  }

  def getSuggestion(completed: Option[Trial]): Suggestion = {
    // scan rungs top-down for a promotable trial (reference asha.py:96-128)
    var rung = maxRung - 1
    while (rung >= 0) {
      val finalizedInRung = rungMembers.getOrElse(rung, mutable.ArrayBuffer.empty)
        .flatMap(id => finalStore.find(_.trialId == id))
      val k = finalizedInRung.size / reductionFactor
      val candidate = topK(rung, k).find(t => !promoted.contains(t.trialId))
      candidate match {
        case Some(t) =>
          promoted += t.trialId
          val next = new Trial(t.paramsSansBudget + ("budget" -> HV.D(budgetFor(rung + 1))),
            sampleType = "promoted", budget = Some(budgetFor(rung + 1)))
          rungMembers.getOrElseUpdate(rung + 1, mutable.ArrayBuffer.empty) += next.trialId
          trialRung(next.trialId) = rung + 1
          return NewTrial(next)
        case None => rung -= 1
      }
    }
    // otherwise a fresh random config into rung 0
    if (created < numTrials) {
      created += 1
      val t = new Trial(searchspace.sample(rng) + ("budget" -> HV.D(budgetFor(0))),
        budget = Some(budgetFor(0)))
      rungMembers.getOrElseUpdate(0, mutable.ArrayBuffer.empty) += t.trialId
      trialRung(t.trialId) = 0
      NewTrial(t)
    } else if (trialStore.nonEmpty) Idle
    else Done
  }

  def rungOf(trialId: String): Option[Int] = trialRung.get(trialId)
}

object Optimizer {
  /** Controller registry (reference: maggy/core/experiment_driver/
    * optimization_driver.py:49-57 controller_dict). */
  def forName(name: String, args: Map[String, Double] = Map.empty): Optimizer = name.toLowerCase match {
    case "randomsearch" | "random" => new RandomSearch()
    case "gridsearch" | "grid" => new GridSearch()
    case "none" | "single" => new SingleRun()
    case "asha" => new Asha(
      args.getOrElse("reduction_factor", 2.0).toInt,
      args.getOrElse("resource_min", 1.0),
      args.getOrElse("resource_max", 4.0))
    case "hyperband" => new RandomSearch(Some(new Hyperband(
      args.getOrElse("eta", 3.0).toInt,
      args.getOrElse("resource_min", 1.0),
      args.getOrElse("resource_max", 9.0))))
    case "tpe" => new Tpe()
    case "bohb" | "tpe_hyperband" => new Tpe(
      numWarmup = args.getOrElse("num_warmup", 6.0).toInt,
      pruner = Some(new Hyperband(
        args.getOrElse("eta", 3.0).toInt,
        args.getOrElse("resource_min", 1.0),
        args.getOrElse("resource_max", 9.0))))
    case "gp" => new Gp()
    case "gp_lcb" | "gp-lcb" => new Gp(acquisition = "lcb",
      lcbKappa = args.getOrElse("kappa", 1.96))
    case "gp_pi" | "gp-pi" => new Gp(acquisition = "pi")
    // AsyTS samples few candidates by design (reference gp.py:156-164:
    // n_points=100 for AsyTS, clipped [10, 1000])
    case "gp_asyts" | "gp-asyts" => new Gp(acquisition = "asyts",
      nPoints = args.getOrElse("n_points", 100.0).toInt)
    case "gp_interim" | "gp-interim" => new Gp(interimResults = true,
      interimInterval = args.getOrElse("interim_interval", 1.0).toInt)
    case "gp_hyperband" | "gp-hyperband" => new Gp(
      numWarmup = args.getOrElse("num_warmup", 6.0).toInt,
      pruner = Some(new Hyperband(
        args.getOrElse("eta", 3.0).toInt,
        args.getOrElse("resource_min", 1.0),
        args.getOrElse("resource_max", 9.0))))
    case other => throw new IllegalArgumentException(s"unknown optimizer: $other")
  }
}
