package graft.optimize

import graft.core._
import graft.core.HParam

import scala.collection.mutable

/** Tree-structured Parzen Estimator, BOHB-flavored (reference:
  * maggy/optimizer/bayes/tpe.py).
  *
  * Constants preserved from the reference (tpe.py:38-73,266; SURVEY §4.3.7):
  * γ=0.15 quantile split with n_good = max(d+1, ⌈γ·N⌉); 24 candidate samples
  * from the good KDE; bandwidth floor 1e-3; sampling bandwidth factor 3;
  * EI floor 1e-32. KDE: product of per-dim Gaussians over [0,1]-transformed
  * configs with normal-reference bandwidth bw_j = 1.06·σ_j·n^(-1/(4+d)).
  * Warm-up: random until both KDEs would have > d points.
  */
final class Tpe(
    gamma: Double = 0.15,
    numSamples: Int = 24,
    bwFloor: Double = 1e-3,
    bwFactor: Double = 3.0,
    numWarmup: Int = 15,
    randomFraction: Double = 0.33,
    pruner: Option[Pruner] = None) extends Optimizer {

  private var issued = 0
  private var exhausted = false
  // model-per-budget cache, invalidated when that budget's finalized count
  // grows (reference: models dict keyed by budget, bayes/base.py:251-256)
  private val kdeCache = mutable.Map.empty[Double, (Int, Kde, Kde, Array[Array[Double]])]

  override protected def validate(): Unit = {
    require(searchspace.containsContinuous, "TPE requires at least one continuous param")
    require(!searchspace.containsDiscrete, "TPE forbids DISCRETE numeric params (reference bayes/base.py:149-165)")
  }

  private def dims: Int = searchspace.params.size

  override protected def init(): Unit = pruner.foreach(_.initialize(numTrials))

  def getSuggestion(completed: Option[Trial]): Suggestion = pruner match {
    case None =>
      if (exhausted || issued >= numTrials) {
        return if (trialStore.nonEmpty) Idle else Done
      }
      val t = suggestConfig(None)
      if (hparamsExist(t)) {
        // resample ≤3 attempts; if every attempt collides, the searchspace is
        // exhausted — STOP the experiment rather than reissue a duplicate
        // trialId that would corrupt the driver's trial store (reference
        // stops too: bayes/base.py:288-301)
        (1 to 3).iterator.map(_ => new Trial(searchspace.sample(rng)))
          .find(c => !hparamsExist(c)) match {
          case Some(c) => issued += 1; NewTrial(c)
          case None =>
            exhausted = true
            if (trialStore.nonEmpty) Idle else Done
        }
      } else { issued += 1; NewTrial(t) }

    // BOHB shape: the pruner schedules budgets/promotions, TPE supplies the
    // configs for fresh rung-0 runs from the best-informed budget's model
    // (reference: BaseAsyncBO + pruner, bayes/base.py:170-313)
    case Some(p) =>
      prunerDispatch(p, completed, budget => {
        val model = suggestConfig(Some(budget))
        if (!hparamsExist(model)) Some(model)
        else (1 to 3).iterator.map(_ => new Trial(searchspace.sample(rng)))
          .find(c => !hparamsExist(c))
      })
  }

  /** KDE pair for the MODELED budget's finalized trials, cached until that
    * budget accrues new observations. `key` is the budget the `finished` set
    * was actually selected from (not the requested rung budget): the BOHB
    * rule can switch which budget is modeled between calls, and keying by
    * the requested budget would let a stale model (fit on a different
    * budget's set of coincidentally equal size) be reused. */
  private def kdesFor(key: Double, finished: Seq[Trial]): Option[(Kde, Kde, Array[Array[Double]])] = {
    val sorted = finished.sortBy(minMetric)
    val nGood = math.max(dims + 1, math.ceil(gamma * sorted.size).toInt)
    if (sorted.size - nGood <= dims) return None
    kdeCache.get(key) match {
      case Some((n, g, b, goodX)) if n == finished.size => Some((g, b, goodX))
      case _ =>
        val good = sorted.take(nGood).map(t => searchspace.transform(t.paramsSansBudget)).toArray
        val bad = sorted.drop(nGood).map(t => searchspace.transform(t.paramsSansBudget)).toArray
        val g = Kde.fit(good)
        val b = Kde.fit(bad)
        kdeCache(key) = (finished.size, g, b, good)
        Some((g, b, good))
    }
  }

  private def suggestConfig(budget: Option[Double]): Trial = {
    // BOHB rule: model the LARGEST budget that has enough observations —
    // high-fidelity evidence beats volume (reference samples from
    // models[max budget], bayes/base.py:251-313)
    val all = finalStore.filter(_.finalMetric.isDefined).toSeq
    // (modelKey, finished): the budget actually modeled and its trials —
    // the key MUST travel with the set it selected (see kdesFor)
    val (modelKey, finished) = budget match {
      case None => (-1.0, all)
      case Some(_) =>
        val byBudget = all.groupBy(_.budget.getOrElse(0.0))
        byBudget.filter(_._2.size > 2 * (dims + 1)).toSeq
          .sortBy(-_._1).headOption match {
          case Some((b, ts)) => (b, ts)
          case None => (-1.0, Seq.empty[Trial])
        }
    }
    // ε-greedy exploration shared by all BO optimizers (reference
    // bayes/base.py:232-248, random_fraction=0.33)
    if (finished.size <= math.max(numWarmup, 2 * (dims + 1)) ||
        finished.size < 2 * (dims + 1) ||
        rng.nextDouble() < randomFraction) {
      return new Trial(searchspace.sample(rng), sampleType = "random")
    }
    // γ-split into good/bad by min-convention metric (tpe.py:191-221),
    // KDEs cached per budget until new observations arrive
    val (goodKde, badKde, good) = kdesFor(modelKey, finished) match {
      case Some(k) => k
      case None => return new Trial(searchspace.sample(rng), sampleType = "random")
    }

    // sample candidates from the good KDE with widened bandwidth (tpe.py:75-132)
    var bestX: Array[Double] = null
    var bestEi = Double.NegativeInfinity
    for (_ <- 0 until numSamples) {
      val center = good(rng.nextInt(good.length))
      val x = Array.tabulate(dims) { j =>
        searchspace.params(j) match {
          // categorical dim: keep the center's category with prob 1−bw,
          // else resample uniformly (reference tpe.py:100-116 — the
          // unordered-KDE analog of a gaussian perturbation)
          case HParam.CategoricalParam(_, vs) =>
            val bw = math.min(1.0, math.max(goodKde.bw(j), bwFloor))
            if (rng.nextDouble() < 1.0 - bw) center(j)
            else {
              val idx = rng.nextInt(vs.size)
              if (vs.size > 1) idx.toDouble / (vs.size - 1) else 0.0
            }
          case _ =>
            val bw = math.max(goodKde.bw(j), bwFloor) * bwFactor
            // truncated normal on [0,1] via clamped gaussian draw
            val v = center(j) + rng.nextGaussian() * bw
            math.min(1.0, math.max(0.0, v))
        }
      }
      val ei = math.max(goodKde.pdf(x), 1e-32) / math.max(badKde.pdf(x), 1e-32)
      if (ei > bestEi) { bestEi = ei; bestX = x }
    }
    new Trial(searchspace.inverseTransform(bestX), sampleType = "model")
  }
}

/** Product-of-Gaussians multivariate KDE with normal-reference bandwidth
  * (stands in for statsmodels KDEMultivariate 'normal_reference',
  * reference tpe.py:137-189). */
final class Kde(data: Array[Array[Double]], val bw: Array[Double]) {
  private val d = bw.length
  private val invTwoPiSqrt = 1.0 / math.sqrt(2 * math.Pi)

  def pdf(x: Array[Double]): Double = {
    var total = 0.0
    var i = 0
    while (i < data.length) {
      var prod = 1.0
      var j = 0
      while (j < d) {
        val b = bw(j)
        val z = (x(j) - data(i)(j)) / b
        prod *= invTwoPiSqrt / b * math.exp(-0.5 * z * z)
        j += 1
      }
      total += prod
      i += 1
    }
    total / data.length
  }
}

object Kde {
  def fit(data: Array[Array[Double]]): Kde = {
    val n = data.length
    val d = data(0).length
    val bw = Array.tabulate(d) { j =>
      val col = data.map(_(j))
      val mean = col.sum / n
      val varr = col.map(v => (v - mean) * (v - mean)).sum / math.max(n - 1, 1)
      val sigma = math.sqrt(varr)
      math.max(1.06 * sigma * math.pow(n, -1.0 / (4 + d)), 1e-3)
    }
    new Kde(data, bw)
  }
}
