package graft.optimize

import graft.core.{Direction, Trial}

/** Early-stopping policies (reference: maggy/earlystop/). */
trait EarlyStopRule {
  /** Returns trial ids that should stop now. */
  def check(toCheck: Iterable[Trial], finalized: Seq[Trial], direction: Direction.Value): Seq[String]
}

/** Never stops (reference: maggy/earlystop/nostop.py:21-24). */
object NoStoppingRule extends EarlyStopRule {
  def check(toCheck: Iterable[Trial], finalized: Seq[Trial], direction: Direction.Value): Seq[String] = Seq.empty
}

/** Median stopping rule (reference: maggy/earlystop/medianrule.py:27-60).
  *
  * For a running candidate with k observed steps: compute, for each finalized
  * trial, the average of its FIRST k metrics (prefix average truncated at the
  * candidate's step count); if the candidate's best-so-far metric is worse
  * than the median of those prefix averages (direction-aware), stop it.
  */
object MedianStoppingRule extends EarlyStopRule {
  def check(toCheck: Iterable[Trial], finalized: Seq[Trial], direction: Direction.Value): Seq[String] =
    toCheck.flatMap { cand =>
      val hist = cand.metricHistory
      if (hist.isEmpty || finalized.isEmpty) None
      else {
        val k = hist.size
        val prefixAvgs = finalized.flatMap { t =>
          val h = t.metricHistory.take(k)
          if (h.isEmpty) None else Some(h.map(_.value).sum / h.size)
        }
        if (prefixAvgs.isEmpty) None
        else {
          val med = median(prefixAvgs)
          val best =
            if (direction == Direction.Max) hist.map(_.value).max
            else hist.map(_.value).min
          val shouldStop =
            if (direction == Direction.Max) best < med else best > med
          if (shouldStop) Some(cand.trialId) else None
        }
      }
    }.toSeq

  /** Linear-interpolated median, matching numpy.median. */
  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.size
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }
}
