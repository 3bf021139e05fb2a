package graft.core

import java.security.MessageDigest

/** Trial status FSM (reference: maggy/trial.py:33-37). */
object TrialStatus extends Enumeration {
  val Pending, Scheduled, Running, Error, Finalized = Value
}

/** One metric observation (step, value) — steps are monotone non-decreasing,
  * duplicates dropped (reference: maggy/trial.py:93-108). */
final case class MetricPoint(step: Long, value: Double)

/** One evaluation of a hyperparameter config (reference: maggy/trial.py).
  *
  * Driver-side shared state between the RPC server thread and the message
  * digestion thread → all mutators synchronized (reference guards with an
  * RLock, maggy/trial.py:28-31,77).
  */
final class Trial(
    val params: Map[String, HV],
    val sampleType: String = "random",
    val budget: Option[Double] = None,
    val runBudget: Double = 0.0) {

  val trialId: String = Trial.trialIdFor(params)

  @volatile var status: TrialStatus.Value = TrialStatus.Pending
  @volatile var earlyStop: Boolean = false
  @volatile var finalMetric: Option[Double] = None
  @volatile var assignedPartition: Option[Int] = None
  @volatile var startMs: Long = 0L
  @volatile var durationMs: Long = 0L

  private val history = scala.collection.mutable.ArrayBuffer.empty[MetricPoint]
  // non-driving metrics from a dict-returning train fn (Reporter.logMetric);
  // LinkedHashMap so persistence order matches arrival order
  private val extrasMap = scala.collection.mutable.LinkedHashMap.empty[String, Double]

  def putExtra(key: String, value: Double): Unit = synchronized { extrasMap(key) = value }
  def extras: Map[String, Double] = synchronized {
    scala.collection.immutable.ListMap.from(extrasMap)
  }

  def appendMetric(step: Long, value: Double): Unit = synchronized {
    // drop duplicate steps (at-least-once heartbeats), require monotone steps
    if (history.isEmpty || step > history.last.step) history += MetricPoint(step, value)
  }
  def metricHistory: Vector[MetricPoint] = synchronized(history.toVector)
  def lastMetric: Option[MetricPoint] = synchronized(history.lastOption)

  def finalize_(metric: Double): Unit = synchronized {
    finalMetric = Some(metric)
    status = TrialStatus.Finalized
    if (startMs > 0) durationMs = System.currentTimeMillis() - startMs
  }

  /** Params without the injected budget key (duplicate-config comparison,
    * reference: maggy/optimizer/abstractoptimizer.py:274-295). */
  def paramsSansBudget: Map[String, HV] = params - "budget"

  override def toString: String = s"Trial($trialId, $status, params=${Trial.canonicalJson(params)})"
}

object Trial {
  /** Canonical JSON matching Python's `json.dumps(d, sort_keys=True)` with
    * default separators `", "` / `": "` — required for trial-id parity with
    * the reference (maggy/trial.py:132-134; golden test expects
    * "3d1cc9fdb1d4d001" for {"param1": 5, "param2": "ada"},
    * maggy/tests/test_trial.py:30-35). */
  def canonicalJson(params: Map[String, HV]): String =
    params.toSeq.sortBy(_._1)
      .map { case (k, v) => HV.S(k).jsonRender + ": " + v.jsonRender }
      .mkString("{", ", ", "}")

  /** First 16 hex chars of md5 over the canonical JSON. */
  def trialIdFor(params: Map[String, HV]): String = {
    val md = MessageDigest.getInstance("MD5")
    md.digest(canonicalJson(params).getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 16)
  }

  def apply(params: Map[String, HV]): Trial = new Trial(params)
  def fromAny(params: Map[String, Any]): Trial = new Trial(params.map { case (k, v) => k -> HV(v) })
}
