package graft.core

/** Experiment configs (reference: the maggy/config package). Sealed hierarchy
  * replaces the reference's singledispatch on config class
  * (maggy/experiment/experiment_pyspark.py:82-146). */
sealed trait LagomConfig {
  def name: String
  def hbIntervalMs: Long
  /** Experiment persistence root: when set, the driver writes
    * `<logDir>/result.json` and per-trial logs under `<logDir>/trials/`
    * (reference: maggy's result.json, optimization_driver.py:248-252, and
    * per-trial log dirs, trial_executor.py:137-142). */
  def logDir: Option[String]
}

/** Optimization direction (reference: 'min'/'max' strings). */
object Direction extends Enumeration { val Min, Max = Value }

final case class HyperparameterOptConfig(
    numTrials: Int,
    optimizer: String, // randomsearch | gridsearch | asha | tpe | gp | none
    searchspace: Searchspace,
    direction: Direction.Value = Direction.Max,
    optimizationKey: String = "metric",
    esPolicy: String = "median", // median | none
    esIntervalSteps: Long = 1, // check cadence in steps (reference es_interval=1)
    esMin: Int = 10, // min finalized trials before early stop kicks in
    name: String = "hpo",
    hbIntervalMs: Long = 200,
    seed: Long = 42L,
    optimizerArgs: Map[String, Double] = Map.empty,
    logDir: Option[String] = None,
    // live per-trial log relay: called on the driver as each executor
    // train-fn log line arrives over the heartbeat channel; None = print
    // to the driver console under a trial prefix (DriverServer.consoleSink).
    // Called concurrently from one handler thread per executor — the sink
    // must be thread-safe; exceptions it throws are caught and logged.
    logSink: Option[(String, String) => Unit] = None) extends LagomConfig

final case class AblationConfig(
    study: graft.ablate.AblationStudy,
    ablator: String = "loco",
    name: String = "ablation",
    hbIntervalMs: Long = 200,
    logDir: Option[String] = None) extends LagomConfig

/** Plain parallel runs with no search (reference: maggy/optimizer/singlerun.py). */
final case class SingleRunConfig(
    numTrials: Int,
    name: String = "single",
    hbIntervalMs: Long = 200,
    logDir: Option[String] = None) extends LagomConfig

/** Distributed gang-training experiment (reference: TorchDistributedConfig,
  * maggy/config/torch_distributed.py). Not part of the [[LagomConfig]]
  * dispatch: the gang train fn sees collective context (rank/world/peers),
  * not a per-trial context, so it gets its own typed entry point
  * ([[graft.api.Graft.gang]]). */
final case class DistributedConfig(
    worldSize: Int,
    params: Map[String, HV] = Map.empty,
    name: String = "distributed",
    logDir: Option[String] = None)
