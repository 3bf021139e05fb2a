package graft.exec

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}

import graft.core.HV
import org.apache.spark.BarrierTaskContext
import org.apache.spark.sql.SparkSession

/** Barrier-mode gang execution: every worker of one distributed job starts
  * together, rendezvouses, exchanges addresses, trains in lockstep, and
  * completes together.
  *
  * This is the Spark-native analog of the reference's reservation-based
  * all-up rendezvous for distributed training (reference: executor
  * registration + `await_reservations` barrier, maggy/core/rpc.py:282-305,
  * client poll :708-714; cluster init exchanging MASTER_ADDR/MASTER_PORT/
  * WORLD_SIZE/RANK env vars, maggy/core/executors/
  * torch_dist_executor.py:247-285). Where the reference hand-rolls the
  * barrier over its RPC channel, Spark ships the whole facility:
  * `RDD.barrier()` gang-schedules the stage (all tasks launch together or
  * none do — no partial-gang deadlock under slot shortage, the scheduler
  * fails fast instead), and `BarrierTaskContext.allGather` IS the
  * reservation barrier + address exchange in one call.
  *
  * The data path stays executor↔executor: [[GangContext.allReduceSum]] moves
  * values over raw TCP against the rendezvous'd master address, not through
  * the driver — mirroring the reference's boundary where NCCL traffic runs
  * outside the maggy RPC channel (SURVEY §3.3 boundary note). At 100 TB /
  * 1000 executors the coordinator only ever sees O(worldSize) small strings
  * per gather; gradients-sized payloads never touch it.
  *
  * Fault model: a barrier stage retries as a whole on task failure (Spark
  * semantics) — exactly the reference's all-or-nothing gang restart.
  */
object Gang {

  /** User-supplied distributed train function — one invocation per worker,
    * all workers concurrent. Must be Serializable: ships in the closure. */
  trait GangTrainFn extends Serializable {
    def apply(ctx: GangContext): Double
  }

  /** The env-var contract the reference exports before
    * `dist.init_process_group` (torch_dist_executor.py:126-134), as data. */
  final case class GangEnv(masterAddr: String, masterPort: Int, worldSize: Int, rank: Int) {
    def asMap: Map[String, String] = Map(
      "MASTER_ADDR" -> masterAddr,
      "MASTER_PORT" -> masterPort.toString,
      "WORLD_SIZE" -> worldSize.toString,
      "RANK" -> rank.toString)
  }

  /** One worker's TF cluster-spec task assignment. */
  final case class TfTask(taskType: String, index: Int)

  /** TF cluster role calc, mirroring the reference's TF_CONFIG construction
    * (reference: maggy/core/executors/tf_dist_executor.py:129-144): rank 0
    * is the chief; the LAST worker (highest rank, when the gang has one) is
    * demoted to the dedicated evaluator; the remaining ranks are workers
    * indexed from 0 in rank order. A MultiWorkerMirroredStrategy +
    * sidecar-evaluation user gets the same role table the reference
    * computes, without hand-rolling the demotion. */
  def tfRole(rank: Int, worldSize: Int): TfTask = {
    require(rank >= 0 && rank < worldSize, s"rank $rank outside world of $worldSize")
    if (rank == 0) TfTask("chief", 0)
    else if (rank == worldSize - 1) TfTask("evaluator", 0)
    else TfTask("worker", rank - 1)
  }

  /** Cluster half of TF_CONFIG from the rendezvous'd peer addresses — the
    * same demotion as [[tfRole]]: peers(0) chief, middle peers workers,
    * last peer the evaluator. A 1-gang is chief-only; a 2-gang is
    * chief + evaluator with an (explicit) empty worker list, exactly the
    * post-`del` shape the reference leaves behind. */
  def tfClusterSpec(peers: IndexedSeq[String]): Map[String, IndexedSeq[String]] =
    if (peers.size == 1) Map("chief" -> peers)
    else Map(
      "chief" -> IndexedSeq(peers.head),
      "worker" -> peers.slice(1, peers.size - 1),
      "evaluator" -> IndexedSeq(peers.last))

  /** What one gang worker sees: identity, the full rendezvous'd address
    * list, typed hyperparameters, and collective primitives. */
  final class GangContext private[exec] (
      val rank: Int,
      val worldSize: Int,
      val env: GangEnv,
      val peers: IndexedSeq[String],
      val params: Map[String, HV],
      tc: BarrierTaskContext,
      server: Option[ServerSocket]) {

    /** Global barrier — the `dist.barrier()` analog
      * (torch_dist_executor.py:175). */
    def barrier(): Unit = tc.barrier()

    /** This worker's TF cluster role (chief / worker / evaluator) —
      * see [[Gang.tfRole]]. */
    def tfTask: TfTask = tfRole(rank, worldSize)

    /** The TF_CONFIG env-var JSON for this worker, built from the
      * rendezvous'd peers and [[tfTask]] — what the reference exports via
      * `_setup_tf_config` (tf_dist_executor.py:146-148). Addresses are
      * host:port strings (no JSON metacharacters), so plain quoting is
      * sufficient. */
    def tfConfigJson: String = {
      def arr(xs: Seq[String]): String =
        xs.map(x => "\"" + x + "\"").mkString("[", ",", "]")
      val cluster = tfClusterSpec(peers)
      val c = Seq("chief", "worker", "evaluator").filter(cluster.contains)
        .map(k => "\"" + k + "\":" + arr(cluster(k))).mkString("{", ",", "}")
      s"""{"cluster":$c,"task":{"type":"${tfTask.taskType}","index":${tfTask.index}}}"""
    }

    /** Exchange one small string with every peer via the barrier
      * coordinator (control-plane metadata only — keep payloads tiny). */
    def allGather(msg: String): IndexedSeq[String] =
      tc.allGather(msg).toIndexedSeq

    /** Sum all-reduce over a TCP star on the rendezvous'd master address:
      * workers push their value to rank 0, rank 0 reduces and pushes the
      * total back. Data moves executor↔executor, outside the coordinator —
      * the reference's NCCL boundary. Multiple sequential calls are safe:
      * a worker only enters call k+1 after receiving call k's total, so the
      * master's worldSize-1 accepts per call can only be same-call peers. */
    def allReduceSum(value: Double): Double =
      if (worldSize == 1) value
      else if (rank == 0) {
        val ss = server.get
        val socks = scala.collection.mutable.ArrayBuffer.empty[Socket]
        try {
          // accept INSIDE the try: an accept timeout (a dead worker) must
          // still close the sockets already accepted this round
          (1 until worldSize).foreach(_ => socks += ss.accept())
          val total = value + socks.map { s =>
            new DataInputStream(s.getInputStream).readDouble()
          }.sum
          socks.foreach { s =>
            val out = new DataOutputStream(s.getOutputStream)
            out.writeDouble(total)
            out.flush()
          }
          total
        } finally socks.foreach(_.close())
      } else {
        val s = new Socket(env.masterAddr, env.masterPort)
        try {
          s.setTcpNoDelay(true)
          val out = new DataOutputStream(s.getOutputStream)
          out.writeDouble(value)
          out.flush()
          new DataInputStream(s.getInputStream).readDouble()
        } finally s.close()
      }
  }

  /** Per-worker outcome plus rendezvous timestamps (same-JVM nanoTime in
    * local mode; on a real cluster they are per-host and only ordering
    * within a host is meaningful). `gatherNs` happens-after EVERY worker's
    * `startNs` by allGather semantics — the all-up-start proof. */
  final case class GangWorkerResult(rank: Int, metric: Double, startNs: Long, gatherNs: Long)

  final case class GangResult(
      workers: IndexedSeq[GangWorkerResult],
      mean: Double,
      durationMs: Long)

  /** Run `fn` as a gang of `worldSize` barrier tasks. The driver averages
    * per-worker metrics (reference: torch_distributed_training_driver.py:
    * 49-70,130-143 averages worker results). */
  def run(
      spark: SparkSession,
      worldSize: Int,
      params: Map[String, HV],
      fn: GangTrainFn): GangResult = {
    require(worldSize >= 1, s"worldSize must be >= 1, got $worldSize")
    val t0 = System.currentTimeMillis()
    val collected = spark.sparkContext
      .parallelize(0 until worldSize, worldSize)
      .barrier()
      .mapPartitions { _ =>
        val tc = BarrierTaskContext.get()
        val rank = tc.partitionId()
        // rank 0 binds its all-reduce endpoint BEFORE the gather so every
        // peer that learns the address finds it listening (no connect race);
        // backlog sized to the world so a 1000-worker SYN burst isn't
        // dropped by the JDK default of 50
        val server =
          if (rank == 0) Some {
            val ss = new ServerSocket(0, math.max(50, worldSize))
            ss.setSoTimeout(120000)
            ss
          } else None
        try {
          // the executor's ADVERTISED host, not InetAddress.getLocalHost —
          // /etc/hosts commonly maps the hostname to 127.0.x.x, which would
          // make every remote peer dial itself. Spark already solved host
          // resolution for its own block transfers; reuse its answer.
          val host = org.apache.spark.SparkEnv.get.blockManager.blockManagerId.host
          val startNs = System.nanoTime()
          // THE rendezvous: publish address, block until all workers arrive
          val peers = tc
            .allGather(s"$host:${server.fold(0)(_.getLocalPort)}")
            .toIndexedSeq
          val gatherNs = System.nanoTime()
          // split on the LAST colon: IPv6 literals contain colons themselves
          val cut = peers.head.lastIndexOf(':')
          val env = GangEnv(peers.head.substring(0, cut),
            peers.head.substring(cut + 1).toInt, worldSize, rank)
          val ctx = new GangContext(rank, worldSize, env, peers, params, tc, server)
          val metric = fn(ctx)
          tc.barrier() // all-up completion before FINAL (dist.barrier analog)
          Iterator.single(GangWorkerResult(rank, metric, startNs, gatherNs))
        } finally server.foreach(_.close())
      }
      .collect()
      .sortBy(_.rank)
      .toIndexedSeq
    GangResult(collected,
      collected.map(_.metric).sum / collected.size,
      System.currentTimeMillis() - t0)
  }
}
