package graft

import org.apache.spark.sql.SparkSession

/** Session-master resolution for the driver-contract mains (Verify/Bench).
  *
  * `SPARK_GRAFT_MASTER` overrides the default `local[cpus]` — its primary
  * use is `local-cluster[n,cores,memMB]`, the multi-JVM master that runs
  * real executor processes (separate heaps, network shuffle, serialized
  * task dispatch) without a standalone cluster. That is the closest
  * single-machine approximation of the deployment shape: everything that
  * rides a broadcast, a shuffle, or an RPC actually crosses a process
  * boundary instead of a reference handoff inside one JVM.
  *
  * local-cluster workers launch executors from SPARK_HOME, so the graft
  * classes are NOT on their classpath by default — the driver's own
  * classpath (sbt's forked-JVM `-classpath`) is shipped via
  * `spark.executor.extraClassPath`.
  */
object MasterEnv {

  def master(cpus: String): String =
    sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")

  def isMultiJvm(m: String): Boolean = m.startsWith("local-cluster")

  /** Apply the resolved master (+ executor classpath for multi-JVM) to a
    * session builder. */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder = {
    val m = master(cpus)
    val withMaster = b.master(m)
    if (isMultiJvm(m))
      withMaster.config("spark.executor.extraClassPath", sys.props("java.class.path"))
    else withMaster
  }
}
