package graft.data

import org.apache.spark.sql.DataFrame

/** Shared cache/checkpoint lifecycle helpers for DataFrames.
  *
  * One place owns the internal-API touchpoint: localCheckpoint'ed frames
  * analyze to a `LogicalRDD`, and their blocks live on the underlying RDD
  * rather than in the SQL cache manager, so releasing them needs
  * `rdd.unpersist` while plain `persist`ed frames release through
  * `Dataset.unpersist`. Every call site funnels through [[release]] so a
  * Spark upgrade that moves `LogicalRDD` breaks exactly one line.
  */
object Frames {

  /** Release a cached OR localCheckpoint'ed DataFrame (see object doc). */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
    case _ => df.unpersist(blocking = false)
  }

  /** Materialize `result` to its own storage (localCheckpoint: small output
    * blocks, lineage truncated) so the large upstream caches backing it can
    * be released immediately. The checkpointed result is the operator's
    * OUTPUT — orders of magnitude smaller than the intermediates it frees.
    */
  def materializeAndRelease(result: DataFrame, caches: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(eager = true)
    caches.foreach(release)
    out
  }

  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Eagerly localCheckpoint `df` and register the result for deferred
    * release — for intermediates a RETURNED lazy plan still reads (so they
    * cannot be released inside the operator). Verify/Bench/specs call
    * [[releaseTracked]] at end of run, next to Dedup.releaseCaches. */
  def trackedCheckpoint(df: DataFrame): DataFrame = {
    // checkpoint OUTSIDE the lock: it is an eager Spark job (GB-scale at
    // sf10) and holding the monitor for its duration would serialize any
    // concurrent caller; only the registration needs mutual exclusion
    val out = df.localCheckpoint(eager = true)
    synchronized { tracked += out }
    out
  }

  /** Release every frame registered by [[trackedCheckpoint]]. */
  def releaseTracked(): Unit = synchronized {
    tracked.foreach(release)
    tracked.clear()
  }
}
