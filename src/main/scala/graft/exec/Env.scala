package graft.exec

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets

/** Environment abstraction (reference: maggy/core/environment/base.py:25-223
  * — Base/Hopsworks/Databricks envs expose fs ops + executor discovery).
  * All file ops route through the Hadoop FileSystem API, so the same code
  * works on local paths, HDFS, or object stores — the path's scheme picks
  * the implementation, which is exactly how the engine's artifacts
  * (result.json, trial logs) stay portable to a real cluster.
  */
object Env {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  def mkdirs(spark: SparkSession, path: String): Boolean =
    fs(spark, path).mkdirs(new Path(path))

  def ls(spark: SparkSession, path: String): Seq[String] =
    fs(spark, path).listStatus(new Path(path)).toSeq.map(_.getPath.toUri.getPath)

  def delete(spark: SparkSession, path: String): Boolean =
    fs(spark, path).delete(new Path(path), true)

  /** Write a small artifact (overwrite). Reference: env.dump,
    * base.py dump/open used for result/trial JSON. */
  def dump(spark: SparkSession, path: String, content: String): Unit = {
    val out = fs(spark, path).create(new Path(path), true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a small artifact fully. */
  def open(spark: SparkSession, path: String): String = {
    val in = fs(spark, path).open(new Path(path))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Executor-slot discovery (reference: base.py:181-203 — explicit
    * spark.executor.instances, then dynamicAllocation.maxExecutors, then
    * local-mode parallelism). */
  def numExecutorSlots(spark: SparkSession): Int = {
    val conf = spark.sparkContext.getConf
    conf.getOption("spark.executor.instances").map(_.toInt)
      .orElse(
        if (conf.getBoolean("spark.dynamicAllocation.enabled", defaultValue = false))
          conf.getOption("spark.dynamicAllocation.maxExecutors").map(_.toInt)
        else None)
      .getOrElse(spark.sparkContext.defaultParallelism)
  }
}
