package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dataset-layout plumbing for training-data directories.
  *
  * The reference's data loader auto-detects a Petastorm dataset by the
  * presence of the `_common_metadata` summary file and then shards rows by
  * (rank, world-size) so each worker reads a disjoint slice (reference:
  * maggy/core/patching/dataloader.py:99-137; detection :116-122, sharding
  * `cur_shard=RANK, shard_count=WORLD_SIZE` :124-130).
  *
  * Spark-native mapping: both Petastorm and plain Parquet directories are
  * Parquet to `spark.read.parquet` (underscore summary files are ignored by
  * the reader), so "detection" only informs layout-aware tooling; sharding
  * becomes a FILE-level slice — worker `rank` opens only every
  * `worldSize`-th data file, so a shard scan prunes at the file listing and
  * never touches the other shards' bytes (the same property the reference
  * gets from Petastorm's row-group sharding).
  */
object Datasets {

  /** True when `dir` carries Petastorm's `_common_metadata` marker
    * (reference: dataloader.py:116-122 switches loader class on exactly
    * this check). */
  def isPetastorm(spark: SparkSession, dir: String): Boolean = {
    val path = new Path(dir, "_common_metadata")
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  /** Recursively list the data files under `status` (summary/hidden files
    * and directories — `_`/`.`-prefixed — excluded). Shared by the shard
    * reader and the TFRecord source so listing semantics can't diverge. */
  private[sources] def listDataFiles(fs: FileSystem, status: FileStatus): Seq[FileStatus] = {
    val name = status.getPath.getName
    if (name.startsWith("_") || name.startsWith(".")) Seq.empty
    else if (status.isFile) Seq(status)
    else fs.listStatus(status.getPath).toSeq.flatMap(listDataFiles(fs, _))
  }

  /** The sorted data files of a parquet/petastorm directory, recursing into
    * partition subdirectories (a `partitionBy` layout is directories all the
    * way down — a flat listing would shard it to zero files). Sorted so the
    * rank→files assignment is deterministic across listings. */
  def dataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).toSeq
      .flatMap(listDataFiles(fs, _))
      .map(_.getPath.toString)
      .sorted
  }

  /** Rank's slice of a sorted file list: `fileIndex % worldSize == rank`.
    * Pure — usable executor-side inside a gang task (where launching Spark
    * jobs is off-limits), with the listing shipped from the driver. */
  def shardFiles(files: Seq[String], rank: Int, worldSize: Int): Seq[String] = {
    require(worldSize >= 1 && rank >= 0 && rank < worldSize,
      s"rank $rank outside [0, $worldSize)")
    files.zipWithIndex.collect { case (f, i) if i % worldSize == rank => f }
  }

  /** Worker `rank`'s shard of the dataset: data files where
    * `fileIndex % worldSize == rank`. Shards are disjoint and cover the
    * directory; only the shard's files are ever opened. */
  def readShard(spark: SparkSession, dir: String, rank: Int, worldSize: Int): DataFrame = {
    val mine = shardFiles(dataFiles(spark, dir), rank, worldSize)
    // basePath keeps partition-directory columns (cell=…/) in the schema
    // when reading an explicit leaf-file list from a partitionBy layout
    if (mine.isEmpty) spark.read.option("basePath", dir).parquet(dir).limit(0)
    else spark.read.option("basePath", dir).parquet(mine: _*)
  }
}
