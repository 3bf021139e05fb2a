package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import TfRecordFormat._

/** DataSource V2 for TFRecord files of `tf.train.Example` records
  * (`spark.read.format("tfrecord")` / `df.write.format("tfrecord")`).
  *
  * Scale design:
  *   - one InputPartition per FILE — the TFRecord framing has no sync
  *     markers, so a file is not splittable; parallelism comes from the
  *     standard many-shards layout (which is how TFRecord datasets are laid
  *     out in practice, and why the reference shards by rank —
  *     /root/reference/maggy/core/patching/dataloader.py:124-130);
  *   - column pruning is pushed into the proto decoder: a pruned feature's
  *     bytes are skipped, never decoded (SupportsPushDownRequiredColumns);
  *   - reads stream record-at-a-time off the FileSystem input stream —
  *     memory is one record, not one file, so a 100 GB shard scans in
  *     constant space;
  *   - writes go through the normal DSv2 commit path: task files named by
  *     (queryId, partition, task) so speculative/retried attempts cannot
  *     collide, abort deletes its own file.
  *
  * Type mapping (Example features are untyped lists; schema drives both
  * directions): Int64List ↔ long/int/array<long>; FloatList ↔ float/double/
  * array<float>/array<double> (doubles pass through float32 — document, not
  * hide: TFRecord has no double type); BytesList ↔ string/binary/
  * array<string>/array<binary>. A feature absent from a record reads NULL.
  *
  * Options: `verifyCrc` (default true) — validate the per-record CRC32C;
  * `inferLimit` (default 100) — records sampled for schema inference;
  * `compression` (write; `gzip` or `none`, default none) — gzip'd shards
  * are named `*.tfrecord.gz` and decompress transparently on read.
  */
class TfRecordSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tfrecord"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TfRecordTable.infer(TfRecordTable.paths(options),
      options.getInt("inferLimit", 100), options.getBoolean("verifyCrc", true))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TfRecordTable(schema, new CaseInsensitiveStringMap(properties))
}

object TfRecordTable {
  private def hadoopConf: Configuration =
    SparkSession.active.sparkContext.hadoopConfiguration

  /** Expand the path option to concrete data files (glob → recursive dir
    * walk → files, hidden/underscore entries skipped — the parquet
    * convention; listing semantics shared with [[Datasets.listDataFiles]]). */
  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw = Option(options.get("path")).toSeq ++
      Option(options.get("paths")).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    require(raw.nonEmpty, "TFRecord source requires a path")
    val conf = hadoopConf
    raw.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
        .flatMap { st => // the root the user pointed at is never skipped
          if (st.isFile) Seq(st)
          else fs.listStatus(st.getPath).toSeq.flatMap(Datasets.listDataFiles(fs, _))
        }
    }.map(_.getPath.toString).sorted
  }

  /** Gzip-compressed shards (`*.tfrecord.gz` — the common feature-store
    * layout) decompress transparently on read; detection is by extension,
    * matching TensorFlow's own reader option semantics. A gzip stream is
    * not splittable, but TFRecord files are one-partition-per-file anyway. */
  private[sources] def maybeGunzip(file: String, raw: java.io.InputStream): java.io.InputStream =
    if (file.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw, 1 << 16) else raw

  /** Schema inference: sample the first records of the first file. A feature
    * whose list ever carries more than one value infers as an array; bytes
    * infer as string (the common Example usage; pass an explicit schema for
    * raw binary). Fields sort by name so inference is deterministic. */
  def infer(files: Seq[String], limit: Int, verifyCrc: Boolean): StructType = {
    require(files.nonEmpty, "cannot infer TFRecord schema: no input files")
    val conf = hadoopConf
    val path = new Path(files.head)
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      maybeGunzip(files.head, path.getFileSystem(conf).open(path)), 1 << 16))
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, (DataType, Boolean)]
    try {
      var n = 0
      var rec = readRecord(in, verifyCrc)
      while (n < limit && rec.isDefined) {
        parseExample(rec.get, _ => true).foreach { case (name, f) =>
          val (dt, many) = f match {
            case Int64Feature(vs) => (LongType: DataType, vs.length > 1)
            case FloatFeature(vs) => (FloatType: DataType, vs.length > 1)
            case BytesFeature(vs) => (StringType: DataType, vs.length > 1)
          }
          seen.get(name) match {
            case None => seen(name) = (dt, many)
            case Some((prev, prevMany)) =>
              require(prev == dt, s"TFRecord feature '$name' mixes $prev and $dt across records")
              seen(name) = (dt, prevMany || many)
          }
        }
        n += 1
        rec = if (n < limit) readRecord(in, verifyCrc) else None
      }
    } finally in.close()
    require(seen.nonEmpty, s"cannot infer TFRecord schema: ${files.head} has no records")
    StructType(seen.toSeq.sortBy(_._1).map { case (name, (dt, many)) =>
      StructField(name, if (many) ArrayType(dt, containsNull = false) else dt, nullable = true)
    })
  }
}

class TfRecordTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"tfrecord:${options.get("path")}"
  override def schema(): StructType = schema0
  private val schema0 = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder =
    new TfRecordScanBuilder(schema0, scanOptions)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TfRecordWriteBuilder(info)
}

final class TfRecordScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new TfRecordScan(required, options)
}

final class TfRecordScan(readSchema0: StructType, options: CaseInsensitiveStringMap)
    extends Scan with Batch {
  override def readSchema(): StructType = readSchema0
  override def toBatch: Batch = this
  override def description(): String =
    s"tfrecord ReadSchema: ${readSchema0.simpleString}"

  override def planInputPartitions(): Array[InputPartition] =
    TfRecordTable.paths(options).map(TfRecordInputPartition(_)).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new TfRecordReaderFactory(readSchema0,
      new SerializableConfiguration(SparkSession.active.sparkContext.hadoopConfiguration),
      options.getBoolean("verifyCrc", true))
}

final case class TfRecordInputPartition(file: String) extends InputPartition

final class TfRecordReaderFactory(schema: StructType,
    conf: SerializableConfiguration, verifyCrc: Boolean)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TfRecordPartitionReader(
      partition.asInstanceOf[TfRecordInputPartition].file, schema, conf.value, verifyCrc)
}

final class TfRecordPartitionReader(file: String, schema: StructType,
    conf: Configuration, verifyCrc: Boolean) extends PartitionReader[InternalRow] {
  private val path = new Path(file)
  private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
    TfRecordTable.maybeGunzip(file, path.getFileSystem(conf).open(path)), 1 << 16))
  private val wanted = schema.fieldNames.toSet
  private var current: InternalRow = _

  override def next(): Boolean = readRecord(in, verifyCrc) match {
    case Some(payload) =>
      val features = parseExample(payload, wanted)
      val row = new GenericInternalRow(schema.length)
      var i = 0
      while (i < schema.length) {
        row.update(i, features.get(schema(i).name).map(convert(_, schema(i))).orNull)
        i += 1
      }
      current = row
      true
    case None => false
  }

  private def convert(f: Feature, field: StructField): Any = (f, field.dataType) match {
    case (Int64Feature(vs), LongType) => if (vs.isEmpty) null else vs.head
    case (Int64Feature(vs), IntegerType) => if (vs.isEmpty) null else vs.head.toInt
    case (FloatFeature(vs), FloatType) => if (vs.isEmpty) null else vs.head
    case (FloatFeature(vs), DoubleType) => if (vs.isEmpty) null else vs.head.toDouble
    case (BytesFeature(vs), StringType) => if (vs.isEmpty) null else UTF8String.fromBytes(vs.head)
    case (BytesFeature(vs), BinaryType) => if (vs.isEmpty) null else vs.head
    case (Int64Feature(vs), ArrayType(LongType, _)) => new GenericArrayData(vs.toArray)
    case (Int64Feature(vs), ArrayType(IntegerType, _)) => new GenericArrayData(vs.map(_.toInt).toArray)
    case (FloatFeature(vs), ArrayType(FloatType, _)) => new GenericArrayData(vs.toArray)
    case (FloatFeature(vs), ArrayType(DoubleType, _)) => new GenericArrayData(vs.map(_.toDouble).toArray)
    case (BytesFeature(vs), ArrayType(StringType, _)) =>
      new GenericArrayData(vs.map(UTF8String.fromBytes).toArray[Any])
    case (BytesFeature(vs), ArrayType(BinaryType, _)) => new GenericArrayData(vs.toArray[Any])
    case (other, dt) => throw new java.io.IOException(
      s"TFRecord feature '${field.name}' is ${other.getClass.getSimpleName}, schema wants $dt")
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

// ---- write path -------------------------------------------------------------

final class TfRecordWriteBuilder(info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new TfRecordWrite(info, truncateFirst)
}

final class TfRecordWrite(info: LogicalWriteInfo, truncateFirst: Boolean) extends Write {
  override def toBatch: BatchWrite = {
    val dir = new Path(info.options.get("path"))
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(conf)
    // overwrite: clear prior contents up-front on the driver (before any
    // task runs), mirroring the v1 InsertIntoHadoopFsRelation truncate
    if (truncateFirst && fs.exists(dir))
      fs.listStatus(dir).foreach(st => fs.delete(st.getPath, true))
    fs.mkdirs(dir)
    val gzip = "gzip".equalsIgnoreCase(info.options.getOrDefault("compression", "none"))
    new TfRecordBatchWrite(dir.toString, info.queryId(), info.schema(),
      new SerializableConfiguration(conf), gzip)
  }
}

final class TfRecordBatchWrite(dir: String, queryId: String, schema: StructType,
    conf: SerializableConfiguration, gzip: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new TfRecordWriterFactory(dir, queryId, schema, conf, gzip)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class TfRecordCommit(file: String) extends WriterCommitMessage

final class TfRecordWriterFactory(dir: String, queryId: String, schema: StructType,
    conf: SerializableConfiguration, gzip: Boolean) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TfRecordDataWriter(
      new Path(dir,
        f"part-$partitionId%05d-$taskId-$queryId.tfrecord" + (if (gzip) ".gz" else "")),
      schema, conf.value, gzip)
}

final class TfRecordDataWriter(file: Path, schema: StructType, conf: Configuration,
    gzip: Boolean) extends DataWriter[InternalRow] {
  private val fs = file.getFileSystem(conf)
  private val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
    if (gzip) new java.util.zip.GZIPOutputStream(fs.create(file, true), 1 << 16)
    else fs.create(file, true), 1 << 16))

  override def write(row: InternalRow): Unit = {
    val features = schema.fields.iterator.zipWithIndex.flatMap { case (field, i) =>
      if (row.isNullAt(i)) None // absent feature encodes a SQL NULL
      else Some(field.name -> toFeature(row, i, field.dataType))
    }.toSeq
    writeRecord(out, encodeExample(features))
  }

  private def toFeature(row: InternalRow, i: Int, dt: DataType): Feature = dt match {
    case LongType => Int64Feature(IndexedSeq(row.getLong(i)))
    case IntegerType => Int64Feature(IndexedSeq(row.getInt(i).toLong))
    case FloatType => FloatFeature(IndexedSeq(row.getFloat(i)))
    case DoubleType => FloatFeature(IndexedSeq(row.getDouble(i).toFloat))
    case StringType => BytesFeature(IndexedSeq(row.getUTF8String(i).getBytes))
    case BinaryType => BytesFeature(IndexedSeq(row.getBinary(i)))
    case ArrayType(elem, _) =>
      val arr = row.getArray(i)
      elem match {
        case LongType => Int64Feature(arr.toLongArray.toIndexedSeq)
        case IntegerType => Int64Feature(arr.toIntArray.map(_.toLong).toIndexedSeq)
        case FloatType => FloatFeature(arr.toFloatArray.toIndexedSeq)
        case DoubleType => FloatFeature(arr.toDoubleArray.map(_.toFloat).toIndexedSeq)
        case StringType => BytesFeature(
          (0 until arr.numElements()).map(j => arr.getUTF8String(j).getBytes))
        case BinaryType => BytesFeature(
          (0 until arr.numElements()).map(j => arr.getBinary(j)))
        case other => throw new UnsupportedOperationException(
          s"TFRecord write: unsupported array element type $other")
      }
    case other => throw new UnsupportedOperationException(
      s"TFRecord write: unsupported type $other (Example has int64/float/bytes lists only)")
  }

  override def commit(): WriterCommitMessage = { out.close(); TfRecordCommit(file.toString) }
  override def abort(): Unit = { out.close(); fs.delete(file, false) }
  override def close(): Unit = ()
}
