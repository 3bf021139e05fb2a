package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException, IOException}

/** TFRecord wire format + minimal `tf.train.Example` protobuf codec.
  *
  * Everything here is public knowledge: the TFRecord framing
  * (8-byte little-endian length, masked CRC32C of the length bytes, payload,
  * masked CRC32C of the payload — TensorFlow `io/record_writer.cc`) and the
  * Example message shape (`tensorflow/core/example/example.proto` /
  * `feature.proto`):
  *
  * {{{
  * message Example  { Features features = 1; }
  * message Features { map<string, Feature> feature = 1; }
  * message Feature  { oneof kind { BytesList bytes_list = 1;
  *                                 FloatList float_list = 2;
  *                                 Int64List int64_list = 3; } }
  * message BytesList { repeated bytes value = 1; }
  * message FloatList { repeated float value = 1 [packed = true]; }
  * message Int64List { repeated int64 value = 1 [packed = true]; }
  * }}}
  *
  * The proto codec is hand-rolled for exactly this fixed schema (varint +
  * length-delimited fields only) so the engine has zero dependencies beyond
  * the JDK — `java.util.zip.CRC32C` supplies the Castagnoli polynomial.
  *
  * Reference intent: the one external dataset format a maggy user feeds the
  * ablation path (/root/reference/maggy/ablation/ablator/loco.py:53-74).
  */
object TfRecordFormat {

  /** Decoded feature value — mirrors the proto oneof. */
  sealed trait Feature
  final case class BytesFeature(values: IndexedSeq[Array[Byte]]) extends Feature
  final case class FloatFeature(values: IndexedSeq[Float]) extends Feature
  final case class Int64Feature(values: IndexedSeq[Long]) extends Feature

  /** Records above this are treated as corruption, not data: fail loudly
    * instead of allocating an absurd buffer off a garbled length word. */
  val MaxRecordBytes: Int = 256 << 20

  // ---- framing --------------------------------------------------------------

  /** TensorFlow's CRC mask: rotate right 15, add a constant (uint32 wrap). */
  private def mask(crc: Int): Int = ((crc >>> 15) | (crc << 17)) + 0xa282ead8

  private def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    mask(c.getValue.toInt)
  }

  private def putLongLE(v: Long): Array[Byte] =
    Array.tabulate[Byte](8)(i => ((v >>> (8 * i)) & 0xff).toByte)

  private def getLongLE(b: Array[Byte]): Long =
    (0 until 8).map(i => (b(i) & 0xffL) << (8 * i)).reduce(_ | _)

  private def getIntLE(b: Array[Byte]): Int =
    (0 until 4).map(i => (b(i) & 0xff) << (8 * i)).reduce(_ | _)

  private def putIntLE(v: Int): Array[Byte] =
    Array.tabulate[Byte](4)(i => ((v >>> (8 * i)) & 0xff).toByte)

  /** Append one framed record. */
  def writeRecord(out: DataOutputStream, payload: Array[Byte]): Unit = {
    val len = putLongLE(payload.length.toLong)
    out.write(len)
    out.write(putIntLE(maskedCrc(len, 0, 8)))
    out.write(payload)
    out.write(putIntLE(maskedCrc(payload, 0, payload.length)))
  }

  /** Read the next framed record, `None` at a clean end-of-stream. Corrupt
    * length/CRC raises IOException — a torn file must not silently truncate
    * a dataset. `verifyCrc=false` skips checksum validation (scan-speed
    * escape hatch; framing errors still throw). */
  def readRecord(in: DataInputStream, verifyCrc: Boolean = true): Option[Array[Byte]] = {
    val lenBytes = new Array[Byte](8)
    val first = in.read(lenBytes, 0, 1)
    if (first < 0) return None // clean EOF at a record boundary
    try in.readFully(lenBytes, 1, 7)
    catch { case _: EOFException => throw new IOException("truncated TFRecord length") }
    val crcBytes = new Array[Byte](4)
    in.readFully(crcBytes)
    if (verifyCrc && getIntLE(crcBytes) != maskedCrc(lenBytes, 0, 8))
      throw new IOException("TFRecord length CRC mismatch")
    val len = getLongLE(lenBytes)
    if (len < 0 || len > MaxRecordBytes)
      throw new IOException(s"TFRecord length $len outside [0, $MaxRecordBytes] — corrupt stream")
    val payload = new Array[Byte](len.toInt)
    try in.readFully(payload)
    catch { case _: EOFException => throw new IOException("truncated TFRecord payload") }
    in.readFully(crcBytes)
    if (verifyCrc && getIntLE(crcBytes) != maskedCrc(payload, 0, payload.length))
      throw new IOException("TFRecord data CRC mismatch")
    Some(payload)
  }

  // ---- protobuf primitives --------------------------------------------------

  private final class Cursor(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var out = 0L
      while (shift < 64) {
        if (pos >= end) throw new IOException("truncated varint in Example proto")
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      throw new IOException("varint over 64 bits in Example proto")
    }
    def sub(len: Int): Cursor = {
      if (len < 0 || pos + len > end) throw new IOException("truncated field in Example proto")
      val c = new Cursor(buf, pos, pos + len)
      pos += len
      c
    }
    def bytes(len: Int): Array[Byte] = {
      if (len < 0 || pos + len > end) throw new IOException("truncated bytes in Example proto")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      out
    }
    def fixed32(): Int = {
      if (pos + 4 > end) throw new IOException("truncated fixed32 in Example proto")
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }
    /** Skip one field of the given wire type (forward compatibility: ignore
      * fields newer writers may add). */
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val len = varint().toInt; sub(len)
      case 5 => pos += 4
      case w => throw new IOException(s"unsupported proto wire type $w")
    }
  }

  // ---- Example decode -------------------------------------------------------

  /** Parse a serialized Example into (feature name → value). `wanted` gates
    * decoding per feature: pruned columns skip value decode entirely (the
    * column-pruning payoff — the map entry is skipped, its bytes never
    * materialize). */
  def parseExample(payload: Array[Byte], wanted: String => Boolean): Map[String, Feature] = {
    val out = Map.newBuilder[String, Feature]
    val ex = new Cursor(payload, 0, payload.length)
    while (ex.hasMore) {
      val tag = ex.varint()
      if ((tag >>> 3) == 1 && (tag & 7) == 2) { // features
        val features = ex.sub(ex.varint().toInt)
        while (features.hasMore) {
          val ftag = features.varint()
          if ((ftag >>> 3) == 1 && (ftag & 7) == 2) { // map entry
            val entry = features.sub(features.varint().toInt)
            var key: String = null
            var value: Feature = null
            while (entry.hasMore) {
              val etag = entry.varint()
              (etag >>> 3, etag & 7) match {
                case (1, 2) =>
                  key = new String(entry.bytes(entry.varint().toInt),
                    java.nio.charset.StandardCharsets.UTF_8)
                case (2, 2) =>
                  val len = entry.varint().toInt
                  // key always precedes value in writer output (map entries
                  // serialize key=1 then value=2); if an exotic writer
                  // reorders, decode unconditionally — correctness first
                  if (key == null || wanted(key)) value = parseFeature(entry.sub(len))
                  else entry.sub(len)
                case (_, w) => entry.skip(w.toInt)
              }
            }
            if (key != null && value != null) out += key -> value
          } else features.skip((ftag & 7).toInt)
        }
      } else ex.skip((tag & 7).toInt)
    }
    out.result()
  }

  private def parseFeature(c: Cursor): Feature = {
    var result: Feature = null
    while (c.hasMore) {
      val tag = c.varint()
      (tag >>> 3, tag & 7) match {
        case (1, 2) => // BytesList
          val list = c.sub(c.varint().toInt)
          val vs = IndexedSeq.newBuilder[Array[Byte]]
          while (list.hasMore) {
            val t = list.varint()
            if ((t >>> 3) == 1 && (t & 7) == 2) vs += list.bytes(list.varint().toInt)
            else list.skip((t & 7).toInt)
          }
          result = BytesFeature(vs.result())
        case (2, 2) => // FloatList: packed (len-delimited) or unpacked fixed32
          val list = c.sub(c.varint().toInt)
          val vs = IndexedSeq.newBuilder[Float]
          while (list.hasMore) {
            val t = list.varint()
            (t >>> 3, t & 7) match {
              case (1, 2) =>
                val packed = list.sub(list.varint().toInt)
                while (packed.hasMore) vs += java.lang.Float.intBitsToFloat(packed.fixed32())
              case (1, 5) => vs += java.lang.Float.intBitsToFloat(list.fixed32())
              case (_, w) => list.skip(w.toInt)
            }
          }
          result = FloatFeature(vs.result())
        case (3, 2) => // Int64List: packed or unpacked varints
          val list = c.sub(c.varint().toInt)
          val vs = IndexedSeq.newBuilder[Long]
          while (list.hasMore) {
            val t = list.varint()
            (t >>> 3, t & 7) match {
              case (1, 2) =>
                val packed = list.sub(list.varint().toInt)
                while (packed.hasMore) vs += packed.varint()
              case (1, 0) => vs += list.varint()
              case (_, w) => list.skip(w.toInt)
            }
          }
          result = Int64Feature(vs.result())
        case (_, w) => c.skip(w.toInt)
      }
    }
    if (result == null) throw new IOException("Feature with no kind in Example proto")
    result
  }

  // ---- Example encode -------------------------------------------------------

  private def varintBytes(v: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(10)
    var x = v
    while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt)
    out.toByteArray
  }

  private def lenDelimited(field: Int, body: Array[Byte]): Array[Byte] = {
    val tag = varintBytes(((field << 3) | 2).toLong)
    val len = varintBytes(body.length.toLong)
    val out = new Array[Byte](tag.length + len.length + body.length)
    System.arraycopy(tag, 0, out, 0, tag.length)
    System.arraycopy(len, 0, out, tag.length, len.length)
    System.arraycopy(body, 0, out, tag.length + len.length, body.length)
    out
  }

  private def encodeFeature(f: Feature): Array[Byte] = f match {
    case BytesFeature(vs) =>
      val list = new java.io.ByteArrayOutputStream()
      vs.foreach { b => val d = lenDelimited(1, b); list.write(d, 0, d.length) }
      lenDelimited(1, list.toByteArray)
    case FloatFeature(vs) => // packed
      val packed = new Array[Byte](vs.length * 4)
      var i = 0
      vs.foreach { v =>
        val bits = java.lang.Float.floatToIntBits(v)
        packed(i) = (bits & 0xff).toByte
        packed(i + 1) = ((bits >>> 8) & 0xff).toByte
        packed(i + 2) = ((bits >>> 16) & 0xff).toByte
        packed(i + 3) = ((bits >>> 24) & 0xff).toByte
        i += 4
      }
      lenDelimited(2, lenDelimited(1, packed))
    case Int64Feature(vs) => // packed
      val packed = new java.io.ByteArrayOutputStream(vs.length * 2)
      vs.foreach { v => val d = varintBytes(v); packed.write(d, 0, d.length) }
      lenDelimited(3, lenDelimited(1, packed.toByteArray))
  }

  /** Serialize (name → value) pairs as one Example payload. */
  def encodeExample(features: Seq[(String, Feature)]): Array[Byte] = {
    val fs = new java.io.ByteArrayOutputStream()
    features.foreach { case (name, f) =>
      val key = lenDelimited(1, name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val value = lenDelimited(2, encodeFeature(f))
      val entry = new Array[Byte](key.length + value.length)
      System.arraycopy(key, 0, entry, 0, key.length)
      System.arraycopy(value, 0, entry, key.length, value.length)
      val d = lenDelimited(1, entry)
      fs.write(d, 0, d.length)
    }
    lenDelimited(1, fs.toByteArray)
  }
}
