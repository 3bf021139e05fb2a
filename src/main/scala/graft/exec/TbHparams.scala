package graft.exec

import graft.core.{HParam, HV, Searchspace}

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** TensorBoard hparams-plugin wire format, hand-encoded (reference:
  * maggy/tensorboard.py:47-107 writes it through tf.summary +
  * tensorboard.plugins.hparams.api; this engine has no TF dependency, so the
  * PUBLIC protobuf schemas are encoded directly):
  *
  *   - a tfevents file is a TFRecord stream (the same masked-crc framing
  *     [[graft.sources.TfRecordFormat]] implements) of `Event` messages
  *     (tensorflow/core/util/event.proto);
  *   - the EXPERIMENT-level file carries tag `_hparams_/experiment`
  *     declaring the search-space domains + metric descriptors
  *     (tensorboard/plugins/hparams/api.proto `Experiment`);
  *   - each SESSION (= trial) directory carries
  *     `_hparams_/session_start_info` (the trial's hparam values),
  *     a scalar summary for the final metric, and
  *     `_hparams_/session_end_info` (status) — the three records
  *     `hp.hparams_config` / `tf.summary.scalar` / `hp.hparams` produce.
  *
  * Pointing TensorBoard at `logDir` renders the HParams table exactly as it
  * does for the reference. [[readEvents]] is the verification-side decoder
  * the unit test (and a doubting user) can inspect files with.
  */
object TbHparams {

  val PluginName = "hparams"
  val ExperimentTag = "_hparams_/experiment"
  val SessionStartTag = "_hparams_/session_start_info"
  val SessionEndTag = "_hparams_/session_end_info"

  // ---- minimal protobuf wire encoder --------------------------------------
  private object Pb {
    def varint(v: Long): Array[Byte] = {
      val out = new ByteArrayOutputStream(10)
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
      out.toByteArray
    }
    private def key(field: Int, wire: Int): Array[Byte] = varint((field.toLong << 3) | wire)
    def vint(field: Int, v: Long): Array[Byte] = key(field, 0) ++ varint(v)
    def dbl(field: Int, v: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToRawLongBits(v)
      key(field, 1) ++ (0 until 8).map(i => ((bits >>> (8 * i)) & 0xff).toByte)
    }
    def flt(field: Int, v: Float): Array[Byte] = {
      val bits = java.lang.Float.floatToRawIntBits(v)
      key(field, 5) ++ (0 until 4).map(i => ((bits >>> (8 * i)) & 0xff).toByte)
    }
    def bytes(field: Int, b: Array[Byte]): Array[Byte] = key(field, 2) ++ varint(b.length) ++ b
    def str(field: Int, s: String): Array[Byte] = bytes(field, s.getBytes(UTF_8))
    def concat(parts: Array[Byte]*): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      parts.foreach(out.write)
      out.toByteArray
    }
  }
  import Pb._

  // google.protobuf.Value (struct.proto): number_value=2, string_value=3
  private def pbNumber(v: Double): Array[Byte] = dbl(2, v)
  private def pbString(s: String): Array[Byte] = str(3, s)

  // api.proto HParamInfo: name=1, type=4, domain_interval=5, domain_discrete=6
  // DataType: STRING=1, FLOAT64=3; Interval: min_value=1, max_value=2
  // ListValue: values=1 (repeated google.protobuf.Value)
  private def hparamInfo(p: HParam): Array[Byte] = p match {
    case HParam.DoubleParam(n, lo, hi) =>
      concat(str(1, n), vint(4, 3), bytes(5, concat(dbl(1, lo), dbl(2, hi))))
    case HParam.IntParam(n, lo, hi) =>
      // reference maps INTEGER via hp.IntInterval, which the plugin stores
      // as a FLOAT64 interval (tensorboard.py:60-66)
      concat(str(1, n), vint(4, 3), bytes(5, concat(dbl(1, lo.toDouble), dbl(2, hi.toDouble))))
    case HParam.DiscreteParam(n, vs) =>
      concat(str(1, n), vint(4, 3),
        bytes(6, concat(vs.map(v => bytes(1, pbNumber(v))): _*)))
    case HParam.CategoricalParam(n, vs) =>
      concat(str(1, n), vint(4, 1),
        bytes(6, concat(vs.map(v => bytes(1, pbString(v))): _*)))
  }

  // api.proto MetricInfo{name=1 MetricName{group=1, tag=2}, display_name=3}
  private def metricInfo(tag: String, displayName: String): Array[Byte] =
    concat(bytes(1, str(2, tag)), str(3, displayName))

  // plugin_data.proto HParamsPluginData: version=1 (0 = omitted, proto3
  // default), experiment=2, session_start_info=3, session_end_info=4
  private def pluginData(oneofField: Int, body: Array[Byte]): Array[Byte] =
    bytes(oneofField, body)

  // Summary.Value{tag=1, simple_value=2, metadata=9}; SummaryMetadata
  // {plugin_data=1 PluginData{plugin_name=1, content=2}}
  private def summaryValue(tag: String, content: Array[Byte]): Array[Byte] =
    concat(str(1, tag),
      bytes(9, bytes(1, concat(str(1, PluginName), bytes(2, content)))))

  private def scalarValue(tag: String, v: Float): Array[Byte] =
    concat(str(1, tag), flt(2, v))

  // Event{wall_time=1, step=2, file_version=3, summary=5}
  private def event(wallTimeSecs: Double, step: Long, parts: Array[Byte]): Array[Byte] =
    concat(dbl(1, wallTimeSecs), if (step != 0) vint(2, step) else Array.emptyByteArray, parts)

  private def writeEventsFile(path: java.nio.file.Path, events: Seq[Array[Byte]]): Unit = {
    java.nio.file.Files.createDirectories(path.getParent)
    val out = new DataOutputStream(new FileOutputStream(path.toFile))
    try {
      val now = System.currentTimeMillis() / 1000.0
      // readers expect a leading file_version event ("brain.Event:2")
      graft.sources.TfRecordFormat.writeRecord(out, event(now, 0, str(3, "brain.Event:2")))
      events.foreach(e => graft.sources.TfRecordFormat.writeRecord(out, e))
    } finally out.close()
  }

  private def eventsFileName: String =
    s"events.out.tfevents.${System.currentTimeMillis() / 1000}.graft"

  /** Experiment-level summary: search-space domains + the driving metric
    * descriptor, under `<logDir>/events.out.tfevents.*` (the
    * `hp.hparams_config` record, reference tensorboard.py:76-103). */
  def writeExperiment(logDir: String, space: Searchspace,
      metricTag: String = "metric", metricDisplay: String = "objective"): Unit = {
    val now = System.currentTimeMillis() / 1000.0
    // Experiment{time_created_secs=3, hparam_infos=4, metric_infos=5}
    val experiment = concat(
      dbl(3, now) +:
        space.params.map(p => bytes(4, hparamInfo(p))) :+
        bytes(5, metricInfo(metricTag, metricDisplay)): _*)
    val summary = bytes(5, bytes(1,
      summaryValue(ExperimentTag, pluginData(2, experiment))))
    writeEventsFile(
      java.nio.file.Paths.get(logDir, eventsFileName),
      Seq(event(now, 0, summary)))
  }

  /** One session (= trial) under `<logDir>/trials/<trialId>/`: start info
    * with the trial's hparam values, the final metric as a scalar summary,
    * and SUCCESS end info (the `hp.hparams` + `tf.summary.scalar` records,
    * reference tensorboard.py:105-107). */
  def writeSession(logDir: String, trialId: String, hparams: Map[String, HV],
      metric: Option[Double], metricTag: String = "metric"): Unit = {
    val now = System.currentTimeMillis() / 1000.0
    // SessionStartInfo{hparams=1 map<string,Value>, group_name=4,
    // start_time_secs=5}; map entry = {key=1, value=2}
    val start = concat(
      hparams.toSeq.sortBy(_._1).map { case (k, hv) =>
        val v = hv match {
          case HV.D(d) => pbNumber(d)
          case HV.L(l) => pbNumber(l.toDouble)
          case HV.S(s) => pbString(s)
        }
        bytes(1, concat(str(1, k), bytes(2, v)))
      } :+ str(4, trialId) :+ dbl(5, now): _*)
    val startSummary = bytes(5, bytes(1,
      summaryValue(SessionStartTag, pluginData(3, start))))
    // SessionEndInfo{status=1 (SUCCESS=1), end_time_secs=2}
    val end = concat(vint(1, 1), dbl(2, now))
    val endSummary = bytes(5, bytes(1,
      summaryValue(SessionEndTag, pluginData(4, end))))
    val metricSummary = metric.map(m =>
      event(now, 1, bytes(5, bytes(1, scalarValue(metricTag, m.toFloat)))))
    writeEventsFile(
      java.nio.file.Paths.get(logDir, "trials", trialId, eventsFileName),
      Seq(event(now, 0, startSummary)) ++ metricSummary :+ event(now, 0, endSummary))
  }

  // ---- verification-side decoder ------------------------------------------

  /** One decoded record of a tfevents file — whichever of the three shapes
    * the record carries. */
  final case class TbRecord(
      fileVersion: Option[String],
      tag: Option[String],
      pluginName: Option[String],
      pluginContent: Option[Array[Byte]],
      simpleValue: Option[Float])

  private final class Cur(val b: Array[Byte], var p: Int, val end: Int) {
    def hasMore: Boolean = p < end
    def varint(): Long = {
      var shift = 0; var acc = 0L; var more = true
      while (more) {
        val x = b(p) & 0xff; p += 1
        acc |= (x & 0x7fL) << shift; shift += 7; more = (x & 0x80) != 0
      }
      acc
    }
    def sub(): Cur = { val len = varint().toInt; val c = new Cur(b, p, p + len); p += len; c }
    def bytesOut(): Array[Byte] = { val len = varint().toInt; val out = java.util.Arrays.copyOfRange(b, p, p + len); p += len; out }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => p += 8
      case 2 => p += varint().toInt
      case 5 => p += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
  }

  /** Decode the records of a tfevents file down to the fields the hparams
    * contract cares about. */
  def readEvents(path: String): Seq[TbRecord] = {
    val in = new DataInputStream(new FileInputStream(path))
    try {
      Iterator.continually(graft.sources.TfRecordFormat.readRecord(in))
        .takeWhile(_.isDefined).flatten.map { payload =>
          var fileVersion: Option[String] = None
          var tag: Option[String] = None
          var plugin: Option[String] = None
          var content: Option[Array[Byte]] = None
          var simple: Option[Float] = None
          val ev = new Cur(payload, 0, payload.length)
          while (ev.hasMore) {
            val k = ev.varint(); val field = (k >>> 3).toInt; val wire = (k & 7).toInt
            field match {
              case 3 => fileVersion = Some(new String(ev.bytesOut(), UTF_8))
              case 5 =>
                val summary = ev.sub()
                while (summary.hasMore) {
                  val sk = summary.varint()
                  if ((sk >>> 3).toInt == 1 && (sk & 7) == 2) {
                    val value = summary.sub()
                    while (value.hasMore) {
                      val vk = value.varint(); val vf = (vk >>> 3).toInt; val vw = (vk & 7).toInt
                      vf match {
                        case 1 => tag = Some(new String(value.bytesOut(), UTF_8))
                        case 2 =>
                          var bits = 0; var i = 0
                          while (i < 4) { bits |= (value.b(value.p + i) & 0xff) << (8 * i); i += 1 }
                          value.p += 4
                          simple = Some(java.lang.Float.intBitsToFloat(bits))
                        case 9 =>
                          val md = value.sub()
                          while (md.hasMore) {
                            val mk = md.varint()
                            if ((mk >>> 3).toInt == 1 && (mk & 7) == 2) {
                              val pd = md.sub()
                              while (pd.hasMore) {
                                val pk = pd.varint()
                                (pk >>> 3).toInt match {
                                  case 1 => plugin = Some(new String(pd.bytesOut(), UTF_8))
                                  case 2 => content = Some(pd.bytesOut())
                                  case _ => pd.skip((pk & 7).toInt)
                                }
                              }
                            } else md.skip((mk & 7).toInt)
                          }
                        case _ => value.skip(vw)
                      }
                    }
                  } else summary.skip((sk & 7).toInt)
                }
              case _ => ev.skip(wire)
            }
          }
          TbRecord(fileVersion, tag, plugin, content, simple)
        }.toSeq
    } finally in.close()
  }
}
