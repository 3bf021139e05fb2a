package graft.llm

import graft.data.Tables
import graft.ops.QueryDef
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north-star extension).
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct —
  * the 100 TB design keeps bytes in parquet (or pointers to object storage)
  * and only ever shuffles metadata + extracted features. The decode step is
  * STUBBED (no image/audio libs in this container) with a deterministic fake;
  * the Spark-side plumbing — schema, batching, partition-parallel decode via
  * mapPartitions, feature schema — is real and tested.
  */
object Multimodal {

  /** A media row: payload + typed metadata (the engine's multimodal schema). */
  case class MediaRow(media_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  /** Extracted features per media item. */
  case class MediaFeatures(media_id: Long, n_frames: Int, features: Array[Double])

  /** Deterministic fake "decode + feature extract": chunk payload into
    * 16-byte "frames", feature = mean unsigned byte value per frame.
    * Stands in for an image/audio decoder; REAL decoders slot in here with
    * the same mapPartitions batch shape (one decoder init per partition). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (decoder handles, model weights, ...)
      rows.map { m =>
        val frames = m.payload.grouped(16).toArray
        val feats = frames.map(f => f.map(b => (b & 0xff).toDouble).sum / f.length)
        MediaFeatures(m.media_id, frames.length, feats)
      }
    }
  }

  /** Deterministic stub "resize": stride-downsample the payload to at most
    * `targetBytes` (every ceil(n/target)-th byte). Stands in for an image
    * resize / audio resample; a real codec slots into the same typed
    * mapPartitions with per-partition init, and only the RESIZED bytes ever
    * move downstream — at 100 TB that is the point of resizing early. */
  def resize(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val stride = math.max(1, math.ceil(m.payload.length.toDouble / targetBytes).toInt)
        val out = m.payload.indices.collect { case i if i % stride == 0 => m.payload(i) }.toArray
        MediaRow(m.media_id, out, m.mime, out.length.toLong)
      }
    }
  }

  /** Documents-as-media: utf-8 bytes payload (the container has no real
    * image/audio testdata; the pipeline shape is identical). */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "utf-8").as("payload"),
        lit("text/plain").as("mime"),
        length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"))
      .as[MediaRow]
  }

  val entries: Seq[QueryDef] = Seq(
    // Binary column metadata — oracle-checkable (blob functions in both).
    QueryDef("m1_binary_meta",
      """SELECT doc_id,
        |       octet_length(encode(text)) AS n_bytes,
        |       md5(text) AS content_hash,
        |       hex(encode(substring(text, 1, 4))) AS magic_hex
        |FROM documents""".stripMargin) { (s, d) =>
      Tables(s, d, "documents").select(
        col("doc_id"),
        length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"),
        md5(col("text")).as("content_hash"),
        hex(encode(substring(col("text"), 1, 4), "utf-8")).as("magic_hex"))
    },

    // Stubbed decode → feature extraction via typed mapPartitions.
    // Engine-specific (no SQL analog) → rows-only check + ScalaTest.
    QueryDef.noOracle("m2_media_features") { (s, d) =>
      val feats = extractFeatures(mediaFromDocuments(s, d))
      feats.toDF().select(
        col("media_id"), col("n_frames"),
        round(element_at(col("features"), 1), 6).as("f0"))
    },

    // M4: stub resize → metadata + content hash of the downsampled payload.
    // Decode-side op → typed mapPartitions; engine-specific → rows-only +
    // a golden-row check in DataPlaneSpec.
    QueryDef.noOracle("m4_resize") { (s, d) =>
      resize(mediaFromDocuments(s, d), targetBytes = 64).toDF()
        .select(
          col("media_id"), col("n_bytes").as("resized_bytes"),
          md5(col("payload")).as("resized_hash"))
    },

    // M3: frame sampling — every 3rd 16-char frame of the payload, encoded
    // and hexed (the "sample video frames / audio windows" pipeline shape,
    // purely columnar so it stays codegen'd; the real decoder path lives in
    // m2's mapPartitions). Columnar lambda over a frame-index sequence;
    // oracle mirrors it with list_transform/list_filter.
    QueryDef("m3_frame_sample",
      """SELECT doc_id,
        |       CAST((length(text) + 15) // 16 AS BIGINT) AS n_frames,
        |       array_to_string(
        |         list_transform(
        |           list_filter(range(0, CAST((length(text) + 15) // 16 AS BIGINT)),
        |                       i -> i % 3 = 0),
        |           i -> hex(encode(substring(text, CAST(i * 16 + 1 AS INT), 16)))),
        |         ',') AS sampled_hex
        |FROM documents""".stripMargin) { (s, d) =>
      val t = col("text")
      val nFrames = floor((length(t) + 15) / 16).cast("long")
      val sampled = transform(
        filter(sequence(lit(0L), nFrames - 1), i => i % 3 === 0),
        i => hex(encode(t.substr((i * 16 + 1).cast("int"), lit(16)), "utf-8")))
      Tables(s, d, "documents").select(
        col("doc_id"),
        nFrames.as("n_frames"),
        array_join(sampled, ",").as("sampled_hex"))
    }
  )
}
