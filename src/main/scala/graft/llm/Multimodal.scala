package graft.llm

import graft.data.Tables
import graft.ops.QueryDef
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north-star extension).
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct —
  * the 100 TB design keeps bytes in parquet (or pointers to object storage)
  * and only ever shuffles metadata + extracted features. Since r12 the
  * decode is REAL: the media column carries genuine PNG images (rendered
  * deterministically from the document corpus, since the container ships no
  * image testdata) and m2/m4 decode them with `javax.imageio` inside the
  * typed mapPartitions shape — one decoder init per partition, only
  * features / resized bytes ever move downstream.
  */
object Multimodal {

  /** A media row: payload + typed metadata (the engine's multimodal schema). */
  case class MediaRow(media_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  /** Features decoded from an image payload: dimensions + channel means. */
  case class ImageFeatures(media_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Side of the square PNGs the media generator renders. */
  val GenDim = 16

  /** Pixel channels for index `i` (row-major) of the generated image for
    * (`id`, `textBytes`) — the ONE deterministic fill rule shared by the
    * generator and the spec's golden recomputation, so the test proves the
    * PNG encode→decode round trip reproduces these exact values. */
  private[graft] def genPixel(id: Long, textBytes: Array[Byte], i: Int): (Int, Int, Int) = {
    val r = if (textBytes.isEmpty) ((id + i) & 0xffL).toInt
            else textBytes(i % textBytes.length) & 0xff
    val g = ((i * 7 + id) & 0xffL).toInt
    val b = (r ^ i) & 0xff
    (r, g, b)
  }

  /** Render a REAL GenDim×GenDim RGB PNG from a document (deterministic:
    * pixels are [[genPixel]] of the utf-8 text bytes). */
  private[graft] def pngFromText(id: Long, text: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      GenDim, GenDim, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bytes = text.getBytes("UTF-8")
    var i = 0
    while (i < GenDim * GenDim) {
      val (r, g, b) = genPixel(id, bytes, i)
      img.setRGB(i % GenDim, i / GenDim, (r << 16) | (g << 8) | b)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode + feature extraction: `javax.imageio` PNG decode
    * inside typed mapPartitions (decoder config init once per partition),
    * emitting dimensions + per-channel means — KB of features per row
    * regardless of payload size, the only thing that shuffles. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init: no disk-backed stream cache in executors
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { m =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
        require(img != null, s"media ${m.media_id}: payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = (w * h).toDouble
        ImageFeatures(m.media_id, w, h, sr / n, sg / n, sb / n)
      }
    }
  }

  /** REAL image resize: decode, block-mean downsample to
    * `targetDim`×`targetDim` (exact integer area average — deterministic
    * across JVMs, unlike AWT's toolkit scalers), re-encode PNG. Same typed
    * mapPartitions shape; only the RESIZED bytes move downstream — at
    * 100 TB that is the point of resizing early. */
  def resize(media: Dataset[MediaRow], targetDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { m =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
        require(img != null, s"media ${m.media_id}: payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new java.awt.image.BufferedImage(
          targetDim, targetDim, java.awt.image.BufferedImage.TYPE_INT_RGB)
        // per-output-pixel block bounds [x·w/targetDim, (x+1)·w/targetDim):
        // every source pixel lands in exactly one block at ANY dimension
        // ratio (the plain w/targetDim integer stride silently dropped the
        // rightmost/bottom remainder when dims aren't multiples of
        // targetDim, and duplicated edge pixels on upscale — for
        // multiple-of-targetDim inputs the bounds are identical). Upscale
        // blocks (source smaller than target) are empty by this formula,
        // so they widen to the single nearest source pixel.
        var y = 0
        while (y < targetDim) {
          val sy0 = (y.toLong * h / targetDim).toInt
          val sy1 = math.max(sy0 + 1, ((y + 1).toLong * h / targetDim).toInt)
          var x = 0
          while (x < targetDim) {
            val sx0 = (x.toLong * w / targetDim).toInt
            val sx1 = math.max(sx0 + 1, ((x + 1).toLong * w / targetDim).toInt)
            var (sr, sg, sb, n) = (0, 0, 0, 0)
            var sy = sy0
            while (sy < sy1) {
              var sx = sx0
              while (sx < sx1) {
                val p = img.getRGB(math.min(w - 1, sx), math.min(h - 1, sy))
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                n += 1; sx += 1
              }
              sy += 1
            }
            out.setRGB(x, y, ((sr / n) << 16) | ((sg / n) << 8) | (sb / n))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        val resized = bos.toByteArray
        MediaRow(m.media_id, resized, m.mime, resized.length.toLong)
      }
    }
  }

  /** Documents-as-media: a REAL PNG rendered per document ([[pngFromText]]
    * — the container ships no image testdata, so the media column is
    * generated, but everything downstream decodes genuine image bytes). */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val png = pngFromText(id, text)
          MediaRow(id, png, "image/png", png.length.toLong)
        }
      }
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

    // REAL decode → feature extraction: javax.imageio PNG decode in typed
    // mapPartitions, emitting dims + channel means. Engine-specific (no
    // SQL analog) → rows-only check + a pixel-exact golden-row ScalaTest.
    QueryDef.noOracle("m2_media_features") { (s, d) =>
      val feats = extractFeatures(mediaFromDocuments(s, d))
      feats.toDF().select(
        col("media_id"), col("width"), col("height"),
        round(col("mean_r"), 6).as("mean_r"),
        round(col("mean_g"), 6).as("mean_g"),
        round(col("mean_b"), 6).as("mean_b"))
    },

    // M4: REAL image resize — PNG decode, exact block-mean downsample to
    // 8×8, PNG re-encode, all inside typed mapPartitions; only the resized
    // bytes move. Decode-side op → engine-specific → rows-only +
    // a pixel-exact golden-row check in DataPlaneSpec.
    QueryDef.noOracle("m4_resize") { (s, d) =>
      resize(mediaFromDocuments(s, d), targetDim = 8).toDF()
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
