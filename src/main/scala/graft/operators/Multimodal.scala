package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing (SURVEY §2 D11): treat image/audio/video as
 * opaque `binary` columns plus typed metadata, with batch decode /
 * feature-extract / frame-sample operators.
 *
 * Two codec tiers:
 *  - REAL image codec: [[syntheticImages]] encodes deterministic
 *    grayscale PNGs with the JDK's `javax.imageio` (no external deps)
 *    and [[decodeImageFeatures]] decodes them back on executors —
 *    an actual byte→pixel decode in the mapPartitions batch shape a
 *    production pipeline uses. PNG grayscale is lossless, so decoded
 *    pixels equal the generating formula and the features have an
 *    exact SQL oracle.
 *  - STUB byte codec: `fakeDecode` derives pseudo-pixels from raw
 *    payload bytes, for payloads with no decodable format (the generic
 *    opaque-binary path used by decodeFeatures/frameFeatures).
 */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("byte_sum", LongType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /**
   * Attach a synthetic media payload + metadata to a text table: the
   * UTF-8 bytes stand in for an encoded image; width/height derive
   * deterministically from the id.
   */
  def asMedia(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("raw").as("format"),
        (pmod(col(idCol), lit(4)) * 16 + 32).cast("int").as("width"),
        (pmod(col(idCol), lit(3)) * 16 + 32).cast("int").as("height")).as("meta"))

  /** STUB codec: deterministic fake "decode" of payload bytes to luma. */
  private def fakeDecode(payload: Array[Byte]): Array[Int] =
    payload.map(b => (b & 0xff) ^ 0x5a)

  /** Deterministic test-pattern pixel: (id*31 + 7x + 13y) mod 256 — the
   *  generating formula is plain integer SQL, so decoded-pixel features
   *  are exactly recomputable by an engine that never sees the PNG. */
  private def patternPixel(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** Image dims derived from the id (same formula as [[asMedia]]). */
  private def patternDims(id: Long): (Int, Int) =
    (((id % 4) * 16 + 32).toInt, ((id % 3) * 16 + 32).toInt)

  /**
   * Encode one REAL grayscale PNG per id with `javax.imageio` — the
   * payload is genuine compressed image bytes, produced on executors in
   * partition-parallel batches (the write half of a real codec).
   */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", metaSchema, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long").as("doc_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = patternDims(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, patternPixel(id, x, y)); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray, Row("png", w, h))
      }
    }(enc)
  }

  /**
   * REAL decode + feature extraction: `javax.imageio` parses the PNG
   * payload back to pixels on executors (grayscale PNG is lossless, so
   * pixels round-trip exactly); dims come from the DECODED image, not
   * the metadata — the decode is load-bearing, not decorative. Output:
   * (doc_id, width, height, n_pixels, luma_sum, mean_luma).
   */
  def decodeImageFeatures(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_pixels", LongType, nullable = false),
      StructField("luma_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col("doc_id"), col("payload")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"graft: undecodable image payload for id=$id")
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        Row(id, w, h, w.toLong * h, sum)
      }
    }(enc).withColumn("mean_luma",
      round(col("luma_sum").cast("double") / col("n_pixels"), 6))
  }

  /**
   * Batch decode + feature extraction over partitions (the real-codec
   * insertion point; batch shape = one partition iterator, like an
   * Arrow-batched pandas UDF would receive).
   */
  def decodeFeatures(media: DataFrame, frameSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select(col("doc_id"), col("payload")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val luma = fakeDecode(bytes)
        Row(id, bytes.length.toLong,
          luma.foldLeft(0L)(_ + _),
          if (luma.isEmpty) 0.0 else luma.foldLeft(0L)(_ + _).toDouble / luma.length,
          (bytes.length + frameSize - 1) / frameSize)
      }
    }(enc)
  }

  /**
   * Per-frame features over sampled frames: one row per kept frame with
   * the stub-decoded byte statistics — the batch shape of per-frame
   * feature extraction (a real model would consume the same rows).
   */
  def frameFeatures(media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_len", LongType, nullable = false),
      StructField("frame_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col("doc_id"), col("payload")).mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        bytes.grouped(frameSize).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (frame, idx) =>
            val luma = fakeDecode(frame)
            Row(id, idx, frame.length.toLong, luma.foldLeft(0L)(_ + _))
          }
      }
    }(enc)
  }

  /**
   * Frame sampling: split the payload into fixed-size frames, keep every
   * `stride`-th, emit one row per kept frame.
   */
  def frameSample(media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    val frameSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameSchema)
    media.select(col("doc_id"), col("payload")).mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        bytes.grouped(frameSize).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (frame, idx) => Row(id, idx, frame) }
      }
    }(enc)
  }
}
