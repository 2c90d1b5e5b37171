package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing (SURVEY §2 D11): treat image/audio/video as
 * opaque `binary` columns plus typed metadata, with batch decode /
 * feature-extract / frame-sample operators.
 *
 * The codec itself is STUBBED (this container has no image/audio
 * libraries): `fakeDecode` derives deterministic pseudo-pixels from the
 * bytes. Everything Spark-side is real — schema, partition-parallel
 * mapPartitions execution, batch shapes — so swapping in a real codec is
 * a one-function change.
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
