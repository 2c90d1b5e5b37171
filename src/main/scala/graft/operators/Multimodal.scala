package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing (SURVEY §2 D11): treat image/audio/video as
 * opaque `binary` columns plus typed metadata, with batch decode /
 * feature-extract / frame-sample operators.
 *
 * Codec tiers:
 *  - REAL lossless codecs: [[syntheticImages]]/[[decodeImageFeatures]]
 *    (grayscale PNG), [[syntheticAudio]]/[[decodeAudioFeatures]]
 *    (16-bit PCM WAV), [[syntheticVideo]]/[[videoFrameFeatures]]
 *    (Motion-PNG frame stream) — all `javax.imageio`/`javax.sound`
 *    on executors, mapPartitions batch shape, decoded values equal the
 *    generating formula exactly → exact SQL oracles.
 *  - REAL lossy codec: [[syntheticJpegs]]/[[decodeImageStats]]
 *    (grayscale JPEG at pinned quality) — decoded statistics verified
 *    against closed-form TOLERANCE BANDS, the honest oracle shape for
 *    lossy formats.
 *  - STUB byte codec: `fakeDecode` derives pseudo-pixels from raw
 *    payload bytes, for payloads with no JDK-decodable format (the
 *    generic opaque-binary path used by decodeFeatures/frameFeatures).
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
      // ImageIO's stream cache is DISK-backed by default: every
      // write/read over a byte-array stream creates and deletes a temp
      // file, serializing 15k-image partitions behind the filesystem
      // (measured 1.4s → 5-7s run-to-run on the same data as /tmp state
      // varied). In-memory stream cache is strictly better for
      // byte-array payloads. Per-partition setter: it's a JVM-global
      // static, cheap to re-set, and this is the executor-side entry.
      javax.imageio.ImageIO.setUseCache(false)
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
      javax.imageio.ImageIO.setUseCache(false) // see syntheticImages
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

  /** JPEG dims derived from the id (16-48 px, both axes varied). */
  private def jpegDims(id: Long): (Int, Int) =
    (((id % 3) * 16 + 16).toInt, ((id % 2) * 16 + 16).toInt)

  /** Smooth gradient pixel base+x+y, no mod wrap (max 205 < 256): JPEG
   *  is LOSSY, and a low-frequency pattern keeps the loss in a narrow
   *  verifiable band — the DCT preserves the mean (DC) almost exactly,
   *  so band-checked statistics make an honest oracle where the PNG
   *  path's exact equality cannot exist. Closed forms for the oracle:
   *  mean = base + (w-1)/2 + (h-1)/2, range = [base, base+w+h-2]. */
  private def jpegPixel(id: Long, x: Int, y: Int): Int =
    ((id % 128) + x + y).toInt

  /**
   * REAL lossy-image codec, write half: one grayscale JPEG per id,
   * encoded on executors with the JDK's `javax.imageio` JPEG writer at
   * a pinned quality (deterministic bytes within a JVM). A training
   * corpus is mostly JPEG, not PNG — this is the representative path;
   * the writer is created once per PARTITION (the registry lookup is
   * not free) and disposed on task completion — a listener, because a
   * downstream limit may abandon the iterator before it drains.
   */
  def syntheticJpegs(df: DataFrame, idCol: String,
      quality: Float = 0.9f): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", metaSchema, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long").as("doc_id")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // see syntheticImages
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      // Dispose via the task-completion listener, not an iterator tail:
      // a downstream limit/take abandons the iterator before it drains,
      // which would leak the native ImageWriter per task.
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => writer.dispose()))
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(quality)
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = jpegDims(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, jpegPixel(id, x, y)); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
        ios.close()
        Row(id, bos.toByteArray, Row("jpeg", w, h))
      }
    }(enc)
  }

  /**
   * REAL decode + pixel statistics for ANY ImageIO-decodable payload
   * (JPEG, PNG, ...): dims, pixel count, luma sum/min/max all from the
   * DECODED raster. For lossy formats the gate compares these against
   * closed-form TOLERANCE BANDS; for lossless ones they are exact.
   * Output: (doc_id, width, height, n_pixels, luma_sum, min_luma,
   * max_luma).
   */
  def decodeImageStats(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_pixels", LongType, nullable = false),
      StructField("luma_sum", LongType, nullable = false),
      StructField("min_luma", IntegerType, nullable = false),
      StructField("max_luma", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col("doc_id"), col("payload")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        require(img != null, s"graft: undecodable image payload for id=$id")
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var sum = 0L
        var mn = 255
        var mx = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0)
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            x += 1
          }
          y += 1
        }
        Row(id, w, h, w.toLong * h, sum, mn, mx)
      }
    }(enc)
  }

  /**
   * REAL image RESIZE (the third op of the mandated decode /
   * feature-extract / resize / frame-sample quartet): decode the
   * payload with `javax.imageio`, NEAREST-NEIGHBOR scale to
   * (outW, outH), and re-encode as PNG. Nearest-neighbor is chosen
   * deliberately: out(x,y) = in(x·W/outW, y·H/outH) with integer
   * floor division — a pure index remap, so resized-pixel statistics
   * have an EXACT closed-form oracle (bilinear would need tolerance
   * bands like JPEG). Output: (doc_id, payload(resized PNG), width,
   * height, luma_sum) — dims and stats from the RESIZED raster.
   */
  def resizeImages(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, "graft: resize dims must be positive")
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("luma_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col("doc_id"), col("payload")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val in = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        require(in != null, s"graft: undecodable image payload for id=$id")
        val (w, h) = (in.getWidth, in.getHeight)
        val src = in.getRaster
        val out = new java.awt.image.BufferedImage(
          outW, outH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val dst = out.getRaster
        var sum = 0L
        var y = 0
        while (y < outH) {
          val sy = y * h / outH
          var x = 0
          while (x < outW) {
            val v = src.getSample(x * w / outW, sy, 0)
            dst.setSample(x, y, 0, v)
            sum += v
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Row(id, bos.toByteArray, outW, outH, sum)
      }
    }(enc)
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

  /** Audio sample count / DC offset derived from the id: n is a
   *  multiple of 256 so the 17-step residue walk (gcd(17,256)=1) covers
   *  full cycles — the sample SUM then has the closed form
   *  dc*n - 128*(n/256), plain integer SQL for the oracle. */
  private def audioParams(id: Long): (Int, Int) =
    ((1024 + (id % 4) * 256).toInt, (id % 7).toInt)

  /** Deterministic PCM sample i for doc `id`: a full-cycle residue walk
   *  plus a per-doc DC offset, range [-128, 133] — fits 16-bit PCM. */
  private def audioSample(id: Long, i: Int, dc: Int): Short =
    (((id * 31 + i.toLong * 17) % 256) - 128 + dc).toShort

  /**
   * The `AudioSystem` facade re-scans the SPI provider registry on
   * EVERY call (OpenJDK's getProviders has no cache) — measured ~9ms
   * per tiny WAV, which dominates executor codec time the same way
   * ImageIO's disk cache did. Resolve the JDK's WAVE writer and the
   * reader list once per JVM and call the providers directly: same
   * provider classes, same bytes, none of the per-row registry walk.
   */
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator.asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("graft: no WAVE writer SPI"))
  }
  private lazy val wavReaders: Array[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator.asScala.toArray
  }
  // remember the provider that last succeeded: probing starts there, so
  // steady-state decode pays zero UnsupportedAudioFileException throws
  // from the readers registered ahead of the WAVE one
  private val preferredReader = new java.util.concurrent.atomic.AtomicInteger(0)
  private def readWav(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val start = preferredReader.get()
    var k = 0
    while (k < wavReaders.length) {
      val i = (start + k) % wavReaders.length
      try {
        val ais = wavReaders(i).getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        if (i != start) preferredReader.set(i)
        return ais
      } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
      k += 1
    }
    throw new IllegalArgumentException("graft: undecodable audio payload")
  }

  /**
   * REAL audio codec, write half: one deterministic 16-bit mono PCM
   * waveform per id, encoded to WAV on executors with the JDK's
   * RIFF/WAVE provider (the audio analogue of [[syntheticImages]]).
   * PCM is lossless, so decoded samples round-trip exactly and the
   * generating formula is the oracle.
   */
  def syntheticAudio(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", metaSchema, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long").as("doc_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (n, dc) = audioParams(id)
        val pcm = new Array[Byte](n * 2) // 16-bit little-endian PCM
        var i = 0
        while (i < n) {
          val s = audioSample(id, i, dc)
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id, bos.toByteArray, Row("wav", n, 1))
      }
    }(enc)
  }

  /**
   * REAL audio decode + feature extraction: `AudioSystem` parses the
   * WAV container back to PCM on executors; the sample count comes from
   * the DECODED stream's frame length and every statistic from the
   * decoded samples — load-bearing, like [[decodeImageFeatures]].
   * Output: (doc_id, n_samples, sample_sum, peak_abs).
   */
  def decodeAudioFeatures(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sample_sum", LongType, nullable = false),
      StructField("peak_abs", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col("doc_id"), col("payload")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val ais = readWav(bytes)
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian, s"graft: unexpected WAV format for id=$id: $fmt")
        val n = ais.getFrameLength.toInt
        val pcm = ais.readAllBytes()
        require(pcm.length == n * 2, s"graft: truncated PCM for id=$id")
        var sum = 0L
        var peak = 0L
        var i = 0
        while (i < n) {
          val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toLong
          sum += s
          val a = math.abs(s)
          if (a > peak) peak = a
          i += 1
        }
        Row(id, n.toLong, sum, peak)
      }
    }(enc)
  }

  /** Per-(id, frame) base luma; pixels ramp along x so a decoder must
   *  read the whole raster (a constant frame could be faked from one
   *  pixel). Row sum stays closed-form: for l = base luma,
   *  sum_x (l+x)%256 = 8l + 28 - 256*max(0, l-248) — integer SQL. */
  private def frameLuma(id: Long, fidx: Int): Int =
    ((7 * id + 13 * fidx) % 256).toInt

  private def videoFrameCount(id: Long): Int = (4 + id % 3).toInt

  /**
   * REAL video-frame codec, write half: a Motion-PNG stream — each
   * frame an 8×8 grayscale PNG encoded with `javax.imageio`, frames
   * concatenated with a 4-byte big-endian length prefix (the same
   * container shape as raw MJPEG: independently-decodable keyframes,
   * which is what a frame-sampling pipeline consumes; inter-frame
   * codecs would decode groups-of-pictures here instead).
   */
  def syntheticVideo(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", metaSchema, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long").as("doc_id")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // see syntheticImages
      it.map { r =>
        val id = r.getLong(0)
        val nf = videoFrameCount(id)
        val bos = new java.io.ByteArrayOutputStream()
        val out = new java.io.DataOutputStream(bos)
        var f = 0
        while (f < nf) {
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          val luma = frameLuma(id, f)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) { raster.setSample(x, y, 0, (luma + x) % 256); x += 1 }
            y += 1
          }
          val frame = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", frame)
          out.writeInt(frame.size())
          frame.writeTo(out)
          f += 1
        }
        Row(id, bos.toByteArray, Row("mpng", nf, 8))
      }
    }(enc)
  }

  /**
   * REAL frame sampling + decode: parse the Motion-PNG container, keep
   * every `stride`-th frame, decode each kept frame with
   * `javax.imageio`, and emit per-frame features from the DECODED
   * pixels. Output: (doc_id, frame_idx, width, height, luma_sum).
   */
  def videoFrameFeatures(media: DataFrame, stride: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("luma_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col("doc_id"), col("payload")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val id = r.getLong(0)
        val in = new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        Iterator.continually {
          if (in.available() < 4) None
          else {
            val len = in.readInt()
            val frame = new Array[Byte](len)
            in.readFully(frame)
            Some(frame)
          }
        }.takeWhile(_.isDefined).map(_.get).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (frame, fidx) =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(frame))
            require(img != null, s"graft: undecodable frame $fidx for id=$id")
            val (w, h) = (img.getWidth, img.getHeight)
            val raster = img.getRaster
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            Row(id, fidx, w, h, sum)
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
