package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` columns with typed metadata,
  * decode / feature-extract as BATCHED partition-local transforms.
  *
  * The Spark-side shape is real and tested — schema, partitioning, batch
  * iteration, feature struct — while the actual codec is STUBBED with a
  * deterministic fake (this container has no image/audio libraries; a
  * real decoder drops in behind [[Decoder]] without touching the plumbing).
  *
  * Scale notes: media rows are large; keep
  * `spark.sql.files.maxPartitionBytes` small enough that a partition of
  * binary payloads fits executor memory, and batch the decode so native
  * codecs amortize per-batch setup (the mapInPandas batching idiom,
  * expressed here as Iterator.grouped over a mapPartitions).
  */
object Media {

  case class MediaRow(
      mediaId: Long,
      mediaType: String, // image | audio | video
      content: Array[Byte],
      filename: String,
      mimeType: String)

  case class MediaFeatures(
      mediaId: Long,
      nBytes: Long,
      width: Long,
      height: Long,
      channels: Long,
      signature: String)

  /** Pluggable batched decoder: bytes → features. Implementations decode
    * a whole batch at once (native codec amortization). */
  trait Decoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures]
  }

  /** STUB decoder — deterministic fake in place of a real image codec
    * (`???` boundary): geometry derived from byte length, signature =
    * md5. A real decoder replaces ONLY this class. */
  object StubDecoder extends Decoder {
    override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val sig = md.digest(r.content).map("%02x".format(_)).mkString
        val n = r.content.length.toLong
        MediaFeatures(r.mediaId, n,
          width = n % 64 + 1, height = (n / 64) % 64 + 1,
          channels = 3, signature = sig)
      }
  }

  /** REAL image decoder on the JDK's own `javax.imageio` (zero external
    * dependencies): PNG/JPEG/GIF/BMP payloads decode to their TRUE
    * geometry — width/height from the decoded image, channels from the
    * raster band count. Payloads that no installed reader accepts
    * (corrupt bytes, unsupported codec) yield an explicit
    * width=height=channels=0 marker row rather than failing the task —
    * at scale one broken blob must not kill a partition. Drop-in behind
    * [[Decoder]]: the batching/schema/partition plumbing is shared with
    * [[StubDecoder]] (which remains the deterministic oracle-gate
    * stand-in). */
  object ImageIoDecoder extends Decoder {
    override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val sig = md.digest(r.content).map("%02x".format(_)).mkString
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.content))
          catch { case _: java.io.IOException => null }
        if (img == null)
          MediaFeatures(r.mediaId, r.content.length.toLong, 0L, 0L, 0L, sig)
        else
          MediaFeatures(r.mediaId, r.content.length.toLong,
            img.getWidth.toLong, img.getHeight.toLong,
            img.getRaster.getNumBands.toLong, sig)
      }
  }

  /** Audio feature row: geometry from the container header, energy as
    * an INTEGER sum of squares over PCM16 samples — exact (an RMS
    * double would not be bit-reproducible across batch splits). */
  case class AudioFeatures(
      mediaId: Long,
      nBytes: Long,
      sampleRate: Long,
      channels: Long,
      nFrames: Long,
      durationMs: Long,
      sumSquares: Long)

  /** Pluggable batched audio decoder (same contract as [[Decoder]]). */
  trait AudioDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRow]): Seq[AudioFeatures]
  }

  /** REAL audio decoder on the JDK's own `javax.sound.sampled` (zero
    * external dependencies): WAV/AIFF/AU payloads parse to their TRUE
    * sample rate / channel count / frame length, and PCM16 payloads
    * additionally get an exact integer energy (sum of squares over all
    * samples, all channels). Undecodable payloads yield an explicit
    * zero-geometry marker row — one broken blob must not kill a
    * partition. The audio twin of [[ImageIoDecoder]]. */
  object WavPcmDecoder extends AudioDecoder {
    override def decodeBatch(batch: Seq[MediaRow]): Seq[AudioFeatures] =
      batch.map { r =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.content))
          val fmt = ais.getFormat
          val frames = ais.getFrameLength
          val pcm = ais.readAllBytes()
          var ss = 0L
          if (fmt.getSampleSizeInBits == 16) {
            var i = 0
            while (i + 1 < pcm.length) {
              val s =
                if (fmt.isBigEndian) (pcm(i) << 8) | (pcm(i + 1) & 0xff)
                else (pcm(i + 1) << 8) | (pcm(i) & 0xff)
              ss += s.toLong * s
              i += 2
            }
          }
          val rate = fmt.getSampleRate.toLong
          AudioFeatures(r.mediaId, r.content.length.toLong, rate,
            fmt.getChannels.toLong, frames,
            if (rate > 0) frames * 1000L / rate else 0L, ss)
        } catch {
          case _: Exception =>
            AudioFeatures(r.mediaId, r.content.length.toLong, 0L, 0L, 0L,
              0L, 0L)
        }
      }
  }

  /** Batched partition-local audio decode — same plumbing as
    * [[decodeFeatures]], audio feature struct. */
  def decodeAudioFeatures(media: Dataset[MediaRow],
      decoder: AudioDecoder = WavPcmDecoder,
      batchSize: Int = 64): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    graft.util.Spread.spread(media).mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decoder.decodeBatch(batch))
    }
  }

  /** Derive a media table from the driver's documents table: text bytes
    * stand in for image payloads (deterministic, so the DuckDB oracle can
    * state the same transform). */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("mediaId"),
      lit("image").as("mediaType"),
      encode(col("text"), "UTF-8").as("content"),
      concat(lit("doc_"), col("doc_id"), lit(".png")).as("filename"),
      lit("image/png").as("mimeType")).as[MediaRow]
  }

  /** Batched partition-local decode — the engine's mapInPandas
    * equivalent. One pass over each partition, `batchSize` rows per
    * decoder call, no shuffle. */
  def decodeFeatures(media: Dataset[MediaRow], decoder: Decoder = StubDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    graft.util.Spread.spread(media).mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decoder.decodeBatch(batch))
    }
  }

  /** REAL batched image resize on the JDK's own `javax.imageio` +
    * `java.awt.Graphics2D` (zero external dependencies): decode →
    * bilinear scale to `width`×`height` → re-encode as PNG, all
    * partition-local (the training-prep normalization step before
    * vision-encoder batching — every payload leaves at a fixed
    * geometry). Undecodable payloads pass through UNCHANGED with
    * `mimeType = "application/octet-stream"` as the marker (one broken
    * blob must not kill a partition; dropping it silently would skew
    * downstream counts). PNG round-trips are deterministic (lossless,
    * fixed encoder), so resized payloads are stable across retries —
    * the property every dedup stage downstream depends on. */
  def resizeImages(media: Dataset[MediaRow], width: Int, height: Int,
      batchSize: Int = 64): Dataset[MediaRow] = {
    require(width > 0 && height > 0,
      s"resize geometry must be positive, got ${width}x$height")
    val spark = media.sparkSession
    import spark.implicits._
    graft.util.Spread.spread(media).mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        val resized =
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.content))
            if (img == null) None
            else {
              val out = new java.awt.image.BufferedImage(width, height,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, width, height, null)
              } finally g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              Some(bos.toByteArray)
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        resized match {
          case Some(bytes) => r.copy(content = bytes, mimeType = "image/png")
          case None => r.copy(mimeType = "application/octet-stream")
        }
      })
    }
  }

  /** Deterministic frame sampling stub for video payloads: every
    * `stride`-th 256-byte chunk becomes a "frame" row (mediaId,
    * frame_idx, frame_bytes). Real frame extraction replaces the chunker
    * only. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      r.content.grouped(256).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, i) => (r.mediaId, i.toLong, chunk) }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
