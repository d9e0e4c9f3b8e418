package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque binary payloads with
  * typed metadata, processed by a batched per-partition decode stage.
  *
  * The shape is mapPartitions over a typed Dataset (the Scala analogue
  * of mapInPandas: one iterator per partition, amortized per-batch
  * setup, no driver involvement, no per-row task overhead), and the
  * image path is REAL: payloads are actual PNG files encoded with
  * javax.imageio on the executors, and [[decodeImages]] parses the PNG
  * container and pixel data back out — swapping in JPEG/WebP or an
  * audio codec changes only the per-record function, never the schema,
  * partitioning, or batching contracts.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])
  final case class ImageFeatures(
      doc_id: Long, kind: String, width: Int, height: Int, px_sum: Long)

  /** documents → media table: payload = utf-8 bytes standing in for an
    * encoded blob; `kind` + byte length as typed metadata. Used by the
    * codec-free frame-sampling path where byte offsets are the frame
    * grid.
    */
  def toMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("text").as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Deterministic tiny image per doc: dimensions derived from
    * (doc_id, `sizeCol`), every pixel the same gray level
    * doc_id % 256. Encoded as a REAL PNG with ImageIO on the
    * executors — the payload column carries genuine image files, and
    * because the fill is constant the decoded pixel sum has the closed
    * form w·h·3·gray that a SQL oracle can state without a codec.
    */
  /** Encode one constant-gray w×h image through ImageIO in `fmt`
    * ("png", "jpg", …) — the shared executor-side encode kernel.
    */
  private def encodeConstantImage(id: Long, size: Long, fmt: String): Array[Byte] = {
    val w = 8 + (math.floorMod(id, 9L)).toInt
    val h = 8 + (math.floorMod(size, 7L)).toInt
    val g = math.floorMod(id, 256L).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  def toImageTable(docs: DataFrame, idCol: String, sizeCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(sizeCol).cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        // one scratch buffer per (w, h) within the partition would be
        // possible; PNG encode of <16x16 images is already trivial
        ImageIO.setUseCache(false) // no temp-file cache per encode
        it.map { case (id, size) =>
          (id, "image/png", encodeConstantImage(id, size, "png"))
        }
      }
      .toDF("doc_id", "kind", "payload")
  }

  /** Mixed-codec variant: even doc_ids encode as PNG, odd as JPEG —
    * two real container formats through the same write path, decoded
    * by the SAME [[decodeImages]]. This is what proves the decode
    * stage is format-agnostic (ImageIO container sniffing), not a
    * PNG-only parser. JPEG is lossy, so only dimensions and kind are
    * exact for the oracle; the near-exact pixel sum (constant-fill
    * images are DC-only for JPEG) is tolerance-checked in the spec.
    */
  def toImageTableMixed(docs: DataFrame, idCol: String, sizeCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(sizeCol).cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, size) =>
          if (id % 2 == 0)
            (id, "image/png", encodeConstantImage(id, size, "png"))
          else
            (id, "image/jpeg", encodeConstantImage(id, size, "jpg"))
        }
      }
      .toDF("doc_id", "kind", "payload")
  }

  /** Real image decode over partitions: parse each payload as an
    * actual image file (PNG/JPEG/anything ImageIO handles), extract
    * width, height, and the sum of all RGB channel values. Undecodable
    * payloads fail loudly — silently dropping a corrupt image would
    * skew any downstream feature statistics.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select("doc_id", "kind", "payload").as[MediaRecord]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { rec =>
          val img = ImageIO.read(new ByteArrayInputStream(rec.payload))
          require(img != null,
            s"doc ${rec.doc_id}: payload is not a decodable image")
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
              x += 1
            }
            y += 1
          }
          ImageFeatures(rec.doc_id, rec.kind, img.getWidth, img.getHeight, sum)
        }
      }
  }

  /** Encode one 8×8 gradient image: gray(x, y) =
    * (x·31 + y·17 + (id mod 32)·11) mod 256 — structured pixels (so
    * perceptual hashing is non-degenerate, unlike a constant fill)
    * with a closed form a SQL oracle can state, and an id-mod-32
    * class structure that plants exact perceptual duplicates.
    */
  private def encodeGradientImage(id: Long): Array[Byte] = {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    val base = math.floorMod(id, 32L).toInt * 11
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val g = (x * 31 + y * 17 + base) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def toImageTableGradient(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map(id => (id, "image/png", encodeGradientImage(id)))
      }
      .toDF("doc_id", "kind", "payload")
  }

  /** 60-bit average-hash over a decoded 8×8 image (the pHash family's
    * simplest member, at the repo-wide 60-bit fingerprint width): bit
    * j = y·8+x (j < 60) is set when pixel gray exceeds the image mean
    * — stated exactly as p·64 > Σp, integer arithmetic both engines
    * compute identically. The image path is REAL (the payload is
    * decoded by the codec, not trusted): LAION-style image dedup
    * hashes DECODED pixels, which is what catches re-encoded
    * duplicates a byte-hash misses. Returns (doc_id, ahash).
    */
  def ahashImages(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "kind", "payload").as[MediaRecord]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { rec =>
          val img = ImageIO.read(new ByteArrayInputStream(rec.payload))
          require(img != null && img.getWidth == 8 && img.getHeight == 8,
            s"doc ${rec.doc_id}: payload is not a decodable 8x8 image")
          val px = new Array[Int](64)
          var tot = 0L
          var j = 0
          while (j < 64) {
            px(j) = img.getRGB(j % 8, j / 8) & 0xff
            tot += px(j); j += 1
          }
          var hash = 0L
          j = 0
          while (j < 60) {
            if (px(j) * 64L > tot) hash |= (1L << j)
            j += 1
          }
          (rec.doc_id, hash)
        }
      }
      .toDF("doc_id", "ahash")
  }

  final case class AudioFeatures(
      doc_id: Long, sample_rate: Int, n_samples: Long, amp_sum: Long)

  private val AudioRate = 8000f

  /** Deterministic PCM per doc: n = 100 + `sizeCol` % 200 samples of
    * 16-bit mono at 8 kHz, sample i = ((doc_id·31 + i·7) mod 2001) −
    * 1000 — a closed form a SQL oracle can state. Encoded as a REAL
    * WAV container with javax.sound on the executors (the JDK's audio
    * codec — no external library), so the payload column carries
    * genuine audio files.
    */
  def toAudioTable(docs: DataFrame, idCol: String, sizeCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(sizeCol).cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, size) =>
          val n = (100 + math.floorMod(size, 200L)).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = (math.floorMod(id * 31 + i * 7L, 2001L) - 1000L).toShort
            pcm(2 * i) = (s & 0xff).toByte          // little-endian
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(AudioRate, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, "audio/wav", bos.toByteArray)
        }
      }
      .toDF("doc_id", "kind", "payload")
  }

  /** Real thumbnail resize over partitions: decode each payload,
    * nearest-neighbor scale to `targetW`×`targetH` with Graphics2D,
    * re-encode as PNG — the normalize-dimensions step that precedes
    * any vision encoder, done decode→transform→re-encode so the
    * output column still carries genuine image files (the registered
    * query proves it by decoding them again). Nearest-neighbor keeps
    * a constant-fill image exactly constant, so the resized pixel sum
    * retains the codec-free closed form targetW·targetH·3·gray the
    * SQL oracle states. Same mapPartitions batching contract as
    * [[decodeImages]].
    */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0,
      s"target dimensions must be positive, got ${targetW}x$targetH")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "kind", "payload").as[MediaRecord]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { rec =>
          val src = ImageIO.read(new ByteArrayInputStream(rec.payload))
          require(src != null,
            s"doc ${rec.doc_id}: payload is not a decodable image")
          val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
          val g2 = dst.createGraphics()
          try {
            g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
            g2.drawImage(src, 0, 0, targetW, targetH, null)
          } finally g2.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(dst, "png", bos)
          (rec.doc_id, "image/png", bos.toByteArray)
        }
      }
      .toDF("doc_id", "kind", "payload")
  }

  /** Real audio decode over partitions: parse each payload as a WAV
    * file through the JDK codec (container header → format, frames →
    * samples) and extract sample rate, frame count, and the signed
    * amplitude sum. Undecodable payloads fail loudly, same contract
    * as [[decodeImages]].
    */
  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select("doc_id", "kind", "payload").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val ais = try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(rec.payload))
          catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              throw new IllegalArgumentException(
                s"doc ${rec.doc_id}: payload is not a decodable audio file", e)
          }
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"doc ${rec.doc_id}: expected 16-bit mono, got $fmt")
          val bytes = ais.readAllBytes()
          var sum = 0L
          var i = 0
          while (i + 1 < bytes.length) {
            // little-endian signed 16-bit
            sum += ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort
            i += 2
          }
          AudioFeatures(rec.doc_id, fmt.getSampleRate.toInt,
            bytes.length / 2, sum)
        }
      }
  }

  /** Frame sampling plumbing: chunk the binary payload into fixed
    * `frameBytes` frames and keep every `stride`-th one — the shape of
    * video frame extraction (the codec-free stand-in samples byte
    * ranges; a real decoder swaps in at the substr step). Pure Column
    * expressions: the explode happens on the executors, frames never
    * gather on the driver.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes).cast("int")
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))))
      .filter(col("frame_idx") % stride === 0)
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
  }
}
