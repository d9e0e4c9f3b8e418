package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque binary payloads with
  * typed metadata, processed by a batched per-partition decode stage.
  *
  * The Spark-side shape is the real thing — binary column + metadata
  * struct, mapPartitions over a typed Dataset (the Scala analogue of
  * mapInPandas: one iterator per partition, amortized per-batch setup,
  * no driver involvement, no per-row task overhead). The decode itself
  * is a STUB: this container has no image/audio codecs, so
  * [[decodeStub]] derives deterministic fake features from the bytes.
  * Swapping in a real codec changes only the function body — the
  * schema, partitioning and batching contracts stay as tested.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, first_byte: Int, checksum: Long)

  /** documents → media table: payload = utf-8 bytes standing in for an
    * encoded image/audio blob; `kind` + byte length as typed metadata.
    */
  def toMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("text").as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decode — deterministic fake feature extraction (byte length,
    * first byte, additive checksum). A real decoder (JPEG dims, audio
    * duration, frame samples) drops in here unchanged.
    */
  def decodeStub(rec: MediaRecord): MediaFeatures = {
    val bytes = rec.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    MediaFeatures(rec.doc_id, bytes.length,
      if (bytes.isEmpty) -1 else bytes(0) & 0xff, sum)
  }

  /** Batched decode over partitions: iterator-in/iterator-out, so a
    * real implementation can hold one codec instance per partition.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "kind", "payload").as[MediaRecord]
      .mapPartitions(_.map(decodeStub))
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
