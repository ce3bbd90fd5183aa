package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed by partition-batched functions.
  *
  * The actual codec step is a STUB (image/audio libraries are not in this
  * container): `decodeStub` derives deterministic fake features from the
  * bytes. The Spark-side plumbing — binary schema, mapPartitions batch
  * shape (the Scala analogue of `mapInPandas` Arrow batches), partitioning,
  * frame explode — is real and oracle-checked on the byte-level parts.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("payload", BinaryType),
    StructField("meta_source", StringType)))

  /** Build a media table from the documents fixture: payload = utf-8 bytes
    * of the text (a stand-in for real image/audio bytes). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source").as("meta_source"))

  /** Decoded-features row produced by the stubbed codec. */
  final case class Decoded(media_id: Long, media_type: String, n_bytes: Long,
      payload_md5: String, width: Long, height: Long)

  /** Partition-batched "decode": iterates each partition once (the batch
    * shape a real Arrow/pandas decode would use) and emits per-item
    * features. Deterministic stub: md5 + byte-derived dimensions stand in
    * for ??? (real image decode — no codec libs in this container). */
  def decodeStub(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Decoded] = media
      .select(col("media_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // one MessageDigest per partition — the "load model once per
        // batch" pattern of real decoders
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.map { case (id, typ, bytes) =>
          md.reset()
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          Decoded(id, typ, bytes.length.toLong, hex,
            width = bytes.length.toLong % 640, height = bytes.length.toLong % 480)
        }
      }
    ds.toDF()
  }

  /** Frame sampling for "video" payloads: fixed-size byte windows exploded
    * to (media_id, frame_idx, frame_bytes) rows — the partition-preserving
    * explode a real frame sampler would use. */
  def frameSample(media: DataFrame, frameBytes: Int = 256, maxFrames: Int = 5): DataFrame =
    media.filter(col("media_type") === "video")
      .withColumn("n_frames",
        least(ceil(length(col("payload")).cast("double") / frameBytes).cast("long"), lit(maxFrames.toLong)))
      // zero-byte payloads have no frames: sequence(0, -1) would yield
      // [0, -1] (inferred step -1), not an empty array
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("n_frames"), col("payload"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_md5",
        md5(expr(s"substring(payload, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)")))
      .select(col("media_id"), col("frame_idx"), col("n_frames"), col("frame_md5"))
}
