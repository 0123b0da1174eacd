package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-local batches.
  *
  * The DECODE STEP IS A STUB: real image/audio codecs are not available in
  * this environment, so `decodeStub` derives deterministic fake dimensions/
  * features from the bytes. Everything around it — the schema, the batched
  * mapPartitions shape (the Scala analog of mapInPandas: bounded batches,
  * columnar-friendly), size-aware repartitioning — is real and tested, so
  * swapping `decodeStub` for a codec is a one-function change.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(mimeType: String, sizeBytes: Long)

  final case class MediaRecord(media_id: Long, media: Array[Byte], meta: MediaMeta)

  final case class DecodedMedia(
      media_id: Long, sizeBytes: Long, width: Int, height: Int,
      nFrames: Int, feature: Array[Float])

  /** STUB decode: deterministic pseudo-dimensions and a tiny feature vector
    * derived from the raw bytes. Replace with a real codec off-container.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val n = bytes.length
    val first = if (n > 0) bytes(0) & 0xff else 0
    val width = 16 + (n % 640)
    val height = 16 + ((n * 31 + first) % 480)
    val nFrames = 1 + (first % 30)
    val feature = Array.tabulate(8)(i => ((n * (i + 1) + first) % 997) / 997.0f)
    (width, height, nFrames, feature)
  }

  /** Build a media table from any (id, payload-string) source — used by
    * tests/fixtures since no binary table ships in testdata. Bytes are the
    * UTF-8 payload; metadata is typed.
    */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("media"),
      struct(
        lit("application/octet-stream").as("mimeType"),
        octet_length(col(textCol)).cast("long").as("sizeBytes")
      ).as("meta"))

  /** Batched decode/feature-extraction over the binary column — the
    * mapInPandas analog: each partition is processed in bounded batches so
    * a codec can amortize setup per batch without unbounded memory.
    * Size-aware repartition first: payload bytes, not row counts, drive
    * decode cost at scale.
    */
  def extractFeatures(
      media: DataFrame, batchSize: Int = 64, numPartitions: Int = 0
  ): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    val src = (if (numPartitions > 0) media.repartition(numPartitions, col("media_id"))
               else media)
      .select(col("media_id").cast("long"), col("media"),
        col("meta.sizeBytes").cast("long").as("sizeBytes"))
      .as[(Long, Array[Byte], Long)]
    src.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would init the codec here (stubbed)
        batch.iterator.map { case (id, bytes, size) =>
          val (w, h, f, feat) = decodeStub(bytes)
          DecodedMedia(id, size, w, h, f, feat)
        }
      }
    }
  }

  /** STUB resize: metadata-only transform (real resize would re-encode). */
  def resize(decoded: Dataset[DecodedMedia], maxDim: Int): DataFrame =
    decoded.toDF().withColumn("scale_e4",
      when(greatest(col("width"), col("height")) <= maxDim, lit(10000L))
        .otherwise(floor(lit(maxDim) * lit(10000.0) / greatest(col("width"), col("height"))).cast("long")))
      .withColumn("out_width", floor(col("width") * col("scale_e4") / lit(10000.0)).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale_e4") / lit(10000.0)).cast("int"))

  /** Deterministic frame sampling plan: every `stride`-th frame index. */
  def frameSamplePlan(decoded: Dataset[DecodedMedia], stride: Int): DataFrame =
    decoded.toDF().select(col("media_id"),
      sequence(lit(0), col("nFrames") - 1, lit(stride)).as("frame_indices"))
}
