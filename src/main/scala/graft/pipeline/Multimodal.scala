package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed in partition-sized batches.
 *
 * The decode step is STUBBED (this container has no image/audio codecs):
 * [[FakeCodec]] derives deterministic metadata and features from the bytes.
 * Everything Spark-side — schema, batch shape, partitioning, the
 * mapPartitions pipeline — is real and tested; swapping in a real codec
 * (JNI/FFI or a Python `mapInPandas` stage on clusters with the libs) only
 * replaces the [[MediaCodec]] implementation.
 */
object Multimodal {

  /** One media row: opaque payload + carried metadata. */
  final case class MediaRow(id: Long, kind: String, bytes: Array[Byte])

  /** Decoded metadata + a fixed-width feature vector. */
  final case class MediaFeatures(
      id: Long, kind: String, nBytes: Long,
      width: Int, height: Int, durationMs: Long,
      features: Array[Float])

  /** The codec seam: a real implementation decodes pixels/samples; the
   * stub is pure and deterministic on the payload bytes. */
  trait MediaCodec extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** Deterministic fake: metadata from byte-prefix hashes, features = first
   * 8 bytes scaled. A stand-in with the exact shape of a real decoder. */
  object FakeCodec extends MediaCodec {
    def decode(row: MediaRow): MediaFeatures = {
      val n = row.bytes.length
      val h = Dedup.hash64(java.util.Base64.getEncoder.encodeToString(
        row.bytes.take(32)))
      MediaFeatures(
        id = row.id, kind = row.kind, nBytes = n.toLong,
        width = (math.abs(h) % 1920).toInt + 1,
        height = (math.abs(h >> 16) % 1080).toInt + 1,
        durationMs = if (row.kind == "image") 0L else math.abs(h >> 32) % 600000L,
        // /256 (a power of two) keeps each component exactly representable
        // in BOTH float and double, so a SQL oracle's `byte / 256.0` double
        // math reproduces the float feature values bit-for-bit
        features = Array.tabulate(8)(i =>
          if (i < n) (row.bytes(i) & 0xFF).toFloat / 256f else 0f))
    }
  }

  /** Batch decode via mapPartitions — one codec instance per task, rows
   * streamed (never materialize a partition of payloads in memory). */
  def decodeAll(media: Dataset[MediaRow], codec: MediaCodec = FakeCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.map(codec.decode))
  }

  /** Synthesize a media table from any (id, text) source: payload = UTF-8
   * bytes standing in for real image/audio blobs. */
  def synthesize(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind, text.getBytes("UTF-8"))
      }
  }

  /** The full stub pipeline as a DataFrame (driver-query surface): decode →
   * flat metadata columns + feature-vector norm. */
  def featuresOf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val decoded = decodeAll(synthesize(df, idCol, textCol))
    decoded.toDF()
      .select(col("id"), col("kind"), col("nBytes").as("n_bytes"),
        col("width"), col("height"), col("durationMs").as("duration_ms"),
        round(sqrt(aggregate(col("features"), lit(0.0d),
          (acc, v) => acc + v.cast("double") * v.cast("double"))), 6).as("feature_norm"))
  }
}
