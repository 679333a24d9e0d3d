package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed in partition-sized batches.
 *
 * Two codecs behind the [[MediaCodec]] seam:
 *  - [[HeaderCodec]] (round-5): a REAL container-format decoder — PNG /
 *    GIF / JPEG dimensions parsed from the payload's magic bytes per the
 *    public format specs, pure Scala, no media libraries. Pixel/sample
 *    decoding still needs external codecs; header metadata does not.
 *  - [[FakeCodec]]: the deterministic stand-in for payloads that are not
 *    real container bytes (synthetic fixtures).
 * Everything Spark-side — schema, batch shape, partitioning, the
 * mapPartitions pipeline — is shared by both; a full pixel decoder
 * (JNI/FFI or a Python `mapInPandas` stage on clusters with the libs)
 * would be a third [[MediaCodec]] implementation.
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

  /**
   * Parse (format, width, height) from an image payload's header bytes.
   * Pure function over the public container specs:
   *
   *  - PNG: 8-byte signature `89 'PNG' 0D 0A 1A 0A`; the IHDR chunk is
   *    mandatory-first, so width/height are the big-endian uint32s at
   *    offsets 16/20 (PNG spec §5.2, §11.2.2).
   *  - GIF: `GIF87a`/`GIF89a`, then the Logical Screen Descriptor's
   *    little-endian uint16 width/height at offsets 6/8 (GIF89a spec §18).
   *  - JPEG: `FF D8` (SOI), then a marker scan — each segment is
   *    `FF <marker> <len:u16be>`; dimensions live in the first SOF frame
   *    header (markers C0–CF except C4/C8/CC) as height/width u16be at
   *    segment offsets +3/+5 (ITU T.81 §B.2.2). Standalone markers
   *    (TEM, RST0–7) carry no length; the scan stops at SOS/EOI.
   *
   * None = not a recognized image container (or truncated/corrupt header).
   */
  def parseImageHeader(b: Array[Byte]): Option[(String, Int, Int)] = {
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    @inline def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)

    if (b.length >= 24 &&
        u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A && u8(7) == 0x0A &&
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')
      Some(("png", be32(16), be32(20)))
    else if (b.length >= 10 &&
        u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8' &&
        (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      Some(("gif", le16(6), le16(8)))
    else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8)
      jpegDims(b)
    else None
  }

  /** SOF frame markers: C0–CF minus C4 (DHT), C8 (JPG ext), CC (DAC). */
  @inline private def isSof(m: Int): Boolean =
    m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC

  private def jpegDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    var i = 2
    while (i + 3 < b.length) {
      if (u8(i) != 0xFF) return None // marker desync — corrupt stream
      var j = i + 1
      while (j < b.length && u8(j) == 0xFF) j += 1 // fill bytes are legal
      if (j >= b.length) return None
      val m = u8(j)
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) i = j + 1 // standalone
      else if (m == 0xD9 || m == 0xDA) return None // EOI/SOS before any SOF
      else {
        if (j + 2 >= b.length) return None
        val len = be16(j + 1)
        if (len < 2) return None
        if (isSof(m)) {
          // segment: len(2) precision(1) height(2) width(2) ...
          if (j + 7 >= b.length) return None
          return Some(("jpeg", be16(j + 6), be16(j + 4)))
        }
        i = j + 1 + len
      }
    }
    None
  }

  /** Real header decode behind the codec seam: kind refined to the parsed
   * container format, width/height from the header, durationMs 0 for still
   * images; unparseable payloads keep the carried kind with 0×0 dims (an
   * UNKNOWN marker a downstream filter can drop on). Features stay the
   * deterministic byte-prefix vector — pixel decoding needs real codecs. */
  object HeaderCodec extends MediaCodec {
    def decode(row: MediaRow): MediaFeatures = {
      val parsed = parseImageHeader(row.bytes)
      MediaFeatures(
        id = row.id,
        kind = parsed.fold(row.kind)(_._1),
        nBytes = row.bytes.length.toLong,
        width = parsed.fold(0)(_._2),
        height = parsed.fold(0)(_._3),
        durationMs = 0L,
        features = Array.tabulate(8)(i =>
          if (i < row.bytes.length) (row.bytes(i) & 0xFF).toFloat / 256f else 0f))
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

  /** Minimal VALID header bytes for the three containers — deterministic
   * fixture builders (fixed length per format) for tests and the m2 gate.
   * The parser reads only the fields set here; CRC/entropy payloads are
   * zeroed (legal for header-level metadata extraction). */
  object Headers {
    /** 33 bytes: signature(8) + IHDR chunk(4 len + 4 type + 13 data + 4 crc). */
    def png(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(33)
      b.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      b.putInt(13).put("IHDR".getBytes("US-ASCII"))
      b.putInt(w).putInt(h)
      b.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      b.putInt(0) // crc not validated by header parse
      b.array()
    }
    /** 13 bytes: "GIF89a"(6) + logical screen descriptor(7), dims LE16. */
    def gif(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("GIF89a".getBytes("US-ASCII"))
      b.putShort(w.toShort).putShort(h.toShort)
      b.put(0x77.toByte).put(0.toByte).put(0.toByte) // packed/bg/aspect, no GCT
      b.array()
    }
    /** 50 bytes: SOI(2) + APP0/JFIF(18) + COM(9) + SOF0(19) + EOI(2) — the
     * COM segment before SOF exercises the marker-scan skip path. */
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(50)
      b.put(0xFF.toByte).put(0xD8.toByte)                       // SOI
      b.put(0xFF.toByte).put(0xE0.toByte).putShort(16.toShort)  // APP0 len 16
      b.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      b.put(1.toByte).put(2.toByte)                             // version 1.2
      b.put(0.toByte).putShort(1.toShort).putShort(1.toShort)   // units/density
      b.put(0.toByte).put(0.toByte)                             // no thumbnail
      b.put(0xFF.toByte).put(0xFE.toByte).putShort(7.toShort)   // COM len 7
      b.put("graft".getBytes("US-ASCII"))
      b.put(0xFF.toByte).put(0xC0.toByte).putShort(17.toShort)  // SOF0 len 17
      b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)   // precision, H, W
      b.put(3.toByte)                                           // 3 components
      b.put(1.toByte).put(0x22.toByte).put(0.toByte)
      b.put(2.toByte).put(0x11.toByte).put(1.toByte)
      b.put(3.toByte).put(0x11.toByte).put(1.toByte)
      b.put(0xFF.toByte).put(0xD9.toByte)                       // EOI
      b.array()
    }
  }

  /** Deterministic REAL-container fixture table from any (id) source: one
   * image payload per row, format cycling png/gif/jpeg, dims derived from
   * the id (u16-safe). The m2 gate decodes these with [[HeaderCodec]] and
   * the oracle recomputes the dims arithmetically — a wrong parse cannot
   * hash-match. */
  def imageRows(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val w = (1 + id % 1920).toInt
      val h = (1 + id % 1080).toInt
      val bytes = (id % 3) match {
        case 0 => Headers.png(w, h)
        case 1 => Headers.gif(w, h)
        case _ => Headers.jpeg(w, h)
      }
      MediaRow(id, "image", bytes)
    }
  }

  /** Driver-query surface for the real header decode (m2 gate). */
  def imageHeaderFeatures(df: DataFrame, idCol: String): DataFrame =
    decodeAll(imageRows(df, idCol), HeaderCodec).toDF()
      .select(col("id"), col("kind"), col("width"), col("height"),
        col("nBytes").as("n_bytes"))

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
