package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal (image/audio/video) column handling.
 *
 * Media is carried as an opaque `binary` column plus a typed metadata
 * struct — the layout a 100 TB training-data lake actually uses
 * (parquet binary chunks + queryable metadata columns, so filters on
 * kind/size/dims prune without touching payload bytes; parquet column
 * pruning means metadata-only queries never read the blobs at all).
 *
 * Decode/resize/frame-sample run per-partition over typed records
 * ([[Dataset]] + `mapPartitions`) — the Scala-native equivalent of a
 * batched decode UDF: one iterator per partition, no driver
 * round-trip, codec state reusable across a partition's records.
 * The actual codec call is STUBBED ([[FakeCodec]] — this container
 * ships no image/audio libraries); the stub is deterministic
 * (md5-derived) so plumbing is oracle- and spec-testable. Swapping in
 * a real codec changes only [[FakeCodec]]'s body: schema, batch
 * shape, partitioning and signatures all stay.
 */
object Multimodal {

  /** Typed media metadata (parquet-queryable without payload reads).
    * `nBytes`/`fp` are computed ONCE where the payload is created or
    * mutated, so metadata-only queries never have to read the blob to
    * report size or fingerprint. */
  final case class MediaMeta(
      format: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long,
      nBytes: Long, fp: String)

  /** One media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      mediaId: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)

  /** Decoded features for one media item. */
  final case class MediaFeatures(
      mediaId: Long, kind: String, nBytes: Long, fp: String,
      features: Array[Float])

  /**
   * STUB codec — deterministic stand-in for image/audio decoding.
   * Real implementation would call an image/audio library here; the
   * container has none, so features are md5-derived pseudo-floats.
   * Everything downstream of this object is real Spark plumbing.
   */
  object FakeCodec {
    def md5Hex(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString

    /** `dim` floats in [0,1) unrolled from the payload digest. */
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val h = md5Hex(bytes)
      Array.tabulate(dim) { i =>
        val hex = h.substring((i * 4) % 28, (i * 4) % 28 + 4)
        Integer.parseInt(hex, 16).toFloat / 65536f
      }
    }

    /** "Resize": deterministic payload for the new dims. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      (md5Hex(bytes) + s":${w}x$h").getBytes("UTF-8")
  }

  /**
   * Documents table → media records: payload = UTF-8 text bytes,
   * kind round-robins image/audio/video, metadata derived from
   * doc length. Deterministic, so the whole multimodal path has a
   * DuckDB oracle despite the stubbed codec.
   */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("mediaId"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"),
        struct(
          lit("raw").as("format"),
          (col("n_chars") % 640 + 1).cast("int").as("width"),
          (col("n_chars") % 480 + 1).cast("int").as("height"),
          lit(16000).as("sampleRate"),
          (col("n_chars") * 10).cast("long").as("durationMs"),
          length(encode(col("text"), "UTF-8")).cast("long").as("nBytes"),
          md5(encode(col("text"), "UTF-8")).as("fp")).as("meta"))
      .as[MediaRecord]
  }

  /**
   * Batched decode: one pass per partition, `dim` features per item.
   * This is the operator a real pipeline runs over billions of blobs;
   * partition count (not row count) bounds codec-state allocations.
   */
  def decodeFeatures(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.mediaId, m.kind, m.bytes.length.toLong,
          FakeCodec.md5Hex(m.bytes), FakeCodec.decodeFeatures(m.bytes, dim))
      }
    }
  }

  /** Resize images to (w, h); non-images pass through untouched. */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      if (m.kind == "image") {
        val resized = FakeCodec.resize(m.bytes, w, h)
        m.copy(bytes = resized,
          meta = m.meta.copy(width = w, height = h,
            nBytes = resized.length.toLong, fp = FakeCodec.md5Hex(resized)))
      } else m
    })
  }

  /**
   * Frame sampling: every video yields ⌈duration/intervalMs⌉ frame
   * records (payload chunk + frame index). The fan-out happens
   * executor-side inside one iterator — no shuffle, no driver loop.
   */
  final case class Frame(mediaId: Long, frameIdx: Int, tsMs: Long, bytes: Array[Byte])

  def sampleFrames(media: Dataset[MediaRecord], intervalMs: Long = 1000L): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions(_.flatMap { m =>
      val n = math.max(1L, (m.meta.durationMs + intervalMs - 1) / intervalMs).toInt
      val chunk = math.max(1, m.bytes.length / n)
      (0 until n).iterator.map { i =>
        val from = math.min(i * chunk, m.bytes.length)
        val until = math.min(from + chunk, m.bytes.length)
        Frame(m.mediaId, i, i * intervalMs, java.util.Arrays.copyOfRange(m.bytes, from, until))
      }
    })
  }

  /** Metadata-only summary — the plan reads ONLY the metadata struct
    * (size and fingerprint live there, written at payload creation),
    * so parquet column pruning genuinely drops the binary column. */
  def metaSummary(media: Dataset[MediaRecord]): DataFrame =
    media.toDF().select(
      col("mediaId").as("media_id"), col("kind"),
      col("meta.nBytes").as("n_bytes"),
      col("meta.format").as("fmt"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.fp").as("fp"))

  /** The SparkEntry query: documents → media → metadata summary. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    metaSummary(mediaFromDocuments(
      graft.sources.Readers.table(spark, dir, "documents")))
}
