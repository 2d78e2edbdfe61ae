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
 * Codecs are pluggable behind [[Codec]]: [[ImageIoCodec]] is a REAL
 * pure-JVM image path (javax.imageio — PNG/BMP/GIF/JPEG ship with the
 * JDK, no new dependencies); [[FakeCodec]] is the deterministic
 * md5-derived stand-in for formats the JVM cannot decode (audio/video
 * — this container ships no media libraries). The default
 * [[AutoCodec]] probes each payload and routes: decodable images get
 * real features/resizes, everything else degrades to the stub, so the
 * catalog's text-payload oracle is unaffected while real fixtures
 * exercise the real path (MultimodalSpec).
 */
object Multimodal {

  /** Pluggable per-payload codec (executor-side, serializable). */
  trait Codec extends Serializable {
    /** `dim` floats summarizing the payload. */
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float]
    /** Re-encoded payload at (w, h). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
    /** Kind-aware hook — default ignores the kind; [[AutoCodec]]
      * overrides it to skip image probing for payloads declared
      * audio/video (a per-blob ImageIO reader probe is pure waste at
      * billions of blobs, and a container whose leading bytes happen
      * to parse as an image must not get image features). */
    def decodeFeatures(kind: String, bytes: Array[Byte], dim: Int): Array[Float] =
      decodeFeatures(bytes, dim)
  }

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
   * STUB codec — deterministic stand-in for payloads the JVM cannot
   * decode (audio/video; the container ships no media libraries).
   * Features are md5-derived pseudo-floats, so plumbing stays oracle-
   * and spec-testable.
   */
  object FakeCodec extends Codec {
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
   * REAL image codec on nothing but the JDK: `javax.imageio` decodes
   * PNG/BMP/GIF/JPEG/WBMP. Features are grid-cell mean luminances
   * (image split into a row-major ⌈√dim⌉ grid, per-cell average of
   * Rec.601 luma, [0,1]) — deterministic, content-derived, and
   * resolution-invariant enough for near-dup screening. Resize paints
   * into a fresh RGB raster and re-encodes PNG (deterministic: no
   * dithering, no timestamped metadata).
   */
  object ImageIoCodec extends Codec {
    // executors have no display: force headless before any AWT class
    // loads (harmless if already set)
    System.setProperty("java.awt.headless", "true")

    def tryRead(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
      featuresOf(tryRead(bytes).getOrElse(
        throw new IllegalArgumentException("payload is not a JVM-decodable image")), dim)

    private[operators] def featuresOf(img: java.awt.image.BufferedImage,
                                      dim: Int): Array[Float] = {
      val g = math.ceil(math.sqrt(dim.toDouble)).toInt
      val (w, h) = (img.getWidth, img.getHeight)
      val sums = new Array[Double](g * g)
      val counts = new Array[Long](g * g)
      var y = 0
      while (y < h) {
        val cy = math.min(y * g / h, g - 1)
        var x = 0
        while (x < w) {
          val cx = math.min(x * g / w, g - 1)
          val rgb = img.getRGB(x, y)
          val luma = 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          val cell = cy * g + cx
          sums(cell) += luma / 255.0
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(dim) { i =>
        if (i < g * g && counts(i) > 0) (sums(i) / counts(i)).toFloat else 0f
      }
    }

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      resizeImg(tryRead(bytes).getOrElse(
        throw new IllegalArgumentException("payload is not a JVM-decodable image")), w, h)

    private[operators] def resizeImg(img: java.awt.image.BufferedImage,
                                     w: Int, h: Int): Array[Byte] = {
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = out.createGraphics()
      try gfx.drawImage(img, 0, 0, w, h, null) finally gfx.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }
  }

  /** Default codec: decodable images take the REAL javax.imageio path,
    * everything else (audio/video/non-image bytes) degrades to the
    * deterministic stub — so pipelines run end-to-end regardless of
    * payload mix, and text-payload oracles are unchanged. */
  object AutoCodec extends Codec {
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
      ImageIoCodec.tryRead(bytes) match {
        case Some(img) => ImageIoCodec.featuresOf(img, dim)
        case None => FakeCodec.decodeFeatures(bytes, dim)
      }

    override def decodeFeatures(kind: String, bytes: Array[Byte],
                                dim: Int): Array[Float] =
      if (kind == "image") decodeFeatures(bytes, dim)
      else FakeCodec.decodeFeatures(bytes, dim)

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      ImageIoCodec.tryRead(bytes) match {
        case Some(img) => ImageIoCodec.resizeImg(img, w, h)
        case None => FakeCodec.resize(bytes, w, h)
      }
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
  def decodeFeatures(media: Dataset[MediaRecord], dim: Int = 8,
                     codec: Codec = AutoCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.mediaId, m.kind, m.bytes.length.toLong,
          FakeCodec.md5Hex(m.bytes), codec.decodeFeatures(m.kind, m.bytes, dim))
      }
    }
  }

  /** Resize images to (w, h); non-images pass through untouched. */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int,
                   codec: Codec = AutoCodec): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      if (m.kind == "image") {
        val resized = codec.resize(m.bytes, w, h)
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
