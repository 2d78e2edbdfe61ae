package graft

import graft.operators.Multimodal
import graft.operators.Multimodal._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def mk(id: Long, kind: String, payload: String,
                 w: Int, h: Int, sr: Int, dur: Long) = {
    val b = payload.getBytes("UTF-8")
    MediaRecord(id, kind, b,
      MediaMeta("raw", w, h, sr, dur, b.length.toLong, FakeCodec.md5Hex(b)))
  }
  private def media = Seq(
    mk(1L, "image", "imgbytes", 640, 480, 0, 0L),
    mk(2L, "audio", "audiobytes", 0, 0, 16000, 2500L),
    mk(3L, "video", "0123456789", 640, 480, 0, 3500L)
  ).toDS()

  test("decodeFeatures: batch shape and determinism") {
    val out = decodeFeatures(media, dim = 8).collect().sortBy(_.mediaId)
    assert(out.length === 3)
    assert(out.forall(_.features.length === 8))
    assert(out.forall(f => f.features.forall(v => v >= 0f && v < 1f)))
    // deterministic: same input -> same features
    val again = decodeFeatures(media, dim = 8).collect().sortBy(_.mediaId)
    assert(out.map(_.features.toSeq).toSeq === again.map(_.features.toSeq).toSeq)
    assert(out.head.fp === FakeCodec.md5Hex("imgbytes".getBytes("UTF-8")))
  }

  test("resizeImages touches only images and updates metadata") {
    val out = resizeImages(media, 64, 64).collect().sortBy(_.mediaId)
    assert(out(0).meta.width === 64 && out(0).meta.height === 64)
    // payload-derived metadata stays in sync with the mutated bytes
    assert(out(0).meta.fp === FakeCodec.md5Hex(out(0).bytes))
    assert(out(0).meta.nBytes === out(0).bytes.length.toLong)
    assert(out(1).meta.sampleRate === 16000)           // audio untouched
    assert(out(1).bytes.toSeq === "audiobytes".getBytes("UTF-8").toSeq)
    assert(out(2).meta.width === 640)                  // video untouched
  }

  test("sampleFrames: ceil(duration/interval) frames, executor-side fanout") {
    val frames = sampleFrames(media, intervalMs = 1000L).collect().sortBy(_.frameIdx)
    assert(frames.forall(_.mediaId === 3L))            // only the video
    assert(frames.length === 4)                        // ceil(3500/1000)
    assert(frames.map(_.tsMs).toSeq === Seq(0L, 1000L, 2000L, 3000L))
    assert(frames.flatMap(_.bytes).length <= 10)
  }

  test("metaSummary never needs payload decode and matches documents") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val out = Multimodal.metaSummary(mediaFromDocuments(docs))
    assert(out.count() === docs.count())
    assert(out.columns.toSeq ===
      Seq("media_id", "kind", "n_bytes", "fmt", "width", "height", "fp"))
    val kinds = out.select("kind").distinct().as[String].collect().toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  /** Real 32×32 PNG: left half black, right half white — grid-cell
    * luminance features are exactly predictable. */
  private def pngFixture: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32)
      img.setRGB(x, y, if (x < 16) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("real PNG decodes through javax.imageio end-to-end (no stub)") {
    val png = pngFixture
    val real = MediaRecord(10L, "image", png,
      MediaMeta("png", 32, 32, 0, 0L, png.length.toLong, FakeCodec.md5Hex(png)))
    val mixed = Seq(real, mk(11L, "audio", "audiobytes", 0, 0, 16000, 2500L)).toDS()
    val out = decodeFeatures(mixed, dim = 4).collect().sortBy(_.mediaId)
    // 2×2 grid over half-black/half-white: cells (0,0)/(1,0) black,
    // (0,1)/(1,1) white — content-derived, not md5-derived
    val f = out(0).features
    assert(f(0) < 0.01f && f(2) < 0.01f, s"left cells must be black: ${f.toSeq}")
    assert(f(1) > 0.99f && f(3) > 0.99f, s"right cells must be white: ${f.toSeq}")
    assert(f.toSeq != FakeCodec.decodeFeatures(png, 4).toSeq,
      "image payload must NOT route to the stub")
    // the audio record still degrades to the deterministic stub
    assert(out(1).features.toSeq ===
      FakeCodec.decodeFeatures("audiobytes".getBytes("UTF-8"), 4).toSeq)
  }

  test("real PNG resize produces a decodable PNG with the target dims") {
    val png = pngFixture
    val rec = MediaRecord(12L, "image", png,
      MediaMeta("png", 32, 32, 0, 0L, png.length.toLong, FakeCodec.md5Hex(png)))
    val out = resizeImages(Seq(rec).toDS(), 16, 8).collect().head
    assert(out.meta.width === 16 && out.meta.height === 8)
    val back = ImageIoCodec.tryRead(out.bytes)
    assert(back.isDefined, "resized payload must be a real decodable image")
    assert(back.get.getWidth === 16 && back.get.getHeight === 8)
    // content survives the resize: left still dark, right still bright
    val f = ImageIoCodec.decodeFeatures(out.bytes, 4)
    assert(f(0) < 0.1f && f(1) > 0.9f, s"resize must preserve content: ${f.toSeq}")
    assert(out.meta.fp === FakeCodec.md5Hex(out.bytes))
  }

  test("real JPEG decodes and resizes through javax.imageio (lossy codec tolerances)") {
    // same half-black/half-white scene, JPEG-encoded: lossy, so
    // assertions use tolerances instead of exact luminances
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32)
      img.setRGB(x, y, if (x < 16) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos), "JDK must carry a JPEG writer")
    val jpg = baos.toByteArray
    assert(jpg.length >= 2 && (jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8,
      "fixture must be a real JPEG (SOI marker)")
    val rec = MediaRecord(13L, "image", jpg,
      MediaMeta("jpg", 32, 32, 0, 0L, jpg.length.toLong, FakeCodec.md5Hex(jpg)))
    val f = decodeFeatures(Seq(rec).toDS(), dim = 4).collect().head.features
    assert(f(0) < 0.15f && f(2) < 0.15f, s"left cells dark: ${f.toSeq}")
    assert(f(1) > 0.85f && f(3) > 0.85f, s"right cells bright: ${f.toSeq}")
    assert(f.toSeq != FakeCodec.decodeFeatures(jpg, 4).toSeq,
      "JPEG payload must NOT route to the stub")
    val resized = resizeImages(Seq(rec).toDS(), 8, 8).collect().head
    val back = ImageIoCodec.tryRead(resized.bytes)
    assert(back.isDefined && back.get.getWidth === 8 && back.get.getHeight === 8)
  }

  test("binaryFiles source: glob filter, size guard, metadata-only prunes content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "a.img").toPath,
        Array.fill[Byte](100)(1))
      java.nio.file.Files.write(new java.io.File(dir, "b.img").toPath,
        Array.fill[Byte](5000)(2))
      java.nio.file.Files.write(new java.io.File(dir, "c.txt").toPath,
        Array.fill[Byte](10)(3))
      val all = graft.sources.Readers.binaryFiles(spark, dir.getAbsolutePath,
        glob = Some("*.img"))
      assert(all.count() === 2, "glob must exclude c.txt")
      val guarded = graft.sources.Readers.binaryFiles(spark, dir.getAbsolutePath,
        glob = Some("*.img"), maxBytes = 1000)
      val rows = guarded.select("length", "content").collect()
      assert(rows.length === 1 && rows.head.getAs[Array[Byte]]("content").length === 100)
      // metadata-only projection prunes the payload from the read schema
      val metaPlan = all.select("path", "length")
        .queryExecution.executedPlan.toString
      assert(!metaPlan.contains("content"),
        s"metadata projection must not read payloads:\n$metaPlan")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
