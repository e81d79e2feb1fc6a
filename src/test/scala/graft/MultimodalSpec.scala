package graft

import graft.multimodal.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fromDocuments(Tables.documents(spark, sfDir))
  private val codec = () => new Multimodal.StubCodec: Multimodal.MediaCodec

  test("media frame carries payload + typed metadata") {
    val m = media
    assert(m.schema("payload").dataType.typeName == "binary")
    val r = m.orderBy("media_id").head()
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[String]("kind") == "image")
    assert(meta.getAs[Long]("n_bytes") > 0)
    assert(r.getAs[Array[Byte]]("payload").length == meta.getAs[Long]("n_bytes"))
  }

  test("extractFeatures: per-partition decode, normalized histogram features") {
    val f = Multimodal.extractFeatures(media, codec)
    val row = f.orderBy("media_id").head()
    val feats = row.getSeq[Float](row.fieldIndex("features"))
    assert(feats.length == 16)
    assert(math.abs(feats.sum - 1.0f) < 1e-3)  // normalized histogram
    assert(f.count() == media.count())
  }

  test("resizeAll bounds payload size") {
    val r = Multimodal.resizeAll(media, 8, 8, codec)
    val sizes = r.select(length(col("payload")).as("n")).as[Int].collect()
    assert(sizes.forall(_ <= 64))
  }

  test("sampleFrames: stride slicing capped at 8 frames") {
    val fr = Multimodal.sampleFrames(media, everyMs = 64, codec)
    val counts = fr.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    val bytes = media.select(col("media_id"), col("meta.n_bytes")).as[(Long, Long)]
      .collect().toMap
    counts.foreach { case (id, n) =>
      assert(n == math.min(math.ceil(bytes(id) / 64.0).toLong, 8L))
    }
  }

  test("repartitionForDecode sizes partitions by bytes") {
    val m = Multimodal.repartitionForDecode(media, targetBytesPerPartition = 10000)
    val total = media.agg(sum("meta.n_bytes")).head().getLong(0)
    assert(m.rdd.getNumPartitions == math.ceil(total / 10000.0).toInt)
  }

  // --- real image codec (javax.imageio — no external dependency) ---

  private def gray(g: Int): Int = (g << 16) | (g << 8) | g

  test("ImageIOCodec decodes a known 2x2 PNG to exact pixel features") {
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, gray(0))    // bin 0
    img.setRGB(1, 0, gray(16))   // bin 1
    img.setRGB(0, 1, gray(255))  // bin 15
    img.setRGB(1, 1, gray(240))  // bin 15
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val payload = bos.toByteArray
    val c = new Multimodal.ImageIOCodec
    assert(c.imageSize(payload) == (2, 2))
    val f = c.decodeImage(payload)
    val expect = Array.tabulate(16)(i =>
      if (i == 0 || i == 1) 0.25f else if (i == 15) 0.5f else 0f)
    assert(f.toSeq == expect.toSeq)
  }

  test("ImageIOCodec resize redraws to the requested dims, still a PNG") {
    val c = new Multimodal.ImageIOCodec
    val p = Multimodal.syntheticPng(42L, 8, 8)
    val r = c.resize(p, 4, 2)
    assert(c.imageSize(r) == (4, 2))
    // PNG magic: a real re-encode, not a byte-slice
    assert((r(0) & 0xFF) == 0x89 && r(1) == 'P'.toByte)
  }

  test("syntheticPng decode recovers the closed-form histogram exactly") {
    val c = new Multimodal.ImageIOCodec
    for (id <- Seq(0L, 7L, 123456L)) {
      val (w, h) = Multimodal.syntheticDims(id)
      val f = c.decodeImage(Multimodal.syntheticPng(id, w, h))
      val expect = new Array[Int](16)
      for (y <- 0 until h; x <- 0 until w)
        expect((((id % 1000003L) * 31L + x * 7L + y * 13L) % 256L).toInt >> 4) += 1
      val got = f.map(v => math.round(v * w * h))
      assert(got.toSeq == expect.toSeq, s"id=$id")
    }
  }

  test("imageMeta's genuine decode agrees with the generator's meta") {
    val m = Multimodal.fromSyntheticImages(Tables.documents(spark, sfDir))
    val bad = Multimodal.imageMeta(m)
      .join(m.select(col("media_id"), col("meta.width").as("mw"),
        col("meta.height").as("mh")), Seq("media_id"))
      .filter(col("width") =!= col("mw") || col("height") =!= col("mh"))
      .count()
    assert(bad == 0)
    assert(Multimodal.imageMeta(m).count() == m.count())
  }

  // --- real video codec (animated GIF via javax.imageio) ---

  test("syntheticGif sampleFrames honors GIF frame delays, recovers exact pixels") {
    val (id, w, h, nf) = (9L, 5, 4, 4)
    val gif = Multimodal.syntheticGif(id, w, h, nf, frameMs = 100)
    assert(gif(0) == 'G'.toByte && gif(1) == 'I'.toByte) // real container
    val c = new Multimodal.ImageIOCodec
    // 4 frames × 100 ms sampled at 150 ms → stamps 0,150,300 showing
    // frames 0,1,3 (frame = t div 100)
    val frames = c.sampleFrames(gif, everyMs = 150)
    assert(frames.length == 3)
    val base = (id % 1000003L) * 31L
    for ((png, i) <- frames.zipWithIndex) {
      val f = Seq(0, 1, 3)(i)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val expect = ((base + x * 7L + y * 13L + f * 17L) % 256L).toInt
        assert(((img.getRGB(x, y) >> 16) & 0xFF) == expect,
          s"sample $i frame $f pixel ($x,$y)")
      }
    }
    // everyMs = 100 hits every frame once
    assert(c.sampleFrames(gif, everyMs = 100).length == nf)
  }

  test("ImageIOCodec sampleFrames THROWS on non-GIF video by default") {
    val c = new Multimodal.ImageIOCodec
    // a minimal mp4-signature payload: size box + 'ftyp' brand
    val mp4 = Array[Byte](0, 0, 0, 24, 'f', 't', 'y', 'p',
      'i', 's', 'o', 'm') ++ Array.fill[Byte](64)(7)
    val e = intercept[IllegalArgumentException] {
      c.sampleFrames(mp4, everyMs = 64)
    }
    assert(e.getMessage.contains("allowStubFallback"))
  }

  test("ImageIOCodec stride-slice stub off-GIF is explicit opt-in only") {
    val c = new Multimodal.ImageIOCodec(allowStubFallback = true)
    val raw = Array.tabulate[Byte](300)(_.toByte)
    val fr = c.sampleFrames(raw, everyMs = 64)
    assert(fr.length == math.min(math.ceil(300 / 64.0).toInt, 8))
    assert(fr.head.toSeq == raw.take(64).toSeq)
  }

  test("sampleFrameImages composites partial frames at their offsets") {
    // frame 0: full 4x4 canvas, gray 10; frame 1: 2x2 patch at (1,1),
    // gray 200, disposal none — a player shows the patch OVER frame 0,
    // so sample 1 must be the 4x4 composite, not the raw 2x2 rect
    import java.awt.image.BufferedImage
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    def grayImg(w: Int, h: Int, v: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, gray(v))
      img
    }
    def writeFrame(img: BufferedImage, x: Int, y: Int): Unit = {
      val param = writer.getDefaultWriteParam
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), param)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = meta.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val desc = root.getElementsByTagName("ImageDescriptor").item(0)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      desc.setAttribute("imageLeftPosition", x.toString)
      desc.setAttribute("imageTopPosition", y.toString)
      val gce = new javax.imageio.metadata.IIOMetadataNode(
        "GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", "10") // 100 ms
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, meta), param)
    }
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      writeFrame(grayImg(4, 4, 10), 0, 0)
      writeFrame(grayImg(2, 2, 200), 1, 1)
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    val c = new Multimodal.ImageIOCodec
    val samples = c.sampleFrameImages(bos.toByteArray, everyMs = 100)
    assert(samples.length == 2)
    val s1 = samples(1)
    assert(s1.getWidth == 4 && s1.getHeight == 4) // canvas, not the rect
    for (y <- 0 until 4; x <- 0 until 4) {
      val expect = if (x >= 1 && x <= 2 && y >= 1 && y <= 2) 200 else 10
      assert(((s1.getRGB(x, y) >> 16) & 0xFF) == expect, s"pixel ($x,$y)")
    }
    // sample 0 is frame 0 untouched
    for (y <- 0 until 4; x <- 0 until 4)
      assert(((samples(0).getRGB(x, y) >> 16) & 0xFF) == 10)
  }

  test("frameGraySums emits a null-feature row for non-GIF payloads") {
    val rows = Seq(
      (1L, Multimodal.syntheticGif(1L, 3, 3, 2, 100),
        ("video", "gif", 3, 3, 200L, 0L)),
      (2L, Array.tabulate[Byte](50)(_.toByte), // not a GIF
        ("video", "mp4", 0, 0, 0L, 50L)))
      .toDF("media_id", "payload", "meta")
    val got = Multimodal.frameGraySums(rows, everyMs = 100)
      .orderBy("media_id", "sample_idx")
      .collect()
    val byId = got.groupBy(_.getLong(0))
    assert(byId(1L).forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
    assert(byId(2L).length == 1 &&
      byId(2L).head.isNullAt(1) && byId(2L).head.isNullAt(2))
  }

  test("frameGraySums matches the closed form for every sampled frame") {
    val docs = Seq(0L, 3L, 11L, 123456L).toDF("doc_id")
    val got = Multimodal.frameGraySums(
      Multimodal.fromSyntheticVideos(docs), everyMs = 150)
      .orderBy("media_id", "sample_idx")
      .as[(Long, Int, Long)].collect()
    val expect = for {
      id <- Seq(0L, 3L, 11L, 123456L).sorted
      (w, h) = Multimodal.syntheticDims(id)
      nf = Multimodal.syntheticFrameCount(id)
      (t, i) <- (0L until nf * 100L by 150L).zipWithIndex
    } yield {
      val f = t / 100
      val base = (id % 1000003L) * 31L
      val s = (for (y <- 0 until h; x <- 0 until w)
        yield (base + x * 7L + y * 13L + f * 17L) % 256L).sum
      (id, i, s)
    }
    assert(got.toSeq == expect)
  }

  // --- real audio codec (javax.sound.sampled — no external dependency) ---

  test("syntheticWav decodes through AudioSystem to the closed-form features") {
    val id = 17L
    val n = Multimodal.syntheticSampleCount(id)
    val wav = Multimodal.syntheticWav(id, n)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    // genuine decode path: AudioSystem parses the container
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFormat.getSampleRate == 8000f)
    assert(in.getFrameLength == n)
    in.close()
    val base = (id % 1000003L) * 31L
    val samples = (0 until n).map(i => (base + i * 7919L) % 65536L - 32768L)
    val feats = Multimodal.audioFeatures(
      Multimodal.fromSyntheticAudio(Seq(id).toDF("doc_id")))
      .as[(Long, Long, Int, Long, Long)].head()
    assert(feats == ((id, n.toLong, 8000, samples.map(math.abs).sum,
      samples.map(math.abs).max)))
  }

  // --- real-file ingestion (spark.read.format("binaryFile")) ---

  /** Mixed-size file tree: a handful of "4K videos" 100× the size of a
    * crowd of thumbnails, nested one directory deep. */
  private def writeTree(root: java.nio.file.Path): Map[String, Array[Byte]] = {
    val sub = root.resolve("nested")
    java.nio.file.Files.createDirectories(sub)
    def put(p: java.nio.file.Path, seed: Int, n: Int): (String, Array[Byte]) = {
      val bytes = Array.tabulate[Byte](n)(i => ((i * seed + seed) % 251).toByte)
      java.nio.file.Files.write(p, bytes)
      // keyed by file NAME: Spark renders the path as a Hadoop URI whose
      // slash count differs from java.nio's
      (p.getFileName.toString, bytes)
    }
    (Seq.tabulate(40)(i => put(root.resolve(f"thumb_$i%02d.png"), i + 1, 1000 + i)) ++
      Seq.tabulate(3)(i => put(sub.resolve(s"clip_$i.mp4"), 100 + i, 120000 + i)) ++
      Seq(put(root.resolve("track.wav"), 7, 5000),
          put(root.resolve("notes.txt"), 9, 800))).toMap
  }

  test("fromBinaryFiles reads a real file tree into the media schema") {
    val root = java.nio.file.Files.createTempDirectory("graft_media")
    try {
      val files = writeTree(root)
      val m = Multimodal.fromBinaryFiles(spark, root.toString)
      // schema = mediaSchema + provenance path (nullability aside — file
      // metadata columns arrive non-nullable-agnostic from the source)
      assert(m.schema.fields.take(3).map(f => (f.name, f.dataType.catalogString)).toSeq
        == Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType.catalogString)).toSeq)
      val rows = m.select("path", "payload", "meta.kind", "meta.format",
        "meta.n_bytes").collect()
      assert(rows.length == files.size) // recursive lookup found the nested clips
      rows.foreach { r =>
        val want = files(r.getString(0).split('/').last)
        assert(r.getAs[Array[Byte]](1).toSeq == want.toSeq, r.getString(0))
        assert(r.getLong(4) == want.length.toLong)
      }
      val kinds = rows.map(r => (r.getString(3), r.getString(2))).toMap
      assert(kinds("png") == "image" && kinds("mp4") == "video" &&
        kinds("wav") == "audio" && kinds("txt") == "binary")
      // media_id is a stable path hash → unique here
      assert(m.select("media_id").distinct().count() == files.size)
      // glob pushdown: only matching payloads are read
      val pngs = Multimodal.fromBinaryFiles(spark, root.toString,
        glob = Some("*.png"))
      assert(pngs.count() == 40)
      assert(pngs.select("meta.format").distinct().head().getString(0) == "png")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("repartitionForDecode byte-balances a genuinely skewed file tree") {
    val root = java.nio.file.Files.createTempDirectory("graft_media_skew")
    try {
      writeTree(root)
      val m = Multimodal.fromBinaryFiles(spark, root.toString)
      val target = 60000L
      val maxFile = m.agg(max("meta.n_bytes")).head().getLong(0)
      val binned = Multimodal.repartitionForDecode(m, target)
      val perPart = binned.rdd.mapPartitions { it =>
        Iterator.single(it.map(r =>
          Option(r.getAs[Array[Byte]]("payload")).map(_.length.toLong)
            .getOrElse(0L)).sum)
      }.collect()
      // every row survives, and no decode task sees more than one bin's
      // worth of bytes plus a single over-boundary file
      assert(binned.count() == m.count())
      assert(perPart.max <= target + maxFile,
        s"max partition ${perPart.max} vs bound ${target + maxFile}")
      // the 3 big clips (2x the target each) cannot share one task
      val clipsPerPart = binned.rdd.mapPartitions { it =>
        Iterator.single(it.count(r =>
          Option(r.getAs[Array[Byte]]("payload")).exists(_.length >= 120000)))
      }.collect()
      assert(clipsPerPart.max <= 1, clipsPerPart.toSeq.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("videoFrameHashes: per-frame dHash through the real GIF path") {
    // id 5 -> 6 frames, sampled at 150ms over 100ms frames -> 4 samples
    // hitting frames 0,1,3,4
    val docs = Seq(5L).toDF("doc_id")
    val got = Multimodal.videoFrameHashes(
      Multimodal.fromSyntheticVideos(docs), everyMs = 150L)
      .orderBy("sample_idx").as[(Long, Option[Int], Option[Long])]
      .collect().toSeq
    assert(got.map(_._2) == Seq(Some(0), Some(1), Some(2), Some(3)))
    // each sampled frame's hash equals the still-image dHash of that
    // frame's closed-form pixels (frame term f·17)
    val (w, h) = Multimodal.syntheticDims(5L)
    def frameImg(f: Int) = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (((5L % 1000003L) * 31L + x * 7L + y * 13L + f * 17L) % 256L).toInt
        im.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      im
    }
    val want = Seq(0, 1, 3, 4).map(f => Some(Multimodal.dHash64(frameImg(f))))
    assert(got.map(_._3) == want)
    // consecutive frames hash differently (the f·17 term flips bits)
    assert(got.map(_._3).distinct.size > 1)
    // a non-GIF payload emits the explicit absence row
    val raw = Multimodal.fromDocuments(
      Seq((9L, "not a gif")).toDF("doc_id", "text"))
    val absent = Multimodal.videoFrameHashes(raw, everyMs = 150L)
      .as[(Long, Option[Int], Option[Long])].collect().toSeq
    assert(absent == Seq((9L, None, None)))
  }

  test("audioFingerprint: closed-form parity, non-negative, null-safe") {
    val docs = Seq(1L, 2L, 42L).toDF("doc_id")
    val got = Multimodal.audioFingerprint(Multimodal.fromSyntheticAudio(docs))
      .orderBy("media_id").as[(Long, Option[Long])].collect().toSeq
    // recompute from the closed-form sample function, frame-for-frame
    val want = Seq(1L, 2L, 42L).map { id =>
      val n = Multimodal.syntheticSampleCount(id)
      val base = (id % 1000003L) * 31L
      def s(i: Int): Long = math.abs((base + i * 7919L) % 65536L - 32768L)
      val e = (0 until 64).map { j =>
        (j * n / 64 until (j + 1) * n / 64).map(s).sum }
      val bits = (0 until 63).map(k =>
        if (e(k + 1) > e(k)) 1L << k else 0L).reduce(_ | _)
      id -> Some(bits)
    }
    assert(got == want)
    // bit 63 is structurally clear: the fingerprint is never negative
    assert(got.forall(_._2.exists(_ >= 0L)))
    // null payloads surface as explicit null fingerprints
    val media = Multimodal.fromSyntheticAudio(docs)
      .select(col("media_id"),
        when(col("media_id") === 2L, lit(null).cast("binary"))
          .otherwise(col("payload")).as("payload"))
    val nulls = Multimodal.audioFingerprint(media)
      .filter(col("afp").isNull).as[(Long, Option[Long])].collect().toSeq
    assert(nulls == Seq((2L, None)))
    // UNDECODABLE (non-WAV) payloads also emit null instead of failing
    // the task — the imageDHash absence contract
    val garbage = Multimodal.fromSyntheticAudio(docs)
      .select(col("media_id"),
        when(col("media_id") === 42L,
          lit("not a riff header at all".getBytes("UTF-8")))
          .otherwise(col("payload")).as("payload"))
    val mixed = Multimodal.audioFingerprint(garbage)
      .orderBy("media_id").as[(Long, Option[Long])].collect().toSeq
    assert(mixed.map(_._1) == Seq(1L, 2L, 42L))
    assert(mixed(2)._2.isEmpty && mixed(0)._2.nonEmpty && mixed(1)._2.nonEmpty)
  }

  test("dHash64: re-encode-invariant, pixel-sensitive, null-safe") {
    import java.awt.image.BufferedImage
    def img(w: Int, h: Int, f: (Int, Int) => Int): BufferedImage = {
      val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = f(x, y) & 0xFF; im.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      im
    }
    def png(im: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos); bos.toByteArray
    }
    val base = img(16, 12, (x, y) => 3 * x + 5 * y)
    val h0 = Multimodal.dHash64(base)
    // lossless re-encode (even via BMP) decodes to the same pixels ->
    // SAME hash: the perceptual-dup property format changes can't break
    val reRead = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png(base)))
    assert(Multimodal.dHash64(reRead) == h0)
    // a genuinely different gradient flips comparison bits
    val other = img(16, 12, (x, y) => 200 - 3 * x)
    assert(Multimodal.dHash64(other) != h0)
    // the operator: synthetic corpus hashes equal the direct computation
    // and a null payload yields an explicit null row
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val media = Multimodal.fromSyntheticImages(docs)
    val got = Multimodal.imageDHash(media)
      .orderBy("media_id").as[(Long, Option[Long])].collect().toSeq
    val want = Seq(1L, 2L, 3L).map { id =>
      val (w, h) = Multimodal.syntheticDims(id)
      val im = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.syntheticPng(id, w, h)))
      id -> Some(Multimodal.dHash64(im))
    }
    assert(got == want)
    val withNull = media.select(col("media_id"),
      when(col("media_id") === 2L, lit(null).cast("binary"))
        .otherwise(col("payload")).as("payload"))
    val nulls = Multimodal.imageDHash(withNull)
      .filter(col("dhash").isNull).as[(Long, Option[Long])].collect().toSeq
    assert(nulls == Seq((2L, None)))
  }
}
