package graft

import graft.multimodal.{MediaAsset, Multimodal}
import org.apache.spark.sql.functions._

/** Multimodal binary-column pipeline (SURVEY.md §2.7 #49): schema,
  * frame sampling, per-partition decode, deterministic stub codec. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("media table carries binary bytes + typed metadata") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val row = media.filter(col("doc_id") === 3L).head()
    assert(row.kind == "image") // 3 % 3 == 0
    assert(row.bytes.nonEmpty && row.width >= 16 && row.height >= 16)
    val schema = media.schema
    assert(schema("bytes").dataType.typeName == "binary")
  }

  test("frame sampling: image→1, audio→per-second, video→strided") {
    val assets = Seq(
      MediaAsset(1, "image", Array[Byte](1), 8, 8, 0),
      MediaAsset(2, "audio", Array[Byte](2), 0, 0, 3000),
      MediaAsset(3, "video", Array[Byte](3), 8, 8, 2000)).toDS()
    val sampled = Multimodal.sampleFrames(assets, stride = 10)
      .map { case (a, f) => (a.doc_id, f) }.collect().groupBy(_._1)
    assert(sampled(1L).length == 1)
    assert(sampled(2L).length == 3) // 3 s of audio → 3 clips
    assert(sampled(3L).length == 5) // 50 frames / stride 10
  }

  test("resize mean-pools features to the target dim without shuffling") {
    val feats = Multimodal.extractFeatures(
      Multimodal.sampleFrames(
        Multimodal.mediaFromDocuments(spark, sf).limit(10), stride = 10), 8)
    val resized = Multimodal.resize(feats, 4)
    val r = resized.head()
    assert(r.featDim == 4 && r.feature.length == 4)
    // mean-pooling: first output = mean of first window
    val f = feats.filter(col("doc_id") === r.doc_id && col("frameIdx") === r.frameIdx).head()
    assert(math.abs(r.feature(0) - (f.feature(0) + f.feature(1)) / 2.0f) < 1e-6)
    // narrow stage: resize adds no exchange beyond what its input has
    def nExchanges(df: org.apache.spark.sql.Dataset[_]): Int =
      df.queryExecution.executedPlan.toString.linesIterator.count(_.contains("Exchange"))
    assert(nExchanges(resized) == nExchanges(feats))
  }

  test("real PNG decodes through javax.imageio to exact block-mean luminance") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // 4×2 image: left half black, right half white → with n=2 the
    // row-major first block is the first row (black,black,white,white)
    // and the second block the second row — both mean 0.5
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xffffff)
    val buf = new ByteArrayOutputStream()
    ImageIO.write(img, "png", buf)
    val png = buf.toByteArray

    val feat = Multimodal.ImageIoCodec.decode(png, 2).get
    assert(feat.length == 2)
    // white luma = (255*299+255*587+255*114)/1000/255 = 1.0; mean = 0.5
    assert(feat.forall(v => math.abs(v - 0.5f) < 1e-6f), feat.toSeq)
    // deterministic across decodes
    assert(Multimodal.ImageIoCodec.decode(png, 2).get.toSeq == feat.toSeq)
    // non-image bytes → None (pipeline falls back to the stub)
    assert(Multimodal.ImageIoCodec.decode("not a png".getBytes, 2).isEmpty)
    // JPEG decodes too (lossy — assert structure, not exact values)
    val jbuf = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", jbuf)
    val jfeat = Multimodal.ImageIoCodec.decode(jbuf.toByteArray, 2)
    assert(jfeat.exists(f => f.length == 2 && f.forall(v => v >= 0f && v <= 1f)))

    // end-to-end: a real PNG asset flows through the Spark pipeline
    // (typed Dataset → mapPartitions decode → resize) with the REAL
    // codec, not the stub
    val assets = Seq(MediaAsset(7L, "image", png, 4, 2, 0)).toDS()
    val ctr = Multimodal.codecFallbackCounter(spark)
    val feats = Multimodal.extractFeatures(Multimodal.sampleFrames(assets, 5), 2, Some(ctr))
    val row = feats.head()
    assert(row.feature.toSeq == feat.toSeq,
      "extractFeatures must use the ImageIO path for decodable image bytes")
    val resized = Multimodal.resize(feats, 1).head()
    assert(math.abs(resized.feature(0) - 0.5f) < 1e-6f)

    // the r5 lesson, pinned at the PIPELINE level: a codec outage must
    // be observable, so the full production path over real PNGs must
    // report ZERO stub fallbacks...
    val pipeCtr = Multimodal.codecFallbackCounter(spark)
    val agg = Multimodal.pipelineFrom(
      Seq(MediaAsset(7L, "image", png, 4, 2, 0),
          MediaAsset(8L, "image", jbuf.toByteArray, 4, 2, 0)).toDS(),
      stride = 5, featDim = 2, fallbacks = Some(pipeCtr))
    assert(agg.count() == 2)
    assert(pipeCtr.value == 0L,
      s"real-image e2e pipeline reported ${pipeCtr.value} codec fallbacks — image decode is broken")
    // ...and undecodable image bytes must TICK the counter (an outage
    // can never again ship invisibly behind plausible stub output)
    val badCtr = Multimodal.codecFallbackCounter(spark)
    Multimodal.pipelineFrom(
      Seq(MediaAsset(9L, "image", "not a png".getBytes, 4, 2, 0)).toDS(),
      stride = 5, featDim = 2, fallbacks = Some(badCtr)).count()
    assert(badCtr.value == 1L)
  }

  test("real PCM WAV decodes through javax.sound.sampled to exact loudness envelope") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled._
    // 1000 frames mono 16-bit LE: first half silence, second half
    // full-scale alternating square — slot 0 mean 0, slot 1 mean
    // 32767/32768
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val nFrames = 1000
    val raw = new Array[Byte](nFrames * 2)
    for (f <- 500 until 1000) {
      val v: Short = if (f % 2 == 0) 32767 else -32767
      raw(2 * f) = (v & 0xff).toByte
      raw(2 * f + 1) = ((v >> 8) & 0xff).toByte
    }
    val out = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(new ByteArrayInputStream(raw), fmt, nFrames),
      AudioFileFormat.Type.WAVE, out)
    val wav = out.toByteArray

    val feat = Multimodal.AudioWavCodec.decode(wav, 2).get
    assert(feat(0) == 0.0f, "silent half must pool to zero")
    assert(math.abs(feat(1) - 32767f / 32768f) < 1e-4f, feat.toSeq)
    assert(Multimodal.AudioWavCodec.decode(wav, 2).get.toSeq == feat.toSeq)
    assert(Multimodal.AudioWavCodec.decode("not a wav".getBytes, 2).isEmpty)
    // big-endian branch: the same PCM frames as AIFF (BE by spec)
    // must decode to the identical envelope
    val beFmt = new AudioFormat(8000f, 16, 1, true, true)
    val beRaw = new Array[Byte](nFrames * 2)
    for (f <- 500 until 1000) {
      val v: Short = if (f % 2 == 0) 32767 else -32767
      beRaw(2 * f) = ((v >> 8) & 0xff).toByte
      beRaw(2 * f + 1) = (v & 0xff).toByte
    }
    val beOut = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(new ByteArrayInputStream(beRaw), beFmt, nFrames),
      AudioFileFormat.Type.AIFF, beOut)
    assert(Multimodal.AudioWavCodec.decode(beOut.toByteArray, 2).get.toSeq == feat.toSeq,
      "AIFF (big-endian PCM) must decode to the same envelope")

    // e2e: a real WAV asset flows through the pipeline on the REAL
    // codec path — zero stub fallbacks
    val ctr = Multimodal.codecFallbackCounter(spark)
    val assets = Seq(MediaAsset(11L, "audio", wav, 0, 0, 1000)).toDS()
    val rows = Multimodal.extractFeatures(
      Multimodal.sampleFrames(assets, 5), 2, Some(ctr)).collect()
    assert(rows.length == 1 && rows.head.feature.toSeq == feat.toSeq)
    assert(ctr.value == 0L,
      s"real-WAV e2e reported ${ctr.value} codec fallbacks — audio decode is broken")

    // per-clip windowing: the clips of a 2 s file (silent s, loud s)
    // carry DIFFERENT envelopes — decode pools the clip, not the file
    val fmt2 = new AudioFormat(1000f, 16, 1, true, false)
    val raw2 = new Array[Byte](2000 * 2)
    for (f <- 1000 until 2000) {
      raw2(2 * f) = (32767 & 0xff).toByte
      raw2(2 * f + 1) = ((32767 >> 8) & 0xff).toByte
    }
    val out2 = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(new ByteArrayInputStream(raw2), fmt2, 2000),
      AudioFileFormat.Type.WAVE, out2)
    val wav2 = out2.toByteArray
    assert(Multimodal.AudioWavCodec.decode(wav2, 2, clipSec = 0).get.forall(_ == 0f))
    assert(Multimodal.AudioWavCodec.decode(wav2, 2, clipSec = 1).get
      .forall(v => math.abs(v - 32767f / 32768f) < 1e-4f))
    val clipCtr = Multimodal.codecFallbackCounter(spark)
    val clipRows = Multimodal.extractFeatures(
      Multimodal.sampleFrames(Seq(MediaAsset(12L, "audio", wav2, 0, 0, 2000)).toDS(), 5),
      2, Some(clipCtr)).collect().sortBy(_.frameIdx)
    assert(clipRows.length == 2 && clipRows(0).feature.toSeq != clipRows(1).feature.toSeq,
      "per-second clips must carry per-clip features")
    assert(clipCtr.value == 0L)

    // expected stubbing (non-PCM bytes — compressed audio's stand-in)
    // must NOT tick: only a PCM-domain failure is an outage
    val stubCtr = Multimodal.codecFallbackCounter(spark)
    Multimodal.extractFeatures(
      Multimodal.sampleFrames(
        Seq(MediaAsset(13L, "audio", "mp3-ish junk".getBytes, 0, 0, 1000)).toDS(), 5),
      2, Some(stubCtr)).collect()
    assert(stubCtr.value == 0L,
      "non-PCM audio is the stub's documented domain, not a standing false alarm")
  }

  test("real animated GIF decodes per-frame through javax.imageio, looping past the clip") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.{IIOImage, ImageIO}
    def flat(rgb: Int) = {
      val i = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 4) i.setRGB(x, y, rgb)
      i
    }
    // 2-frame animation: frame 0 all black, frame 1 all white
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    Seq(flat(0x000000), flat(0xffffff)).foreach(f =>
      w.writeToSequence(new IIOImage(f, null, null), w.getDefaultWriteParam))
    w.endWriteSequence(); ios.close()
    val gif = baos.toByteArray

    assert(Multimodal.GifVideoCodec.isGif(gif))
    val f0 = Multimodal.GifVideoCodec.decode(gif, 2, 0).get
    val f1 = Multimodal.GifVideoCodec.decode(gif, 2, 1).get
    assert(f0.forall(v => math.abs(v) < 1e-6f), f0.toSeq)
    assert(f1.forall(v => math.abs(v - 1.0f) < 1e-6f), f1.toSeq)
    // indices past the clip loop instead of stranding on the stub
    assert(Multimodal.GifVideoCodec.decode(gif, 2, 2).get.toSeq == f0.toSeq)
    assert(Multimodal.GifVideoCodec.decode(gif, 2, 5).get.toSeq == f1.toSeq)
    assert(Multimodal.GifVideoCodec.decode("not a gif".getBytes, 2, 0).isEmpty)

    // e2e: durationMs=80 → frame indices 0,1 — both frames decode
    // through the REAL codec with zero fallbacks
    val ctr = Multimodal.codecFallbackCounter(spark)
    val assets = Seq(MediaAsset(11L, "video", gif, 4, 2, durationMs = 80)).toDS()
    val feats = Multimodal
      .extractFeatures(Multimodal.sampleFrames(assets, 1), 2, Some(ctr)).collect()
    assert(feats.length == 2)
    assert(feats.find(_.frameIdx == 0).get.feature.toSeq == f0.toSeq)
    assert(feats.find(_.frameIdx == 1).get.feature.toSeq == f1.toSeq)
    assert(ctr.value == 0L,
      s"real-GIF e2e reported ${ctr.value} codec fallbacks — video decode is broken")
    // bytes CLAIMING to be GIF that don't decode must tick the
    // outage counter (the r5 lesson, now for the video path)
    val badCtr = Multimodal.codecFallbackCounter(spark)
    Multimodal.pipelineFrom(
      Seq(MediaAsset(12L, "video", "GIF89a-garbage".getBytes, 4, 2, 40)).toDS(),
      stride = 1, featDim = 2, fallbacks = Some(badCtr)).count()
    assert(badCtr.value == 1L)
  }

  test("GIF delta frames composite onto the canvas at their descriptor offset") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    // optimized-GIF shape: frame 0 full 4×2 black screen; frame 1 a
    // 1×1 white DELTA rect at (3,1) — the composited frame 1 is the
    // black screen with one white pixel, NOT the raw 1×1 sub-image
    val full = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
    val dot = new BufferedImage(1, 1, BufferedImage.TYPE_INT_RGB)
    dot.setRGB(0, 0, 0xffffff)
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    for ((img, x, y) <- Seq((full, 0, 0), (dot, 3, 1))) {
      val p = w.getDefaultWriteParam
      val md = w.getDefaultImageMetadata(new ImageTypeSpecifier(img), p)
      val tree = md.getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[IIOMetadataNode]
      val kids = tree.getElementsByTagName("ImageDescriptor")
      val desc = kids.item(0).asInstanceOf[IIOMetadataNode]
      desc.setAttribute("imageLeftPosition", x.toString)
      desc.setAttribute("imageTopPosition", y.toString)
      md.setFromTree("javax_imageio_gif_image_1.0", tree)
      w.writeToSequence(new IIOImage(img, null, md), p)
    }
    w.endWriteSequence(); ios.close()
    val gif = baos.toByteArray

    val fs = Multimodal.GifVideoCodec.decodeAll(gif, 2).get
    assert(fs.length == 2)
    // frame 0: all black
    assert(fs(0).forall(v => math.abs(v) < 1e-6f), fs(0).toSeq)
    // frame 1 composited: row 0 still black (block 0 = 0); row 1 has
    // one white pixel in four (block 1 mean luma = 0.25). A raw
    // (non-composited) read would pool the lone white pixel → 1.0.
    assert(math.abs(fs(1)(0)) < 1e-6f, fs(1).toSeq)
    assert(math.abs(fs(1)(1) - 0.25f) < 1e-6f, fs(1).toSeq)
  }

  test("GIF restoreToPrevious disposal reverts the frame's rect before the next frame") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    // frame 0: full 4×2 black screen; frame 1: 1×1 white delta at
    // (3,1) marked restoreToPrevious; frame 2: 1×1 white delta at
    // (0,0). A correct decoder restores (3,1) to black before
    // compositing frame 2; the old do-not-dispose approximation
    // would leave BOTH white pixels on frame 2's canvas.
    val full = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
    def dot(): BufferedImage = {
      val i = new BufferedImage(1, 1, BufferedImage.TYPE_INT_RGB)
      i.setRGB(0, 0, 0xffffff)
      i
    }
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    for ((img, x, y, disposal) <- Seq(
        (full, 0, 0, "none"),
        (dot(), 3, 1, "restoreToPrevious"),
        (dot(), 0, 0, "none"))) {
      val p = w.getDefaultWriteParam
      val md = w.getDefaultImageMetadata(new ImageTypeSpecifier(img), p)
      val tree = md.getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[IIOMetadataNode]
      val desc = tree.getElementsByTagName("ImageDescriptor")
        .item(0).asInstanceOf[IIOMetadataNode]
      desc.setAttribute("imageLeftPosition", x.toString)
      desc.setAttribute("imageTopPosition", y.toString)
      val gceList = tree.getElementsByTagName("GraphicControlExtension")
      val gce =
        if (gceList.getLength > 0) gceList.item(0).asInstanceOf[IIOMetadataNode]
        else {
          val n = new IIOMetadataNode("GraphicControlExtension")
          tree.appendChild(n)
          n
        }
      gce.setAttribute("disposalMethod", disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", "10")
      gce.setAttribute("transparentColorIndex", "0")
      md.setFromTree("javax_imageio_gif_image_1.0", tree)
      w.writeToSequence(new IIOImage(img, null, md), p)
    }
    w.endWriteSequence(); ios.close()
    val gif = baos.toByteArray

    val fs = Multimodal.GifVideoCodec.decodeAll(gif, 2).get
    assert(fs.length == 3)
    // frame 0: all black
    assert(fs(0).forall(v => math.abs(v) < 1e-6f), fs(0).toSeq)
    // frame 1 displays WITH its delta: one white pixel in row 1
    assert(math.abs(fs(1)(0)) < 1e-6f, fs(1).toSeq)
    assert(math.abs(fs(1)(1) - 0.25f) < 1e-6f, fs(1).toSeq)
    // frame 2: (3,1) restored to black, only (0,0) white — row 1 must
    // be all black again (do-not-dispose would leave it at 0.25)
    assert(math.abs(fs(2)(0) - 0.25f) < 1e-6f, fs(2).toSeq)
    assert(math.abs(fs(2)(1)) < 1e-6f, fs(2).toSeq)
  }

  test("non-GIF bytes under kind=video stay on the stub domain, not a one-frame clip") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // PNG bytes are javax.imageio-readable, but the video codec's
    // contract (and its outage-counter gate) is GIF-only — decodeAll
    // must decline rather than decode a one-frame "clip"
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
    val buf = new ByteArrayOutputStream()
    ImageIO.write(img, "png", buf)
    val png = buf.toByteArray
    assert(!Multimodal.GifVideoCodec.isGif(png))
    assert(Multimodal.GifVideoCodec.decodeAll(png, 2).isEmpty)
    // and the fallback counter must NOT tick: non-GIF video bytes are
    // the stub's documented domain (compressed containers), not an outage
    val ctr = Multimodal.codecFallbackCounter(spark)
    Multimodal.pipelineFrom(
      Seq(MediaAsset(14L, "video", png, 4, 2, 40)).toDS(),
      stride = 1, featDim = 2, fallbacks = Some(ctr)).count()
    assert(ctr.value == 0L)
  }

  test("visual near-dup pairs close aHashes and excludes dissimilar images") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, f(x, y))
      val buf = new ByteArrayOutputStream()
      ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    // A: horizontal gradient; B: same gradient, one pixel nudged
    // (perceptually identical); C: inverted gradient (opposite hash)
    def grad(x: Int): Int = { val v = x * 16; (v << 16) | (v << 8) | v }
    val a = png((x, _) => grad(x))
    val b = png((x, y) => if (x == 3 && y == 3) grad(x) + 0x050505 else grad(x))
    val c = png((x, _) => grad(15 - x))
    val ha = Multimodal.imageAHash(a).get
    val hb = Multimodal.imageAHash(b).get
    assert(java.lang.Long.bitCount(ha ^ hb) <= 3, "near-identical images must hash close")
    assert(Multimodal.imageAHash("junk".getBytes).isEmpty)
    // flat images carry no structure: an all-black and an all-white
    // frame would both hash to 0 and pair as hamming-0 "duplicates" —
    // they must be skipped, not matched
    val black = png((_, _) => 0x000000)
    val white = png((_, _) => 0xffffff)
    assert(Multimodal.imageAHash(black).isEmpty && Multimodal.imageAHash(white).isEmpty)

    val assets = Seq(
      MediaAsset(1L, "image", a, 16, 16, 0),
      MediaAsset(2L, "image", b, 16, 16, 0),
      MediaAsset(3L, "image", c, 16, 16, 0),
      MediaAsset(4L, "audio", a, 16, 16, 1000), // non-images never pair
      MediaAsset(5L, "image", "junk".getBytes, 16, 16, 0),
      MediaAsset(6L, "image", black, 16, 16, 0),
      MediaAsset(7L, "image", white, 16, 16, 0)).toDS()
    val pairs = Multimodal.visualNearDup(assets)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"exactly the near-identical image pair expected, got $pairs")
    assert(pairs.head._3 <= 3)
  }

  test("stub decode is deterministic and feature extraction is distributed") {
    val a = Multimodal.StubCodec.decode("hello".getBytes, 4)
    val b = Multimodal.StubCodec.decode("hello".getBytes, 4)
    assert(a.toSeq == b.toSeq)
    assert(Multimodal.StubCodec.decode("other".getBytes, 4).toSeq != a.toSeq)

    val out = Multimodal.pipeline(spark, sf, stride = 10, featDim = 4)
    val n = out.count()
    assert(n > 0)
    // deterministic end-to-end: same input → same aggregate
    val s1 = out.agg(sum(col("sum_norm2"))).head().getDouble(0)
    val s2 = Multimodal.pipeline(spark, sf, stride = 10, featDim = 4)
      .agg(sum(col("sum_norm2"))).head().getDouble(0)
    assert(math.abs(s1 - s2) < 1e-9)
  }

  test("audio near-dup pairs close envelope hashes and excludes dissimilar clips") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled._
    // 6400 frames mono 16-bit LE = 100 frames per 64-slot envelope
    // cell; amplitude chosen per slot
    def wav(amp: Int => Int): Array[Byte] = {
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val nFrames = 6400
      val raw = new Array[Byte](nFrames * 2)
      for (f <- 0 until nFrames) {
        val a = amp(f * 64 / nFrames)
        val v: Short = (if (f % 2 == 0) a else -a).toShort
        raw(2 * f) = (v & 0xff).toByte
        raw(2 * f + 1) = ((v >> 8) & 0xff).toByte
      }
      val out = new ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new ByteArrayInputStream(raw), fmt, nFrames),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // A: loud first half; B: same rhythm, one loud slot re-gained
    // (perceptually the same clip); C: loud second half (opposite)
    val a = wav(s => if (s < 32) 30000 else 0)
    val b = wav(s => if (s == 5) 28000 else if (s < 32) 30000 else 0)
    val c = wav(s => if (s >= 32) 30000 else 0)
    val ha = Multimodal.audioAHash(a).get
    val hb = Multimodal.audioAHash(b).get
    val hc = Multimodal.audioAHash(c).get
    assert(java.lang.Long.bitCount(ha ^ hb) <= 3, "re-gained clip must hash close")
    assert(java.lang.Long.bitCount(ha ^ hc) > 3, "opposite rhythm must hash far")
    assert(Multimodal.audioAHash(wav(_ => 20000)).isEmpty,
      "flat signal has no envelope structure to fingerprint")
    assert(Multimodal.audioAHash("junk".getBytes).isEmpty)

    val assets = Seq(
      MediaAsset(1L, "audio", a, 0, 0, 800),
      MediaAsset(2L, "audio", b, 0, 0, 800),
      MediaAsset(3L, "audio", c, 0, 0, 800),
      MediaAsset(4L, "image", "notaudio".getBytes, 0, 0, 0)).toDS()
    val pairs = Multimodal.audioNearDup(assets)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"exactly the re-gained clip pair expected, got $pairs")
    assert(pairs.head._3 <= 3)
  }
}
