package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = GraftTestSession.spark
  val dir = GraftTestSession.Sf0001

  test("stub codec: histogram normalized, deterministic") {
    val row = Multimodal.MediaRow(1L, "hello world".getBytes("UTF-8"),
      Multimodal.MediaMeta("image", 128, 128, 0, 11))
    val out = Multimodal.StubCodec.decodeBatch(Iterator(row)).toSeq
    assert(out.length == 1)
    assert(math.abs(out.head.features.sum - 1.0f) < 1e-5)
    val again = Multimodal.StubCodec.decodeBatch(Iterator(row)).toSeq
    assert(out.head.features.toSeq == again.head.features.toSeq)
  }

  test("extractFeatures: one output row per media row, distributed") {
    val n = Multimodal.mediaTable(spark, dir).count()
    val feats = Multimodal.extractFeatures(spark, dir, targetPartitions = 4)
    assert(feats.count() == n)
    assert(feats.select("media_id").distinct().count() == n)
  }

  test("metadata pruning query never reads payload") {
    val plan = Multimodal.wideImages(spark, dir).queryExecution
      .executedPlan.toString
    assert(!plan.contains("payload"), "payload column should be pruned from scan")
  }

  test("ImageIoCodec decodes real PNG bytes distributed; corrupt rows drop") {
    import spark.implicits._
    // three 8x8 solid-color PNGs with known luminance -> known histogram bin
    def png(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(y => (0 until 8).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val meta = Multimodal.MediaMeta("image", 8, 8, 0, 0L)
    val rows = Seq(
      Multimodal.MediaRow(1L, png(0x000000), meta), // lum 0   -> bin 0
      Multimodal.MediaRow(2L, png(0xFFFFFF), meta), // lum 255 -> bin 15
      Multimodal.MediaRow(3L, png(0x808080), meta), // lum 128 -> bin 8
      Multimodal.MediaRow(4L, "not an image".getBytes, meta)) // dropped
    val feats = Multimodal.decode(rows.toDS().repartition(2),
      Multimodal.ImageIoCodec).collect().map(f => f.media_id -> f).toMap
    assert(feats.keySet == Set(1L, 2L, 3L)) // corrupt payload filtered out
    assert(feats(1L).features(0) == 1.0f)
    assert(feats(2L).features(15) == 1.0f)
    assert(feats(3L).features(8) == 1.0f)
    assert(feats.values.forall(_.features.sum == 1.0f)) // mass normalized
  }

  test("WavPcmCodec decodes a real sine WAV: rms, zcr, duration, frames") {
    import spark.implicits._
    // 0.5 s of a 440 Hz sine at 16 kHz, 16-bit mono PCM, amplitude 0.5
    val rate = 16000
    val nFrames = rate / 2
    val samples = Array.tabulate(nFrames)(i =>
      (0.5 * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toShort)
    val pcm = java.nio.ByteBuffer.allocate(nFrames * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(pcm.putShort)
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.array()), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val meta = Multimodal.MediaMeta("audio", 0, 0, rate, 0L)
    val rows = Seq(
      Multimodal.MediaRow(1L, bos.toByteArray, meta),
      Multimodal.MediaRow(2L, "static noise".getBytes, meta)) // dropped
    val feats = Multimodal.decode(rows.toDS().repartition(2),
      Multimodal.WavPcmCodec).collect().map(f => f.media_id -> f).toMap
    assert(feats.keySet == Set(1L))
    val f = feats(1L)
    assert(f.n_frames == nFrames)
    assert(math.abs(f.features(2) - 0.5f) < 1e-4) // duration
    // sine rms = amplitude/sqrt(2) ≈ 0.3536
    assert(math.abs(f.features(0) - 0.5 / math.sqrt(2)) < 1e-3)
    // 440 Hz crosses zero ~880 times/s -> zcr ≈ 880/16000 = 0.055
    assert(math.abs(f.features(1) - 880.0 / rate) < 0.005)

    // 8-bit WAVs are UNSIGNED per the WAV spec — must decode, not drop
    val pcm8 = Array.tabulate(nFrames)(i =>
      (0.5 * math.sin(2 * math.Pi * 440 * i / rate) * 127 + 128).toByte)
    val fmt8 = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      rate.toFloat, 8, 1, 1, rate.toFloat, false)
    val bos8 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm8), fmt8, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos8)
    val f8 = Multimodal.decode(
      Seq(Multimodal.MediaRow(3L, bos8.toByteArray, meta)).toDS(),
      Multimodal.WavPcmCodec).collect()
    assert(f8.length == 1 && f8.head.n_frames == nFrames)
    assert(math.abs(f8.head.features(0) - 0.5 / math.sqrt(2)) < 0.02)
  }

  test("resizeImages produces decodable images at the target dimensions") {
    import spark.implicits._
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val meta = Multimodal.MediaMeta("image", 16, 16, 0, 0L)
    val rows = Seq(
      Multimodal.MediaRow(1L, png(16, 16, 0x336699), meta),
      Multimodal.MediaRow(2L, "junk".getBytes, meta)) // dropped
    val resized = Multimodal.resizeImages(rows.toDS(), 4, 4).collect()
    assert(resized.map(_.media_id).toSeq == Seq(1L))
    val r = resized.head
    assert(r.meta.width == 4 && r.meta.height == 4)
    assert(r.meta.nBytes == r.payload.length.toLong)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.payload))
    assert(back.getWidth == 4 && back.getHeight == 4)
    // solid color survives bilinear resampling exactly
    assert((back.getRGB(2, 2) & 0xFFFFFF) == 0x336699)
  }

  test("GifFramesCodec decodes a real 3-frame animated GIF distributed") {
    import spark.implicits._
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    // author a real multi-frame GIF with javax.imageio's sequence writer:
    // three 8x8 solid-gray frames at distinct levels (gray survives GIF
    // palette quantization exactly)
    val levels = Seq(32, 128, 224)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersBySuffix("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    levels.foreach { l =>
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(l, l, l)); g.fillRect(0, 0, 8, 8)
      g.dispose()
      val meta = writer.getDefaultImageMetadata(
        new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      writer.writeToSequence(new IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()

    val meta = Multimodal.MediaMeta("video", 8, 8, 0, bos.size().toLong)
    val rows = Seq(
      Multimodal.MediaRow(1L, bos.toByteArray, meta),
      Multimodal.MediaRow(2L, "not a gif".getBytes, meta)) // dropped
    val out = Multimodal.decode(rows.toDS(), Multimodal.GifFramesCodec)
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L)) // corrupt row dropped
    val f = out.head
    assert(f.n_frames == 3, s"expected 3 frames, got ${f.n_frames}")
    // per-frame mean luminance tracks the authored gray levels
    assert(f.features.length == 3)
    f.features.zip(levels).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 2f, s"frame luminance $got vs $want")
    }
    // frames arrive in temporal order: strictly increasing brightness
    assert(f.features.sliding(2).forall(p => p(0) < p(1)))
  }

  test("contract fixture: every image/audio payload decodes with the REAL codecs") {
    // q70's routed decode must lose NO rows: a dropped row would mean a
    // synthesized payload the real codec could not decode — a regression in
    // either the fixture or the codec
    val media = Multimodal.mediaTable(spark, dir).cache()
    try {
      val byKind = media.groupBy(col("meta.kind")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val routed = Multimodal.extractFeaturesRouted(spark, dir)
        .groupBy(col("kind")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(routed == byKind, s"routed $routed vs fixture $byKind")
    } finally media.unpersist()
  }

  test("contract fixture features match a driver-side recomputation") {
    import spark.implicits._
    val rows = Multimodal.mediaTable(spark, dir).as[Multimodal.MediaRow]
      .filter(r => r.media_id < 12).collect().sortBy(_.media_id)
    assert(rows.exists(_.meta.kind == "image") && rows.exists(_.meta.kind == "audio"))
    rows.filter(_.meta.kind == "image").foreach { r =>
      // payload really is the deterministic PNG, at the metadata's dims
      assert(r.payload.sameElements(
        Multimodal.synthPng(r.media_id, r.meta.width, r.meta.height)))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == r.meta.width && img.getHeight == r.meta.height)
      // decoded histogram == direct recomputation from the decoded pixels
      val f = Multimodal.ImageIoCodec.decodeBatch(Iterator(r)).toSeq.head
      val hist = new Array[Float](16)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 +
          ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
        hist(lum >> 4) += 1f
      }
      val n = (img.getWidth * img.getHeight).toFloat
      assert(f.features.toSeq == hist.map(_ / n).toSeq)
    }
    rows.filter(_.meta.kind == "audio").foreach { r =>
      val f = Multimodal.WavPcmCodec.decodeBatch(Iterator(r)).toSeq.head
      val nSamples = 256 + (r.media_id % 64).toInt * 16
      assert(f.n_frames == nSamples)
      // duration = frames / rate, exactly as the codec computes it
      assert(f.features(2) == nSamples.toFloat / r.meta.sampleRate)
      // rms recomputed EXACTLY from the integer waveform formula — the
      // same replay the q70 oracle does in DuckDB (bit-exact float32)
      var sumSq = 0.0
      var i = 0
      while (i < nSamples) {
        val s = ((((r.media_id * 1103515245L + i * 2654435761L) >> 8)
          & 0xFFFF) - 32768L) / 32768.0
        sumSq += s * s
        i += 1
      }
      assert(f.features(0) == math.sqrt(sumSq / nSamples).toFloat,
        s"media ${r.media_id} rms ${f.features(0)}")
      // uniform hash waveform: rms ≈ 1/√3, zcr ≈ 0.5
      assert(math.abs(f.features(0) - 1.0 / math.sqrt(3)) < 0.05)
      assert(math.abs(f.features(1) - 0.5) < 0.1)
    }
    // video rows: payload is the deterministic animated GIF, and the codec's
    // DECODED FRAME PIXELS equal the synthesis formula exactly (gray-palette
    // GIF roundtrip is lossless) — not synthesized metadata
    val vrows = Multimodal.mediaTable(spark, dir).as[Multimodal.MediaRow]
      .filter(r => r.meta.kind == "video" && r.media_id < 12)
      .collect().sortBy(_.media_id)
    assert(vrows.nonEmpty)
    vrows.foreach { r =>
      val nf = Multimodal.videoFrames(r.media_id)
      assert(r.payload.sameElements(
        Multimodal.synthGif(r.media_id, r.meta.width, r.meta.height, nf)))
      // decode the container directly and compare every frame's pixels
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
      reader.setInput(iis, false, true)
      assert(reader.getNumImages(true) == nf)
      for (f <- 0 until nf) {
        val img = reader.read(f)
        assert(img.getWidth == r.meta.width && img.getHeight == r.meta.height)
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
          val want = ((r.media_id * 1103515245L + f * 97003L +
            x * 2654435761L + y * 40503L) & 0xFF).toInt
          val rgb = img.getRGB(x, y)
          assert(((rgb >> 16) & 0xFF) == want && ((rgb >> 8) & 0xFF) == want &&
            (rgb & 0xFF) == want,
            s"media ${r.media_id} frame $f pixel ($x,$y)")
        }
      }
      reader.dispose(); iis.close()
      // the codec's features agree with a per-frame recomputation
      val feats = Multimodal.GifFramesCodec.decodeBatch(Iterator(r)).toSeq.head
      assert(feats.n_frames == nf)
      val w = r.meta.width; val h = r.meta.height
      val expected = Array.tabulate(math.min(nf, 16)) { f =>
        var sum = 0L
        for (y <- 0 until h; x <- 0 until w)
          sum += ((r.media_id * 1103515245L + f * 97003L +
            x * 2654435761L + y * 40503L) & 0xFF)
        sum.toFloat / (w * h)
      }
      assert(feats.features.toSeq == expected.toSeq)
    }
  }

  test("frame sampling: stride-4 counts follow the DECODED frame count") {
    val out = Multimodal.frameSample(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val nf = Multimodal.videoFrames(id) // what the GIF container carries
      assert(r.getInt(1) == nf,
        s"media $id: decoded n_frames ${r.getInt(1)}, container has $nf")
      val expected = (nf - 1) / 4 + 1 // ceil(nf/stride)
      assert(r.getInt(2) == expected,
        s"media $id: $nf frames -> got ${r.getInt(2)} sampled, want $expected")
      // sampled indices are 0, 4, 8, ... within the frame range
      val idx = r.getSeq[Int](3)
      assert(idx == (0 until nf by 4).toSeq)
    }
  }

  test("aHash: planted perturbed copies pair with their originals") {
    import graft.multimodal.MediaAnalysis
    val pairs = MediaAnalysis.imagePhashPairs(spark, dir).collect()
    assert(pairs.nonEmpty, "planted near-dups must produce pairs")
    val planted = pairs.filter(r =>
      r.getLong(1) - r.getLong(0) == MediaAnalysis.CopyIdOffset)
    // localized single-block perturbation guarantees hamming <= 1 for
    // planted pairs (see synthPngPerturbed scaladoc); marginal-bit drift
    // from the global-mean shift may add a bit or two but stays <= 3
    assert(planted.nonEmpty)
    planted.foreach(r => assert(r.getLong(2) <= 3))
    // every reported pair passed the exact confirm
    pairs.foreach(r => assert(r.getLong(2) <= 3))
  }

  test("aHash bands: decoded hash equals the formula-computed hash") {
    import graft.multimodal.MediaAnalysis
    import spark.implicits._
    // one known image: decode path vs direct pixel-formula computation
    val id = 6L // id%3==0 -> image; w=(6%4)*16+16=48, h=(6%3)*16+16=16
    val corpus = MediaAnalysis.phashCorpus(spark, dir)
    val row = corpus.filter(_.media_id == id).head()
    val decoded = MediaAnalysis.aHashBands(
      Seq(row).toDS()).collect().head
    // formula replay in scala
    val w = ((id % 4) * 16 + 16).toInt; val h = ((id % 3) * 16 + 16).toInt
    val sums = new Array[Long](64); var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (id * 1103515245L + x * 2654435761L + y * 40503L) & 0xFFFFFF
      val lum = (((v >> 16) & 0xFF) * 299 + ((v >> 8) & 0xFF) * 587 +
        (v & 0xFF) * 114) / 1000
      sums((y / (h / 8)) * 8 + x / (w / 8)) += lum; total += lum
    }
    val bands = new Array[Long](4)
    for (bit <- 0 until 64)
      if (sums(bit) * 64 > total) bands(bit / 16) |= 1L << (bit % 16)
    assert((decoded.b0, decoded.b1, decoded.b2, decoded.b3) ==
      (bands(0), bands(1), bands(2), bands(3)))
  }

  test("image dedup clusters: census reconciles with the pair graph; " +
    "planted copies cluster under their original") {
    import graft.multimodal.MediaAnalysis
    val clusters = MediaAnalysis.imageDedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(clusters.nonEmpty)
    clusters.foreach { case (cid, n, rem) =>
      assert(n >= 2, s"cluster $cid: a CC cluster needs >= 2 members")
      assert(rem == n - 1)
    }
    // every planted (orig, orig+offset) pair lands in a cluster whose
    // label is <= the original id (min-label convergence)
    val pairs = MediaAnalysis.imagePhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val planted = pairs.filter(p => p._2 - p._1 == MediaAnalysis.CopyIdOffset)
    assert(planted.nonEmpty)
    val members = clusters.map(_._2).sum
    val docsInPairs = pairs.flatMap(p => Seq(p._1, p._2)).distinct.length
    assert(members == docsInPairs,
      "every doc in a pair appears in exactly one cluster")
  }

  test("media quality census: drops are exactly the planted corrupt rows") {
    import graft.multimodal.MediaAnalysis
    val rows = MediaAnalysis.mediaQualityCensus(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet == Set("image", "audio", "video"))
    val ids = Tables.documents(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    Seq(("image", 0L), ("audio", 1L), ("video", 2L)).foreach {
      case (kind, m) =>
        val kindIds = ids.filter(_ % 3 == m)
        val (total, decoded, dropped) = rows(kind)
        assert(total == kindIds.length.toLong)
        assert(dropped == kindIds.count(
          _ % MediaAnalysis.CorruptEvery == 0).toLong,
          s"$kind: only the planted corrupt rows may drop")
        assert(decoded == total - dropped)
    }
  }

  test("audio energy: window count follows the sample-count formula") {
    import graft.multimodal.MediaAnalysis
    val out = MediaAnalysis.audioEnergy(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val nsamp = 256 + (id % 64) * 16
      assert(r.getLong(1) == (nsamp + 255) / 256,
        s"media $id: ${r.getLong(1)} windows for $nsamp samples")
      assert(r.getLong(3) > 0)
      assert(r.getLong(2) >= 0 && r.getLong(2) < r.getLong(1))
    }
  }

  test("video motion: per-clip totals match a driver-side formula replay") {
    import graft.multimodal.MediaAnalysis
    val out = MediaAnalysis.videoMotion(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val nf = Multimodal.videoFrames(id)
      assert(r.getLong(1) == nf)
      val w = ((id % 4) * 16 + 16).toInt; val h = ((id % 3) * 16 + 16).toInt
      var totalExp = 0L
      for (f <- 1 until nf; y <- 0 until h; x <- 0 until w) {
        def g(fr: Int) = (id * 1103515245L + fr * 97003L +
          x * 2654435761L + y * 40503L) & 0xFF
        totalExp += math.abs(g(f) - g(f - 1))
      }
      assert(r.getLong(2) == totalExp,
        s"media $id: decoded total ${r.getLong(2)}, formula $totalExp")
    }
  }
}
