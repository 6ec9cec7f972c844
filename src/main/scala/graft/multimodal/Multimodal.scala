package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: opaque `binary` payloads + typed metadata, with
  * decode/feature-extract/resize/frame-sample implemented as
  * partition-batched iterator transforms (`mapPartitions` — the Scala
  * analogue of arrow-batched pandas UDFs: one JVM-side batch loop per
  * partition, no per-row closure dispatch in the hot path).
  *
  * Four codecs ship behind the same boundary, and since round 8 every
  * contract query runs a REAL decoder: [[ImageIoCodec]] (JDK
  * `javax.imageio` — PNG/BMP/JPEG/GIF stills), [[WavPcmCodec]] (JDK
  * `javax.sound.sampled` — WAV/PCM containers), [[GifFramesCodec]] (JDK
  * `javax.imageio` sequence reader — animated GIF, the multi-frame
  * container the video lane decodes frame-by-frame). [[StubCodec]] remains
  * as the documented example of plugging a native codec (libjpeg/ffmpeg)
  * into the same boundary. The Spark-side plumbing is identical for all
  * and is the part that matters at 100 TB:
  *  - payloads stay in executors; nothing ever collects binary to the driver;
  *  - feature extraction is a narrow map — zero shuffles;
  *  - metadata lives in a typed struct column so filters on it (e.g.
  *    width ≥ 256) are Catalyst predicates, pushable without decoding;
  *  - `repartition(byteBudget)` shows the partition-sizing hook: media
  *    blobs are orders of magnitude wider than text rows, so partition
  *    counts must follow byte volume, not row counts.
  */
object Multimodal {

  /** ImageIO defaults to DISK-BACKED stream caches: every decode/encode
    * spills a temp file under java.io.tmpdir, so 32 codec threads churn
    * hundreds of tmp files per media pass — the repo's only stall-prone
    * lane (q223) stalled exactly here (round-12 verdict item 7). All
    * payloads are in-memory byte arrays; force memory-backed caches
    * JVM-wide. Runs once per classloader, before any codec touches
    * ImageIO (every codec path lives in this object or references it). */
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaMeta(kind: String, width: Int, height: Int,
                             sampleRate: Int, nBytes: Long)
  final case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String,
                                 features: Array[Float], n_frames: Int)

  /** Codec boundary. A production deployment plugs in a real decoder
    * (libjpeg/ffmpeg/soundfile); the interface is per-batch so native
    * libraries amortize initialization across a partition. */
  trait MediaCodec extends Serializable {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures]
  }

  /** STUB codec — deterministic fake standing in for image/audio decode
    * (no media libraries in this container). Features are a 16-bin byte
    * histogram of the payload, normalized; "frames" are a deterministic
    * stride sample. Replace with a real codec in production. */
  object StubCodec extends MediaCodec {
    val FeatureDim = 16
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val hist = new Array[Float](FeatureDim)
        var i = 0
        while (i < r.payload.length) { // batch-local tight loop, no boxing
          hist((r.payload(i) & 0xFF) >> 4) += 1f
          i += 1
        }
        val n = math.max(1, r.payload.length).toFloat
        val nFrames = math.max(1, r.payload.length / 64)
        MediaFeatures(r.media_id, r.meta.kind, hist.map(_ / n), nFrames)
      }
  }

  /** REAL image codec on the JDK's `javax.imageio` (PNG/BMP/JPEG/GIF —
    * no external libraries needed): features = normalized 16-bin luminance
    * histogram over decoded pixels; n_frames = 1. Payloads that fail to
    * decode are DROPPED — decode failure doubles as the data-quality filter,
    * which is the production semantics (a corrupt blob must not poison the
    * batch). The synthetic testdata payloads are not images, so the contract
    * queries stay on [[StubCodec]]; MultimodalSpec drives this codec with
    * real PNG bytes through the same [[decode]] pipeline. */
  object ImageIoCodec extends MediaCodec {
    val FeatureDim = 16
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
      // per-task: a nested object's init does not force the enclosing
      // Multimodal initializer on a remote executor (round-13 review)
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          if (img == null) None
          else {
            val hist = new Array[Float](FeatureDim)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) { // batch-local tight loop, no boxing
                val rgb = img.getRGB(x, y)
                val lum = (((rgb >> 16) & 0xFF) * 299 +
                  ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
                hist(lum >> 4) += 1f
                x += 1
              }
              y += 1
            }
            val n = (img.getWidth.toLong * img.getHeight).toFloat
            Some(MediaFeatures(r.media_id, r.meta.kind, hist.map(_ / n), 1))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  /** REAL audio codec on the JDK's `javax.sound.sampled` (WAV/PCM — no
    * external libraries): decodes the RIFF container, converts samples to
    * normalized [−1,1] doubles, and emits [rms, zero_crossing_rate,
    * duration_seconds] as the feature vector with `n_frames` = PCM frame
    * count. Same drop-on-undecodable semantics as [[ImageIoCodec]].
    * Supports 8/16-bit PCM, mono or multi-channel (channels interleave;
    * stats run over all samples). */
  object WavPcmCodec extends MediaCodec {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.flatMap { r =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val fmt = in.getFormat
          val bytes = in.readAllBytes()
          in.close()
          val bits = fmt.getSampleSizeInBits
          val enc = fmt.getEncoding
          import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
          // the WAV spec stores 8-bit audio UNSIGNED and 16-bit SIGNED —
          // requiring signed for both would silently drop every valid
          // 8-bit file as if it were corrupt
          val ok = (bits == 16 && enc == PCM_SIGNED) ||
            (bits == 8 && (enc == PCM_SIGNED || enc == PCM_UNSIGNED))
          if (!ok) None
          else {
            val unsigned8 = bits == 8 && enc == PCM_UNSIGNED
            val bb = java.nio.ByteBuffer.wrap(bytes).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            val n = bytes.length / (bits / 8)
            var sumSq = 0.0
            var crossings = 0L
            var prevNeg = false
            var i = 0
            while (i < n) { // batch-local tight loop, no boxing
              val s = if (bits == 16) bb.getShort(i * 2) / 32768.0
                      else if (unsigned8) ((bb.get(i) & 0xFF) - 128) / 128.0
                      else bb.get(i) / 128.0
              sumSq += s * s
              val neg = s < 0
              if (i > 0 && neg != prevNeg) crossings += 1
              prevNeg = neg
              i += 1
            }
            val frames = n / math.max(1, fmt.getChannels)
            val rms = if (n == 0) 0f else math.sqrt(sumSq / n).toFloat
            val zcr = if (n <= 1) 0f else crossings.toFloat / (n - 1)
            val dur = if (fmt.getSampleRate <= 0) 0f
                      else frames / fmt.getSampleRate
            Some(MediaFeatures(r.media_id, r.meta.kind,
              Array(rms, zcr, dur), frames))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
  }

  /** REAL multi-frame codec on `javax.imageio`'s sequence reader API
    * (animated GIF — the one multi-frame container the JDK decodes
    * natively). This is the temporal-media path a video codec plugs into:
    * `n_frames` is the ACTUAL frame count from the container index, and the
    * feature vector is the per-frame mean luminance sequence (capped at 16
    * frames — the "frame sample" a video pipeline would embed), so
    * downstream ops see real per-frame temporal structure, not a stub
    * stride. Same drop-on-undecodable semantics as the other codecs.
    * Single-frame stills decode too (n_frames = 1), making this a strict
    * generalization of [[ImageIoCodec]]'s shape. */
  object GifFramesCodec extends MediaCodec {
    val MaxFrames = 16
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
      javax.imageio.ImageIO.setUseCache(false) // see ImageIoCodec
      rows.flatMap { r =>
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) { iis.close(); None }
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, false, true) // random access: frame count
              val n = reader.getNumImages(true)
              if (n <= 0) None
              else {
                val feats = new Array[Float](math.min(n, MaxFrames))
                var f = 0
                while (f < feats.length) {
                  val img = reader.read(f)
                  var sum = 0L
                  var y = 0
                  while (y < img.getHeight) {
                    var x = 0
                    while (x < img.getWidth) { // tight loop, no boxing
                      val rgb = img.getRGB(x, y)
                      sum += (((rgb >> 16) & 0xFF) * 299 +
                        ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
                      x += 1
                    }
                    y += 1
                  }
                  feats(f) = sum.toFloat / (img.getWidth * img.getHeight)
                  f += 1
                }
                Some(MediaFeatures(r.media_id, r.meta.kind, feats, n))
              }
            } finally { reader.dispose(); iis.close() }
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  /** Partition-batched decode over any media frame — the single pipeline
    * both codecs (and a production native codec) plug into. */
  def decode(media: Dataset[MediaRow], codec: MediaCodec): Dataset[MediaFeatures] =
    media.mapPartitions(rows => codec.decodeBatch(rows))(
      org.apache.spark.sql.Encoders.product[MediaFeatures])

  /** Partition-batched REAL image resize (JDK Graphics2D bilinear):
    * payload in → resized-PNG payload out, metadata struct updated to the
    * new dimensions and byte size. Undecodable payloads are dropped (same
    * quality-filter semantics as [[ImageIoCodec]]). Stays a narrow map —
    * payloads never leave their executor. */
  def resizeImages(media: Dataset[MediaRow], width: Int, height: Int): Dataset[MediaRow] =
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // see ImageIoCodec
      rows.flatMap { r =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          if (img == null) None
          else {
            val out = new java.awt.image.BufferedImage(width, height,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, width, height, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            val bytes = bos.toByteArray
            Some(MediaRow(r.media_id, bytes,
              r.meta.copy(width = width, height = height,
                nBytes = bytes.length.toLong)))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }(org.apache.spark.sql.Encoders.product[MediaRow])

  /** Deterministic REAL PNG: `w`×`h` RGB pixels from an integer hash of
    * (id, x, y), encoded by the JDK's ImageIO PNG writer. Every payload the
    * fixture emits is a decodable image whose dimensions match its
    * metadata struct (pinned by MultimodalSpec). */
  private[graft] def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { // batch-local tight loop, no boxing
        val v = (id * 1103515245L + x * 2654435761L + y * 40503L) & 0xFFFFFFL
        img.setRGB(x, y, v.toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic REAL WAV: a RIFF/PCM container (16-bit signed mono,
    * little-endian) holding an INTEGER-hash waveform — sample i is
    * `(((id·1103515245 + i·2654435761) >> 8) & 0xFFFF) − 32768`,
    * 256 + (id mod 64)·16 samples. The waveform is integer-exact on purpose:
    * the q70 oracle recomputes the decoded rms bit-for-bit in DuckDB
    * (Σs² is an exact BIGINT; s²/2³⁰ partial sums are exact dyadic doubles,
    * so `sqrt(sum(s*s)/2^30/n)::REAL` reproduces the codec's float to the
    * last bit — a sine would hang the hash gate on libm-sin ulp drift
    * between the JVM and DuckDB). rms ≈ 1/√3 FS and zcr ≈ 0.5 for the
    * uniform hash, which the spec checks analytically. */
  private[graft] def synthWav(id: Long, sampleRate: Int): Array[Byte] = {
    val n = 256 + (id % 64).toInt * 16
    val out = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    out.put("RIFF".getBytes(ascii)).putInt(36 + n * 2).put("WAVE".getBytes(ascii))
      .put("fmt ".getBytes(ascii)).putInt(16).putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes(ascii)).putInt(n * 2)
    var i = 0
    while (i < n) { // batch-local tight loop, no boxing
      out.putShort(
        ((((id * 1103515245L + i * 2654435761L) >> 8) & 0xFFFF) - 32768L).toShort)
      i += 1
    }
    out.array()
  }

  /** Deterministic REAL animated GIF: `nFrames` full-size `w`×`h` frames on
    * an explicit 256-level GRAY IndexColorModel — gray survives GIF's
    * palette encoding bit-exactly (probed: write→read roundtrip is
    * pixel-identical, and luminance of gray g is exactly g), so the q70/q72
    * oracles can recompute frame statistics from the pixel formula
    * `(id·1103515245 + f·97003 + x·2654435761 + y·40503) & 0xFF` without
    * decoding. Frames are written unoptimized (no delta/disposal tricks),
    * so `reader.read(f)` returns each full frame. */
  private[graft] def synthGif(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val ramp = Array.tabulate[Byte](256)(i => i.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { // batch-local tight loop, no boxing
            val g = (id * 1103515245L + f * 97003L + x * 2654435761L +
              y * 40503L) & 0xFF
            raster.setSample(x, y, 0, g.toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Frame count for a video row — container truth the q72 oracle replays. */
  private[graft] def videoFrames(id: Long): Int = (2 + (id % 7)).toInt

  /** Payload synthesis as a DETERMINISTIC scalar function so Catalyst column
    * pruning drops the generation entirely for metadata-only queries (q71's
    * pruned scan) — a real pipeline's analogue: don't fetch the blob unless
    * the plan touches it. image → real PNG, audio → real WAV, video → real
    * animated GIF (round 8 — every kind is now a genuinely decodable
    * container; [[StubCodec]] survives only as the documented
    * plug-a-native-codec-here example). */
  private val synthPayload =
    udf((id: Long, kind: String, w: Int, h: Int, sr: Int, text: String) =>
      kind match {
        case "image" => synthPng(id, w, h)
        case "audio" => synthWav(id, sr)
        case _ => synthGif(id, w, h, videoFrames(id))
      })

  /** Synthesize a media table from `documents`: REAL decodable payloads
    * (PNG for image rows, WAV for audio rows — round 6; animated GIF for
    * video rows — round 8), metadata derived per row. Kind cycles
    * image/audio/video so downstream per-kind routing is exercised.
    * `meta.nBytes` is the source-DECLARED size (text length) — the catalog
    * estimate a pipeline budgets partitions with before materializing
    * payloads. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    val kind =
      element_at(kinds, (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType))
    val width = (pmod(col("doc_id"), lit(4)) * 16 + 16).cast(IntegerType)
    val height = (pmod(col("doc_id"), lit(3)) * 16 + 16).cast(IntegerType)
    val rate = lit(8000).cast(IntegerType)
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      synthPayload(col("doc_id"), kind, width, height, rate, col("text"))
        .as("payload"),
      struct(kind.as("kind"), width.as("width"), height.as("height"),
        rate.as("sampleRate"),
        length(col("text")).cast(LongType).as("nBytes")).as("meta"))
  }

  /** Partition-batched decode + feature extraction. Input partitioning is
    * re-balanced by byte volume before the decode so each task carries a
    * bounded payload budget (the knob that matters when blobs are MBs). */
  def extractFeatures(spark: SparkSession, dir: String,
                      codec: MediaCodec = StubCodec,
                      targetPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir)
    val sized = if (targetPartitions > 0) media.repartition(targetPartitions)
                else media
    decode(sized.as[MediaRow], codec).toDF()
  }

  /** Per-kind routed decode — the production shape: image rows through the
    * REAL [[ImageIoCodec]], audio rows through the REAL [[WavPcmCodec]],
    * video rows through the REAL [[GifFramesCodec]] (round 8 — all three
    * branches decode actual containers). Each branch is a pushdown-filtered
    * narrow map; the union is plan-level only (no shuffle). Every payload in
    * the fixture decodes, so a row lost here would be a real codec
    * regression — MultimodalSpec pins output count == input count. */
  def extractFeaturesRouted(spark: SparkSession, dir: String): DataFrame =
    graft.CacheRegistry.cached(spark, s"media-routed:$dir") {
      // cached once per (session, dir): q70's summary and q72's frame
      // sampler read the same decoded-feature table, and the JDK codec
      // pass is the expensive part — the production analogue is the
      // persisted features parquet a media pipeline writes after decode
      import spark.implicits._
      val media = mediaTable(spark, dir)
      def branch(kind: String, codec: MediaCodec): DataFrame =
        decode(media.filter(col("meta.kind") === kind).as[MediaRow], codec)
          .toDF()
      branch("image", ImageIoCodec)
        .unionByName(branch("audio", WavPcmCodec))
        .unionByName(branch("video", GifFramesCodec))
    }

  /** Metadata-only pruning query: filters on the typed struct never touch
    * payload bytes — Catalyst prunes the binary column (and with it the
    * whole payload synthesis) out of the plan. */
  def wideImages(spark: SparkSession, dir: String, minWidth: Int = 48): DataFrame =
    mediaTable(spark, dir)
      .filter(col("meta.kind") === "image" && col("meta.width") >= minWidth)
      .select(col("media_id"), col("meta.width").as("width"),
        col("meta.height").as("height"))

  /** Frame sampling for video payloads, against the DECODED container
    * (round 8): the real [[GifFramesCodec]] reads each GIF's frame index, and
    * every `stride`-th frame index is selected from the ACTUAL frame count —
    * the shape of a real frame-sampler (container index lookup + seek), not
    * byte-offset arithmetic. Reads the session-cached routed decode (one
    * codec pass serves q70 and q72); sampling is pure column arithmetic on
    * its output. */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 4): DataFrame = {
    extractFeaturesRouted(spark, dir)
      .filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        sequence(lit(0), col("n_frames") - 1, lit(stride)).as("frame_indices"))
      .select(col("media_id"), col("n_frames"),
        size(col("frame_indices")).as("n_sampled"), col("frame_indices"))
  }

  /** Feature query for the driver contract: per-kind feature summary
    * (mean of first feature, total frames) over the ROUTED decode — ALL
    * kinds run real JDK codecs (round 8) — proving the production decode
    * path runs distributed and aggregates without collecting. The oracle
    * recomputes every decoded statistic from the deterministic payload
    * formulas (see [[synthPng]]/[[synthWav]]/[[synthGif]]) — bit-exact
    * float32 per media, so a codec or roundtrip defect goes hash-red. */
  def featureSummary(spark: SparkSession, dir: String): DataFrame =
    extractFeaturesRouted(spark, dir)
      .select(col("kind"), element_at(col("features"), 1).as("f0"), col("n_frames"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("f0")), 6).as("avg_f0"),
        sum(col("n_frames")).cast(LongType).as("total_frames"))

  /** q70 oracle: recomputes every DECODED statistic from the deterministic
    * payload formulas, never touching the binary — so a defect anywhere in
    * synth→container→JDK-decode→feature goes hash-red.
    *  - image: f0 = fraction of pixels with luminance>>4 == 0, replayed
    *    per-pixel from [[synthPng]]'s integer hash (PNG is lossless);
    *  - audio: f0 = rms of the decoded PCM, replayed from [[synthWav]]'s
    *    integer waveform; `sqrt(sum(s·s)/2³⁰/n)::REAL` is bit-exact vs the
    *    codec (see [[synthWav]] scaladoc);
    *  - video: f0 = frame-0 mean luminance from [[synthGif]]'s pixel hash
    *    (gray palette ⇒ luminance = gray level, exactly); n_frames from the
    *    frame-count formula the GIF container actually carries. */
  val featureSummarySql: String =
    """WITH docs AS (
      |  SELECT doc_id AS id, (doc_id % 4) * 16 + 16 AS w,
      |         (doc_id % 3) * 16 + 16 AS h
      |  FROM documents
      |), imgpix AS (
      |  SELECT d.id, d.w, d.h,
      |         ((d.id * 1103515245 + x.x * 2654435761 + y.y * 40503)
      |          & 16777215) AS v
      |  FROM docs d
      |  CROSS JOIN LATERAL (SELECT unnest(range(d.w)) AS x) x
      |  CROSS JOIN LATERAL (SELECT unnest(range(d.h)) AS y) y
      |  WHERE d.id % 3 = 0
      |), img AS (
      |  SELECT id,
      |         CAST(CAST(sum(CASE WHEN (((v >> 16) & 255) * 299
      |                                  + ((v >> 8) & 255) * 587
      |                                  + (v & 255) * 114) // 1000 < 16
      |                        THEN 1 ELSE 0 END) AS DOUBLE)
      |              / max(w * h) AS REAL) AS f0,
      |         1 AS nf
      |  FROM imgpix GROUP BY id
      |), audsamp AS (
      |  SELECT d.id, 256 + (d.id % 64) * 16 AS nsamp,
      |         (((d.id * 1103515245 + i.i * 2654435761) >> 8) & 65535)
      |           - 32768 AS s
      |  FROM docs d
      |  CROSS JOIN LATERAL
      |    (SELECT unnest(range(256 + (d.id % 64) * 16)) AS i) i
      |  WHERE d.id % 3 = 1
      |), aud AS (
      |  SELECT id,
      |         CAST(sqrt(sum(s * s) / 1073741824.0 / max(nsamp)) AS REAL) AS f0,
      |         max(nsamp) AS nf
      |  FROM audsamp GROUP BY id
      |), vidpix AS (
      |  SELECT d.id, d.w, d.h,
      |         ((d.id * 1103515245 + x.x * 2654435761 + y.y * 40503)
      |          & 255) AS g
      |  FROM docs d
      |  CROSS JOIN LATERAL (SELECT unnest(range(d.w)) AS x) x
      |  CROSS JOIN LATERAL (SELECT unnest(range(d.h)) AS y) y
      |  WHERE d.id % 3 = 2
      |), vid AS (
      |  SELECT id, CAST(CAST(sum(g) AS DOUBLE) / max(w * h) AS REAL) AS f0,
      |         2 + id % 7 AS nf
      |  FROM vidpix GROUP BY id
      |), allf AS (
      |  SELECT 'image' AS kind, f0, nf FROM img
      |  UNION ALL SELECT 'audio', f0, nf FROM aud
      |  UNION ALL SELECT 'video', f0, nf FROM vid
      |)
      |SELECT kind, count(*) AS n, round(avg(f0), 6) AS avg_f0,
      |       CAST(sum(nf) AS BIGINT) AS total_frames
      |FROM allf GROUP BY kind""".stripMargin

  /** q71 oracle: the metadata formulas replayed in SQL (kind/width/height
    * are pure doc_id arithmetic — the scan-pruning query never decodes). */
  val wideImagesSql: String =
    """SELECT doc_id AS media_id,
      |       CAST((doc_id % 4) * 16 + 16 AS INT) AS width,
      |       CAST((doc_id % 3) * 16 + 16 AS INT) AS height
      |FROM documents
      |WHERE doc_id % 3 = 0 AND (doc_id % 4) * 16 + 16 >= 48""".stripMargin

  /** q72 oracle: the container's frame count (and the stride-4 sample size
    * over it) replayed from the [[videoFrames]] formula — the Spark side
    * gets these numbers by DECODING each GIF's frame index, so a container
    * or reader defect goes red. */
  val frameSampleSql: String =
    """SELECT doc_id AS media_id,
      |       CAST(2 + doc_id % 7 AS INT) AS n_frames,
      |       CAST((2 + doc_id % 7 - 1) // 4 + 1 AS INT) AS n_sampled
      |FROM documents WHERE doc_id % 3 = 2""".stripMargin
}
