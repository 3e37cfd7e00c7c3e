package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}

/** Multimodal columns: image/audio/video as opaque binary columns with typed
  * metadata, decoded by REAL JDK codecs inside Catalyst expressions:
  *
  *  - image: PNG + JPEG via `javax.imageio.ImageIO` (synthesis writes real
  *    PNG/JPEG bytes; decode recovers actual pixel dimensions and pixels)
  *  - audio: WAV (16-bit PCM) via `javax.sound.sampled.AudioSystem`
  *    (decode recovers the actual sample rate and frame count from the
  *    RIFF container)
  *  - video: REAL multi-frame decode via animated GIF (the JDK's ImageIO
  *    reads and writes GIF frame sequences) — frame counts, per-frame
  *    pixels and per-frame features all come from actual decoded rasters.
  *    Compressed codecs (H.264/VP9/AV1) remain out of scope: the JDK ships
  *    none and the container has no codec libraries; the plan shape
  *    (`sampleFrames` / `sampleFrameFeatures` below) is codec-agnostic, so
  *    a real decoder drops into the same per-row expressions.
  *
  * Feature extraction is also real: images produce a normalized luma
  * histogram from decoded pixels, audio a normalized per-segment RMS energy
  * profile from decoded samples — both feed the existing ANN path
  * (`Ann.lshTopK`) as array<float> embeddings.
  *
  * Scale shape: every operator here is a per-row map (decode, features) or a
  * narrow generate (frame sampling) — no shuffle, no driver involvement, so
  * the plan parallelizes embarrassingly across a 1000-executor cluster.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),              // image | audio | video
    StructField("blob", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  final case class MediaMeta(width: Int, height: Int, sample_rate: Int, n_frames: Int)
  final case class MediaRow(media_id: Long, kind: String, blob: Array[Byte], meta: MediaMeta)

  /** Deterministic synthetic media table with REAL bytes: PNG/JPEG images
    * (deterministic pixel pattern), 16-bit PCM WAV audio (deterministic
    * waveform), animated-GIF video (deterministic grayscale frames).
    * Distributed: one executor-side map over spark.range — no driver-side
    * row building. */
  def synthesize(spark: SparkSession, n: Int, seed: Long = 42): DataFrame = {
    import spark.implicits._
    spark.range(0, n.toLong).as[Long].map(i => MediaCodec.synthRow(i, seed)).toDF()
  }

  /** Real decode: blob → struct(width, height, sample_rate, n_frames, ok)
    * through the JDK codec for the row's kind. */
  def decode(df: DataFrame): DataFrame = {
    val d = MediaFunctions.media_decode(col("blob"), col("kind"))
    df.withColumn("_d", d)
      .withColumn("decoded_width", col("_d.width"))
      .withColumn("decoded_height", col("_d.height"))
      .withColumn("decoded_rate", col("_d.sample_rate"))
      .withColumn("decoded_frames", col("_d.n_frames"))
      .withColumn("decode_ok", col("_d.ok"))
      .drop("_d")
  }

  /** frame sampling plan: explode every ceil(n_frames / k)-th frame index —
    * the shuffle-free plumbing a video pipeline needs before decode. */
  def sampleFrames(df: DataFrame, k: Int): DataFrame = {
    // ceil, not floor: a floor step under-strides (n=15, k=8 → step 1 → all
    // 15 frames) and can emit up to 2k-1 samples; ceil guarantees ≤ k
    df.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("meta.n_frames") - 1,
          greatest(lit(1), ceil(col("meta.n_frames") / k).cast("int")))))
  }

  /** The full REAL frame pipeline: sample frame indices, decode exactly
    * THAT frame from the multi-frame blob, emit its luma histogram — a
    * per-row generate + per-row map, shuffle-free and embarrassingly
    * parallel like everything else here. */
  def sampleFrameFeatures(df: DataFrame, k: Int, dim: Int = 8): DataFrame =
    sampleFrames(df, k).withColumn("frame_feat",
      MediaFunctions.media_frame_features(col("blob"), col("frame_idx"), dim))

  /** Real feature vectors from decoded media (array<float>, ANN-ready):
    * image → `dim`-bin luma histogram; audio → `dim`-segment RMS profile;
    * video → luma histogram over ≤8 evenly-sampled decoded frames. */
  def features(df: DataFrame, dim: Int = 8): DataFrame =
    df.withColumn("feat", MediaFunctions.media_features(col("blob"), col("kind"), dim))
}

/** Pure codec kernels shared by the Catalyst expressions, the synthesizer
  * and driver-side query-vector construction (deterministic: same id+seed →
  * same bytes → same features, on driver and executors alike). */
object MediaCodec {

  def synthRow(i: Long, seed: Long): Multimodal.MediaRow = {
    val h = TextOps.mix(seed + i)
    val kind = Seq("image", "audio", "video")((h & 0x7fffffff).toInt % 3)
    val width = 64 + ((h >>> 8) % 192).toInt
    val height = 64 + ((h >>> 16) % 192).toInt
    kind match {
      case "image" =>
        // even hash → PNG, odd → JPEG: both real ImageIO encoders
        val png = (h & 1L) == 0L
        val blob = if (png) encodePng(i, width, height, seed)
                   else encodeJpeg(i, width, height, seed)
        Multimodal.MediaRow(i, kind, blob, Multimodal.MediaMeta(width, height, 0, 1))
      case "audio" =>
        val rate = Seq(8000, 16000, 22050)(((h >>> 32) & 0x7fffffff).toInt % 3)
        val samples = 800 + ((h >>> 40) % 1600).toInt
        val blob = encodeWav(i, rate, samples, seed)
        Multimodal.MediaRow(i, kind, blob, Multimodal.MediaMeta(0, 0, rate, samples))
      case _ =>
        val frames = 8 + ((h >>> 24) % 56).toInt
        val blob = encodeAnimatedGif(i, width, height, frames)
        Multimodal.MediaRow(i, kind, blob, Multimodal.MediaMeta(width, height, 0, frames))
    }
  }

  /** deterministic pixel: rgb from splitmix of (id, x, y), a smooth gradient,
    * and a per-image brightness bias + contrast so the luma histograms of
    * different images genuinely differ (distinct ANN features, not all-1.0
    * cosines). */
  @inline def pixelRgb(id: Long, x: Int, y: Int, w: Int, hgt: Int): Int = {
    val bias = (TextOps.mix(id) & 0x7f).toInt              // 0..127 per image
    val contrast = 48 + (TextOps.mix(id * 31L + 7L) & 0x9f).toInt // 48..207
    val hsh = TextOps.mix(id * 7919L + x * 131L + y)
    val grad = ((x * 255) / math.max(1, w - 1) + (y * 255) / math.max(1, hgt - 1)) / 2
    @inline def ch(raw: Long): Int = {
      val v = bias + (((raw & 0xff) + grad).toInt * contrast) / 512
      if (v > 255) 255 else v
    }
    (ch(hsh) << 16) | (ch(hsh >>> 8) << 8) | ch(hsh >>> 16)
  }

  private def renderImage(id: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixelRgb(id, x, y, w, h)); x += 1 }
      y += 1
    }
    img
  }

  def encodePng(id: Long, w: Int, h: Int, seed: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(renderImage(id, w, h), "png", bos)
    bos.toByteArray
  }

  def encodeJpeg(id: Long, w: Int, h: Int, seed: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(renderImage(id, w, h), "jpg", bos)
    bos.toByteArray
  }

  /** REAL image resize: decode, nearest-neighbor sample to (w, h) with
    * explicit integer pixel math (bit-deterministic — interpolating
    * Graphics2D filters vary across JDK raster paths), re-encode PNG.
    * Empty array when the blob does not decode. */
  def resizeImage(blob: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (w <= 0 || h <= 0) return Array.emptyByteArray
    val img = try ImageIO.read(new ByteArrayInputStream(blob)) catch { case _: Exception => null }
    if (img == null) return Array.emptyByteArray
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.getHeight / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.getWidth / w).toInt
        out.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** deterministic 16-bit mono PCM: sine at an id-derived frequency plus
    * hash noise, wrapped in a real RIFF/WAV container. */
  def pcmSamples(id: Long, n: Int): Array[Short] = {
    val freq = 100.0 + (TextOps.mix(id) & 0x3ff).toDouble // 100..1123 Hz-ish
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val s = math.sin(2.0 * math.Pi * freq * i / 8000.0) * 12000.0
      val noise = ((TextOps.mix(id + i) & 0xfff) - 2048).toDouble
      out(i) = (s + noise).toShort
      i += 1
    }
    out
  }

  def encodeWav(id: Long, sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    val samples = pcmSamples(id, nSamples)
    val bytes = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) { // little-endian 16-bit
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** deterministic grayscale frame pixel: the image pixel pattern with the
    * frame index folded into the id hash, so frames genuinely differ. */
  @inline def pixelGray(id: Long, frame: Int, x: Int, y: Int, w: Int, hgt: Int): Int =
    pixelRgb(id * 524287L + frame + 1, x, y, w, hgt) & 0xff

  private def renderGifFrame(id: Long, frame: Int, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, pixelGray(id, frame, x, y, w, h)); x += 1
      }
      y += 1
    }
    img
  }

  /** REAL multi-frame video: animated GIF through the JDK's ImageIO
    * sequence writer. Frames are grayscale (≤256 colors), so the GIF
    * palette is lossless and every frame pixel survives encode → decode
    * bit-exactly — the property the pixel-exact frame tests pin. */
  def encodeAnimatedGif(id: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        writer.writeToSequence(
          new javax.imageio.IIOImage(renderGifFrame(id, f, w, h), null, null),
          writer.getDefaultWriteParam)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** decode ONE frame of a multi-frame blob (null when undecodable). The
    * JDK GIF reader returns each frame as an independent full raster. */
  def decodeGifFrame(blob: Array[Byte], frameIdx: Int): BufferedImage = {
    val ii = ImageIO.createImageInputStream(new ByteArrayInputStream(blob))
    try {
      val readers = ImageIO.getImageReaders(ii)
      if (!readers.hasNext) return null
      val r = readers.next()
      r.setInput(ii, false, true)
      try r.read(frameIdx)
      catch { case _: Exception => null }
      finally r.dispose()
    } finally ii.close()
  }

  final case class Decoded(width: Int, height: Int, sampleRate: Int, nFrames: Int, ok: Boolean)
  private val failed = Decoded(0, 0, 0, 0, ok = false)

  def decode(blob: Array[Byte], kind: String): Decoded = try {
    kind match {
      case "image" =>
        val img = ImageIO.read(new ByteArrayInputStream(blob))
        if (img == null) failed
        else Decoded(img.getWidth, img.getHeight, 0, 1, ok = true)
      case "audio" =>
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(blob))
        try Decoded(0, 0, ais.getFormat.getSampleRate.toInt, ais.getFrameLength.toInt, ok = true)
        finally ais.close()
      case "video" =>
        // real multi-frame decode: dimensions from frame 0, frame count by
        // walking the container (getNumImages(true) parses every frame)
        val ii = ImageIO.createImageInputStream(new ByteArrayInputStream(blob))
        try {
          val readers = ImageIO.getImageReaders(ii)
          if (!readers.hasNext) failed
          else {
            val r = readers.next()
            r.setInput(ii, false, true)
            try Decoded(r.getWidth(0), r.getHeight(0), 0, r.getNumImages(true), ok = true)
            finally r.dispose()
          }
        } finally ii.close()
      case _ => failed
    }
  } catch { case _: Exception => failed }

  /** image: `dim`-bin luma histogram over the DECODED pixels, normalized to
    * sum 1 — a real, deterministic content feature. */
  def imageFeatures(blob: Array[Byte], dim: Int): Array[Float] = {
    val img = ImageIO.read(new ByteArrayInputStream(blob))
    if (img == null) return new Array[Float](dim)
    val hist = new Array[Long](dim)
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        hist((luma * dim) / 256) += 1
        x += 1
      }
      y += 1
    }
    val total = (w.toLong * h).toFloat
    hist.map(c => c / total)
  }

  /** audio: RMS energy of `dim` equal segments of the DECODED samples,
    * L2-normalized — shape-of-signal feature independent of length. */
  def audioFeatures(blob: Array[Byte], dim: Int): Array[Float] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(blob))
    try {
      val n = ais.getFrameLength.toInt
      val bytes = ais.readNBytes(n * ais.getFormat.getFrameSize)
      val rms = new Array[Double](dim)
      val counts = new Array[Int](dim)
      var i = 0
      while (i < n) {
        val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toDouble
        val seg = (i * dim) / math.max(1, n)
        rms(seg) += s * s; counts(seg) += 1
        i += 1
      }
      var norm = 0.0
      val vals = new Array[Double](dim)
      var d = 0
      while (d < dim) {
        vals(d) = math.sqrt(rms(d) / math.max(1, counts(d)))
        norm += vals(d) * vals(d)
        d += 1
      }
      val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
      vals.map(v => (v * inv).toFloat)
    } finally ais.close()
  }

  /** accumulate one decoded image's luma histogram; returns pixels added. */
  private def lumaInto(img: BufferedImage, dim: Int, hist: Array[Long]): Long = {
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        hist((luma * dim) / 256) += 1
        x += 1
      }
      y += 1
    }
    w.toLong * h
  }

  /** video: REAL combined luma histogram over ≤8 evenly-sampled DECODED
    * frames, normalized — same feature space as images, so mixed-media ANN
    * compares across kinds. */
  def videoFeatures(blob: Array[Byte], dim: Int): Array[Float] = {
    val ii = ImageIO.createImageInputStream(new ByteArrayInputStream(blob))
    try {
      val readers = ImageIO.getImageReaders(ii)
      if (!readers.hasNext) return new Array[Float](dim)
      val r = readers.next()
      r.setInput(ii, false, true)
      try {
        val n = r.getNumImages(true)
        if (n <= 0) return new Array[Float](dim)
        val step = math.max(1, (n + 7) / 8) // ceil: ≤ 8 frames decoded, as documented
        val hist = new Array[Long](dim)
        var total = 0L
        var f = 0
        while (f < n) { total += lumaInto(r.read(f), dim, hist); f += step }
        hist.map(c => (c.toDouble / total).toFloat)
      } finally r.dispose()
    } finally ii.close()
  }

  /** luma histogram of ONE decoded frame of a multi-frame blob. */
  def frameFeatures(blob: Array[Byte], frameIdx: Int, dim: Int): Array[Float] = {
    val img = decodeGifFrame(blob, frameIdx)
    if (img == null) return new Array[Float](dim)
    val hist = new Array[Long](dim)
    val total = lumaInto(img, dim, hist)
    hist.map(c => (c.toDouble / total).toFloat)
  }

  def features(blob: Array[Byte], kind: String, dim: Int): Array[Float] = try {
    kind match {
      case "image" => imageFeatures(blob, dim)
      case "audio" => audioFeatures(blob, dim)
      case "video" => videoFeatures(blob, dim)
      case _ => new Array[Float](dim)
    }
  } catch { case _: Exception => new Array[Float](dim) }
}

/** media_decode(blob, kind): real JDK codec decode to
  * struct(width, height, sample_rate, n_frames, ok). */
case class MediaDecodeExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = MediaDecodeExpr.schema
  override def nullable: Boolean = true
  override protected def nullSafeEval(b: Any, k: Any): Any = {
    val d = MediaCodec.decode(b.asInstanceOf[Array[Byte]], k.toString)
    InternalRow(d.width, d.height, d.sampleRate, d.nFrames, d.ok)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "media_decode"
}

object MediaDecodeExpr {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("ok", BooleanType, nullable = false)))
}

/** media_features(blob, kind, dim): real content features as array<float>
  * (luma histogram / RMS profile), ANN-ready. */
case class MediaFeaturesExpr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(b: Any, k: Any, d: Any): Any = {
    val feats = MediaCodec.features(b.asInstanceOf[Array[Byte]], k.toString,
      d.asInstanceOf[Int])
    new GenericArrayData(feats.map(f => f: Any))
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "media_features"
}

/** media_frame_features(blob, frame_idx, dim): luma histogram of ONE
  * decoded frame of a multi-frame blob — the per-frame map under the
  * `sampleFrames` generate. */
case class MediaFrameFeaturesExpr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(b: Any, f: Any, d: Any): Any = {
    val feats = MediaCodec.frameFeatures(b.asInstanceOf[Array[Byte]],
      f.asInstanceOf[Int], d.asInstanceOf[Int])
    new GenericArrayData(feats.map(x => x: Any))
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "media_frame_features"
}

/** media_resize(blob, w, h): real decode → nearest-neighbor resample →
  * PNG re-encode; empty binary when the blob does not decode. */
case class MediaResizeExpr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(b: Any, w: Any, h: Any): Any =
    MediaCodec.resizeImage(b.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "media_resize"
}

object MediaFunctions {
  import org.apache.spark.sql.GraftInternal.{col => mkCol, expr => exprOf}

  def media_decode(blob: Column, kind: Column): Column =
    mkCol(MediaDecodeExpr(exprOf(blob), exprOf(kind)))

  def media_features(blob: Column, kind: Column, dim: Int): Column =
    mkCol(MediaFeaturesExpr(exprOf(blob), exprOf(kind),
      org.apache.spark.sql.catalyst.expressions.Literal(dim)))

  def media_frame_features(blob: Column, frameIdx: Column, dim: Int): Column =
    mkCol(MediaFrameFeaturesExpr(exprOf(blob), exprOf(frameIdx),
      org.apache.spark.sql.catalyst.expressions.Literal(dim)))

  def media_resize(blob: Column, w: Int, h: Int): Column =
    mkCol(MediaResizeExpr(exprOf(blob),
      org.apache.spark.sql.catalyst.expressions.Literal(w),
      org.apache.spark.sql.catalyst.expressions.Literal(h)))
}
