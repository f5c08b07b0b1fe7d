package graft.textops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Hll

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata, plus decode / feature-extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing (schemas, partitioning, batch shapes, column
  * lineage) is REAL and tested. The KERNELS are real pure-JVM
  * implementations via `javax.imageio` + `Graphics2D` (PNG/GIF
  * encode/decode, bilinear resize, uniform temporal frame sampling,
  * intensity-grid embedding); only payloads in formats the JVM ships no
  * codec for (e.g. MP4/JPEG-XL) fall back to clearly-marked deterministic
  * STUB values, keeping every signature and plan shape identical to what a
  * JNI codec / ONNX encoder drop-in would use.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("duration_ms", IntegerType))), nullable = true)))

  /** Build the media table from the interleaved-docs table: media spans →
    * one row per media_ref with deterministic synthetic payload bytes
    * (STUB: a real pipeline reads the blob store here).
    */
  def mediaTable(docs: DataFrame): DataFrame = {
    val media = docs
      .select(explode(col("spans")).as("span"))
      .filter(col("span.kind") === "media")
      .select(col("span.media_ref").as("media_id"))
      .distinct()
    media.select(
      col("media_id"),
      when(col("media_id").endsWith(".jpg"), lit("image")).otherwise(lit("video")).as("kind"),
      // STUB payload: bytes derived from the id — deterministic, non-null
      to_binary(sha2(col("media_id"), 256), lit("hex")).as("bytes"),
      struct(
        (pmod(xxhash64(col("media_id"), lit(1)), lit(1920)) + 64).cast("int").as("width"),
        (pmod(xxhash64(col("media_id"), lit(2)), lit(1080)) + 64).cast("int").as("height"),
        (pmod(xxhash64(col("media_id"), lit(3)), lit(60000)) + 1000).cast("int").as("duration_ms")
      ).as("meta"))
  }

  /** REAL image encode: deterministic RGB pixels → PNG bytes via
    * `javax.imageio` (pure JVM, no native codec). Used to materialize real
    * image payloads for the decode path's oracle (q_media_decode).
    */
  val encodePng = F.udf((w: Int, h: Int, seed: Long) => {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (Hll.mix64(seed + x * 31L + y * 17L) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  })

  /** Image decode: binary → (format, width, height). REAL path: an
    * `javax.imageio` header parse (reader.getWidth reads the container
    * header, no pixel decode) for any format the JVM ships readers for
    * (PNG/BMP/GIF/JPEG). Payloads no reader recognizes (e.g. the synthetic
    * media-table stubs, or real-world video containers) fall back to the
    * deterministic STUB values so downstream plans stay testable.
    */
  val decodeImage = F.udf((bytes: Array[Byte]) => {
    if (bytes == null) null
    else {
      val parsed =
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (readers.hasNext) {
              val r = readers.next()
              r.setInput(iis)
              val res = (r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0))
              r.dispose()
              Some(res)
            } else None
          } finally if (iis != null) iis.close()
        } catch { case _: java.io.IOException => None }
      parsed.getOrElse {
        // STUB fallback: deterministic from the payload hash
        val h = Hll.mix64(bytes.foldLeft(17L)((acc, b) => acc * 31 + b))
        ("stub-rgb", (math.floorMod(h, 1920) + 64).toInt,
          (math.floorMod(h >>> 17, 1080) + 64).toInt)
      }
    }
  })

  /** REAL image resize: decode via `javax.imageio`, scale with
    * `Graphics2D` bilinear interpolation, re-encode as PNG (pure JVM, same
    * approach as the decode path — no native codec). Payloads no reader
    * recognizes (video containers, synthetic stub bytes) fall back to a
    * deterministic STUB payload so downstream plans stay testable.
    */
  val resizeImage = F.udf((bytes: Array[Byte], w: Int, h: Int) => {
    if (bytes == null) null
    else {
      val decoded =
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        catch { case _: java.io.IOException => None }
      decoded match {
        case Some(src) =>
          val dst = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, w, h, null)
          } finally g.dispose()
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", out)
          out.toByteArray
        case None =>
          // STUB fallback: deterministic payload derived from the input
          val n = math.max(1, w * h / 64)
          val out = new Array[Byte](n)
          var i = 0
          var st = bytes.foldLeft(0x9E3779B9L)((acc, b) => acc * 31 + b)
          while (i < n) { st = Hll.mix64(st); out(i) = st.toByte; i += 1 }
          out
      }
    }
  })

  /** REAL multi-frame encode: n deterministic solid-color frames → animated
    * GIF bytes via the JDK's `javax.imageio` GIF sequence writer (pure JVM).
    * Frame f is filled with palette color f (pixel value encodes the frame
    * index), so the frame-sampling kernel's index arithmetic is verifiable
    * by decoding a sampled frame's pixels (TextOpsSpec).
    */
  val encodeGif = F.udf((w: Int, h: Int, nFrames: Int) => {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        try {
          // color channels spread the index so GIF palette quantization
          // cannot merge two frame colors
          g.setColor(new java.awt.Color((f * 37) % 256, (f * 101) % 256, (f * 197) % 256))
          g.fillRect(0, 0, w, h)
        } finally g.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  })

  /** REAL frame sampling: parse the container with `javax.imageio`, read its
    * frame count, decode k evenly-spaced frames (frame i ↦ index ⌊i·n/k⌋ —
    * the uniform temporal sampling a training pipeline wants), re-encode
    * each as PNG. Works for any multi-frame format the JVM ships a reader
    * for (GIF in this container; TIFF in newer JDKs). Payloads no reader
    * recognizes (real-world MP4 etc. — codec-bound) fall back to the
    * deterministic STUB frames so downstream plans stay testable.
    */
  val sampleFrames = F.udf((bytes: Array[Byte], k: Int) => {
    if (bytes == null) Array.empty[Array[Byte]]
    else {
      val real =
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (readers.hasNext) {
              val r = readers.next()
              try {
                r.setInput(iis)
                val n = r.getNumImages(true)
                if (n >= 1) Some((0 until k).map { i =>
                  val frame = r.read(math.min(i * n / k, n - 1))
                  val out = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(frame, "png", out)
                  out.toByteArray
                }.toArray)
                else None
              } finally r.dispose()
            } else None
          } finally if (iis != null) iis.close()
        } catch { case _: java.io.IOException => None }
      real.getOrElse {
        // STUB fallback: deterministic pseudo-frames from the payload hash
        (0 until k).map { i =>
          val st = Hll.mix64(bytes.foldLeft(i.toLong + 1)((acc, b) => acc * 31 + b))
          Array.tabulate[Byte](16)(j => (st >>> (j * 4)).toByte)
        }.toArray
      }
    }
  })

  /** REAL feature extraction: decode, downscale to a √dims × √dims grid
    * (Graphics2D bilinear — the same pure-JVM kernel as [[resizeImage]]),
    * take per-cell luminance, unit-normalize → a deterministic
    * intensity-grid embedding (the perceptual-hash family: nearby images ↦
    * nearby vectors, so cosine similarity downstream is meaningful). Slot an
    * ONNX/JNI encoder here for learned embeddings — same signature, same
    * plan shape. `dims` must be a perfect square for the image path;
    * undecodable payloads fall back to a deterministic hash STUB vector so
    * the synthetic media-table plumbing stays testable.
    */
  def embedImage(dims: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    F.udf((bytes: Array[Byte]) => {
      if (bytes == null) null
      else {
        val side = math.sqrt(dims.toDouble).toInt
        val decoded =
          if (side * side != dims) None
          else
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
            catch { case _: java.io.IOException => None }
        decoded match {
          case Some(src) =>
            val grid = new java.awt.image.BufferedImage(side, side,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = grid.createGraphics()
            try {
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(src, 0, 0, side, side, null)
            } finally g.dispose()
            val v = Array.tabulate(dims) { i =>
              val rgb = grid.getRGB(i % side, i / side)
              // ITU-R BT.601 luma, scaled to [0,1]
              (0.299f * ((rgb >> 16) & 0xFF) + 0.587f * ((rgb >> 8) & 0xFF) +
                0.114f * (rgb & 0xFF)) / 255f
            }
            val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
            if (n > 1e-6f) v.map(_ / n)
            else Array.fill(dims)(1f / math.sqrt(dims.toDouble).toFloat) // all-black image
          case None =>
            // STUB fallback: deterministic from the payload hash
            var st = bytes.foldLeft(42L)((acc, b) => acc * 31 + b)
            val v = Array.tabulate(dims) { _ =>
              st = Hll.mix64(st)
              ((st & 0xFFFF).toFloat / 32768f) - 1f
            }
            val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
            v.map(_ / n)
        }
      }
    })

  /** REAL audio encode: deterministic 16-bit mono PCM → WAV container via
    * `javax.sound.sampled` (pure JVM). Sample t is the integer-arithmetic
    * `((seed+1)·(t+1)) mod 2001 − 1000` — no engine hash — so downstream
    * features (RMS, peak) are recomputable bit-exactly in SQL: squares and
    * their sums stay integral (≤ 2^53), making the double math identical
    * across engines regardless of summation order.
    */
  val encodeWav = F.udf((nSamples: Int, sampleRate: Int, seed: Long) => {
    val pcm = new Array[Byte](nSamples * 2)
    var t = 0
    while (t < nSamples) {
      val s = (((seed + 1) * (t + 1)) % 2001 - 1000).toInt
      pcm(2 * t) = (s & 0xFF).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xFF).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  })

  /** REAL audio decode + feature extraction: parse the container header with
    * `javax.sound.sampled`, stream the PCM frames, compute clip-level
    * features (frame count, RMS energy, peak amplitude) in one pass —
    * (format, sample_rate_hz, channels, frames, rms, peak). Works for any
    * format the JVM ships a provider for (WAV/AIFF/AU); codec-bound
    * payloads (MP3 etc.) fall back to the deterministic STUB tuple.
    */
  val decodeAudio = F.udf((bytes: Array[Byte]) => {
    if (bytes == null) null
    else {
      val real =
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            if (fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1) {
              val data = ais.readAllBytes()
              val n = data.length / 2
              var sum = 0L
              var peak = 0L
              var i = 0
              while (i < n) {
                val lo = data(2 * i) & 0xFF
                val hi = data(2 * i + 1).toInt << 8
                val s = (lo | hi).toShort.toLong
                sum += s * s
                if (math.abs(s) > peak) peak = math.abs(s)
                i += 1
              }
              val rms = if (n == 0) 0.0 else math.sqrt(sum.toDouble / n)
              Some(("wave", fmt.getSampleRate.toInt, fmt.getChannels, n.toLong, rms, peak))
            } else None
          } finally ais.close()
        } catch { case _: Exception => None }
      real.getOrElse {
        // STUB fallback: deterministic from the payload hash
        val h = Hll.mix64(bytes.foldLeft(23L)((acc, b) => acc * 31 + b))
        ("stub-pcm", 8000, 1, math.floorMod(h, 100000L),
          math.floorMod(h >>> 16, 1000L).toDouble, math.floorMod(h >>> 32, 32768L))
      }
    }
  })

  /** Video path: sample k frames per payload, explode to one row per frame,
    * decode each frame's header — (media_id, frame_idx, format, width,
    * height). Repartitions by media_id first so frame-decode work spreads
    * evenly regardless of source layout; at 100 TB the explode multiplies
    * rows by k, so the shuffle happens on the SMALL (one-row-per-video)
    * side before the blowup.
    */
  def frameTable(media: DataFrame, k: Int = 3, partitions: Int = 0): DataFrame = {
    val p = if (partitions > 0) partitions
            else media.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    media.repartition(p, col("media_id"))
      .select(col("media_id"),
        posexplode(sampleFrames(col("bytes"), lit(k))).as(Seq("frame_idx", "frame")))
      .withColumn("decoded", decodeImage(col("frame")))
      .select(col("media_id"), col("frame_idx"),
        col("decoded._1").as("format"),
        col("decoded._2").as("width"),
        col("decoded._3").as("height"))
  }

  /** decode → resize → embed pipeline over the media table: the plan a real
    * multimodal featurizer runs, with stub kernels. Repartitions by media_id
    * so kernel work spreads evenly regardless of source file layout.
    */
  def featurize(media: DataFrame, dims: Int = 64, partitions: Int = 0): DataFrame = {
    val p = if (partitions > 0) partitions
            else media.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    media.repartition(p, col("media_id"))
      .withColumn("decoded", decodeImage(col("bytes")))
      .withColumn("resized", resizeImage(col("bytes"), lit(64), lit(64)))
      // re-decode the resized payload: proves the resize kernel really
      // produced a 64×64 image (oracle-checkable in q_media_features)
      .withColumn("rdec", decodeImage(col("resized")))
      .withColumn("embedding", embedImage(dims)(col("resized")))
      .select(col("media_id"), col("kind"), col("meta"),
        col("decoded._1").as("format"),
        col("decoded._2").as("width"),
        col("decoded._3").as("height"),
        col("rdec._2").as("resized_width"),
        col("rdec._3").as("resized_height"),
        col("embedding"))
  }
}
