package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed per partition in bounded
  * batches. The IMAGE codec is REAL — `javax.imageio` ships in the JDK
  * (PNG/JPEG/GIF/BMP), so image payloads decode to true width/height
  * and a downsampled-luminance feature with zero external
  * dependencies. The AUDIO codec is REAL too — `javax.sound.sampled`
  * is equally JDK-only, so WAV/PCM payloads decode to true sample
  * rate, channel count, duration, windowed RMS, and peak. VIDEO
  * remains a clearly-marked deterministic STUB (the JDK ships no video
  * codec); a production deployment swaps `stubDecode` for a real codec
  * (e.g. an FFmpeg JNI binding) without touching any of the
  * distribution logic — all paths share one schema and one batching
  * shape.
  *
  * Scale: payloads never shuffle — every operator is a mapPartitions
  * projection; only the (small) extracted features move. Batch size
  * bounds peak memory per task regardless of payload sizes. A 100 TB
  * deployment should additionally cap decoded pixel count per payload
  * (decompression-bomb guard) — the `maxPixels` parameter below.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", IntegerType, nullable = true)))

  /** `width`/`height` are the DECODED image dimensions;
    * `sample_rate`/`channels`/`duration_ms`/`peak` are the DECODED
    * audio properties. Each group is null off its own codec path (byte
    * statistics have neither geometry nor a time axis).
    */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("duration_ms", IntegerType, nullable = true),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("peak", FloatType, nullable = true)))

  // ImageIO's default scratch cache is a temp FILE per decode — at one
  // decode per row that is an I/O disaster; keep scratch in memory
  javax.imageio.ImageIO.setUseCache(false)

  /** REAL image decode via the JDK's ImageIO: payload → (width, height,
    * `dim`-bucket mean-luminance feature). Pixels are flattened
    * row-major and averaged into `dim` equal buckets (Rec. 601 luma,
    * normalized to [0,1]) — a fixed-length signature independent of
    * image size, the pHash-style input [[nearDupMedia]] signs. Returns
    * None when the bytes aren't a decodable image (wrong format,
    * truncated, or over `maxPixels` — the decompression-bomb guard), at
    * which point callers fall back to [[stubDecode]].
    */
  private[ops] def decodeImage(payload: Array[Byte], dim: Int,
                               maxPixels: Long = 1L << 26)
      : Option[(Int, Int, Array[Float])] = {
    if (payload == null || payload.length < 8) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
      val n = w.toLong * h
      val sums = new Array[Double](dim)
      val cnts = new Array[Long](dim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF)
            + 0.114 * (rgb & 0xFF)) / 255.0
          val idx = (((y.toLong * w + x) * dim) / n).toInt
          sums(idx) += lum
          cnts(idx) += 1
          x += 1
        }
        y += 1
      }
      Some((w, h,
        Array.tabulate(dim)(i => if (cnts(i) == 0) 0f else (sums(i) / cnts(i)).toFloat)))
    } catch { case _: Exception => None }
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled`: WAV/PCM
    * payload → (sample_rate, channels, duration_ms, `dim`-window RMS
    * feature, global peak). Frames are channel-averaged to mono,
    * normalized to [−1, 1], and reduced to root-mean-square per `dim`
    * equal time windows — the audio analogue of [[decodeImage]]'s
    * bucketed luminance (a fixed-length loudness envelope independent
    * of clip length, usable by the same downstream signature ops).
    * Returns None when the bytes aren't RIFF/WAVE (cheap magic sniff —
    * no exception cost on image/stub payloads), aren't integer PCM of
    * 8 or 16 bits, or exceed `maxFrames` (the audio decompression-bomb
    * guard), at which point callers fall back to [[stubDecode]].
    */
  private[ops] def decodeWav(payload: Array[Byte], dim: Int,
                             maxFrames: Long = 1L << 24)
      : Option[(Int, Int, Int, Array[Float], Float)] = {
    if (payload == null || payload.length < 44) return None
    if (!(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
          payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
          payload(10) == 'V' && payload(11) == 'E')) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (!signed && enc != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
          return None
        val channels = fmt.getChannels
        val bytesPerSample = fmt.getSampleSizeInBits / 8
        val nFrames = in.getFrameLength
        if (channels < 1 || bytesPerSample < 1 || bytesPerSample > 2 ||
            nFrames <= 0 || nFrames > maxFrames) return None
        val sampleRate = math.round(fmt.getSampleRate)
        if (sampleRate <= 0) return None
        val bytes = in.readAllBytes()
        val frameBytes = bytesPerSample * channels
        val frames = math.min(nFrames, bytes.length / frameBytes).toInt
        if (frames <= 0) return None
        val sumsq = new Array[Double](dim)
        val cnts = new Array[Long](dim)
        var peak = 0.0
        var f = 0
        while (f < frames) {
          var c = 0
          var acc = 0.0
          while (c < channels) {
            val off = f * frameBytes + c * bytesPerSample
            val s =
              if (bytesPerSample == 1) {
                if (signed) bytes(off) / 128.0 else ((bytes(off) & 0xFF) - 128) / 128.0
              } else {
                val (b0, b1) =
                  if (fmt.isBigEndian) (bytes(off + 1), bytes(off)) else (bytes(off), bytes(off + 1))
                val raw = ((b1 << 8) | (b0 & 0xFF)).toShort.toInt
                (if (signed) raw else ((raw & 0xFFFF) - 32768)) / 32768.0
              }
            acc += s
            c += 1
          }
          val mono = acc / channels
          if (math.abs(mono) > peak) peak = math.abs(mono)
          val idx = ((f.toLong * dim) / frames).toInt
          sumsq(idx) += mono * mono
          cnts(idx) += 1
          f += 1
        }
        val durationMs = (nFrames * 1000L / sampleRate).toInt
        Some((sampleRate, channels, durationMs,
          Array.tabulate(dim)(i =>
            if (cnts(i) == 0) 0f else math.sqrt(sumsq(i) / cnts(i)).toFloat),
          peak.toFloat))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** STUB decode — deterministic bytes→feature map standing in for a
    * real codec (VIDEO only, since round 9). Produces a `dim`-length
    * feature from byte statistics; same payload ⇒ same feature on any
    * executor.
    */
  private[ops] def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    val n = math.max(1, payload.length / dim)
    var j = 0
    while (j < dim) { out(j) /= n; j += 1 }
    out
  }

  /** Feature extraction over binary payloads: mapPartitions in batches
    * of `batchSize` rows (the mapInPandas batch shape, Scala-side).
    * Each payload is sniffed by magic bytes (cheap — no exception
    * cost): PNG/JPEG/GIF/BMP take the REAL ImageIO decode (true
    * geometry + luminance buckets), RIFF/WAVE takes the REAL
    * `javax.sound.sampled` decode (true sample rate / channels /
    * duration + windowed-RMS envelope + peak), and anything else —
    * video and opaque bytes — falls back to the deterministic stub.
    * One schema for all three paths.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary = the codec's vectorization unit
          batch.iterator.map { r =>
            val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
            val nBytes = if (payload == null) 0 else payload.length
            decodeImage(payload, dim) match {
              case Some((w, h, feat)) =>
                Row(r.getLong(0), nBytes,
                  Integer.valueOf(w), Integer.valueOf(h),
                  null, null, null, feat.toSeq, null)
              case None => decodeWav(payload, dim) match {
                case Some((rate, ch, ms, rms, peak)) =>
                  Row(r.getLong(0), nBytes, null, null,
                    Integer.valueOf(rate), Integer.valueOf(ch),
                    Integer.valueOf(ms), rms.toSeq, java.lang.Float.valueOf(peak))
                case None =>
                  Row(r.getLong(0), nBytes, null, null, null, null, null,
                    stubDecode(payload, dim).toSeq, null)
              }
            }
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Deterministic PNG fixture generator: one real `size`×`size` PNG
    * payload per id, REAL bytes from the JDK's PNG encoder — the
    * container ships no media fixtures, so this op is how the ImageIO
    * decode path gets exercised end-to-end at fixture scale. The pixel
    * pattern is a pure function of the id: a base gradient keyed by
    * `id mod 32` (so ids sharing a base render near-identical images —
    * the near-dup structure [[nearDupMedia]] mines) plus one id-keyed
    * "noise" pixel (so same-base images are close, not equal). Same
    * mapPartitions shape as every other codec op; payload generation
    * never shuffles.
    */
  def syntheticPng(ids: DataFrame, idCol: String, size: Int = 8): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val img = new java.awt.image.BufferedImage(
          size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val base = (id % 32).toInt
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) {
            val lum = (base * 37 + x * 11 + y * 23) % 256
            img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
            x += 1
          }
          y += 1
        }
        val noisePos = ((id / 32) % (size.toLong * size)).toInt
        val noiseLum = ((id * 13) % 256).toInt
        img.setRGB(noisePos % size, noisePos / size,
          (noiseLum << 16) | (noiseLum << 8) | noiseLum)
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        Row(id, "image", baos.toByteArray, size, size, null)
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Deterministic WAV fixture generator — the audio sibling of
    * [[syntheticPng]]: one real RIFF/WAVE payload per id (16-bit
    * signed PCM mono, 8 kHz, `samples` frames), REAL bytes from the
    * JDK's `AudioSystem` WAVE writer, so the `javax.sound.sampled`
    * decode path is exercised end-to-end at fixture scale. The signal
    * is a pure function of the id: a ±0.25 full-scale square wave
    * whose half-period is keyed by `id mod 32` (ids sharing a base
    * sound near-identical — the near-dup structure the signature ops
    * mine) plus one id-keyed spike sample (so same-base clips are
    * close, not equal). ±8192/32768 = ±0.25 is exact in binary
    * floating point, so windowed RMS and peak decode to exactly 0.25 —
    * the spec anchors on that. Payload generation never shuffles.
    */
  def syntheticWav(ids: DataFrame, idCol: String, samples: Int = 400,
                   sampleRate: Int = 8000): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val half = 2 + (id % 32).toInt // square-wave half-period in frames
        val pcm = new Array[Byte](samples * 2)
        var f = 0
        while (f < samples) {
          val amp: Short = if ((f / half) % 2 == 0) 8192 else -8192
          pcm(2 * f) = (amp & 0xFF).toByte          // little-endian
          pcm(2 * f + 1) = ((amp >> 8) & 0xFF).toByte
          f += 1
        }
        val spikePos = ((id / 32) % samples).toInt  // id-keyed uniqueness
        val spike: Short = (4096 + (id * 13) % 4096).toShort
        pcm(2 * spikePos) = (spike & 0xFF).toByte
        pcm(2 * spikePos + 1) = ((spike >> 8) & 0xFF).toByte
        val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
          true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, samples.toLong)
        val baos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
        Row(id, "audio", baos.toByteArray, null, null,
          Integer.valueOf((samples.toLong * 1000 / sampleRate).toInt))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Frame sampling for video payloads: emit `frames` evenly-spaced
    * (frame_idx, frame_ts_ms, frame_feature) rows per video — the
    * row-explosion plumbing a real frame decoder plugs into.
    */
  def sampleFrames(media: DataFrame, frames: Int, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_ts_ms", IntegerType, nullable = false),
      StructField("frame_feature", ArrayType(FloatType, containsNull = false))))
    val rdd = media
      .where(col("media_type") === "video")
      .select(col("media_id"), col("payload"), coalesce(col("duration_ms"), lit(0)))
      .rdd.mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val dur = r.getInt(2)
          (0 until frames).iterator.map { f =>
            val tsMs = if (frames == 1) 0 else dur * f / (frames - 1)
            // STUB frame decode: slice the payload deterministically
            val lo = if (payload.isEmpty) 0 else (payload.length.toLong * f / frames).toInt
            val hi = if (payload.isEmpty) 0 else (payload.length.toLong * (f + 1) / frames).toInt
            Row(id, f, tsMs, stubDecode(payload.slice(lo, hi), dim).toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Image resize: payload → re-encoded payload at (targetW, targetH),
    * metadata updated in the same pass. STUB codec: the fake "resample"
    * scales the byte budget by the pixel ratio deterministically; a real
    * implementation swaps `stubResize` for a decoder+scaler+encoder
    * without touching the mapPartitions shape.
    */
  private[ops] def stubResize(payload: Array[Byte], srcW: Int, srcH: Int,
                              dstW: Int, dstH: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty || srcW <= 0 || srcH <= 0)
      return Array.emptyByteArray
    val n = math.max(1,
      (payload.length.toLong * dstW * dstH / (srcW.toLong * srcH)).toInt)
    // deterministic fake resample: stride-sample source bytes
    Array.tabulate(n)(i => payload(((i.toLong * payload.length) / n).toInt))
  }

  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media
      .where(col("media_type") === "image")
      .select(col("media_id"), col("media_type"), col("payload"),
        col("width"), col("height"), col("duration_ms"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          val w = if (r.isNullAt(3)) 0 else r.getInt(3)
          val h = if (r.isNullAt(4)) 0 else r.getInt(4)
          Row(r.getLong(0), r.getString(1),
            stubResize(payload, w, h, targetW, targetH),
            targetW, targetH,
            if (r.isNullAt(5)) null else Integer.valueOf(r.getInt(5)))
        }
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Metadata-only projection — payload column pruned at the scan, so
    * a metadata query over 100 TB of media reads only the footer stats
    * and the narrow columns.
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("media_type"),
      col("width"), col("height"), col("duration_ms"),
      length(col("payload")).as("n_bytes"))

  /** Perceptual near-duplicate pairs over binary payloads — the pHash
    * dedup shape: decode to a feature (STUB codec; a real pHash/CLIP
    * embedding drops into the same plumbing), sign-project to a 64-bit
    * signature (random-hyperplane LSH — the native `lsh_sign_bits`
    * codegen expression), then find signature pairs within `maxHamming`
    * bits via 16-bit band buckets.
    *
    * Exactness: by pigeonhole, two signatures ≤ 3 bits apart share at
    * least one of the four 16-bit bands, so candidate generation has
    * FULL recall for `maxHamming` ≤ 3; larger radii are best-effort
    * (standard LSH tradeoff — add bands to push the guarantee out).
    *
    * Scale shape: payloads never shuffle — features are extracted
    * map-side and collapse to one long per payload BEFORE any exchange.
    * Banding moves (band_idx, band_value, id, sig) rows (4 per media);
    * only bucket collisions become pairs, verified with the codegen
    * `bit_count` hamming and deduplicated across bands.
    */
  def nearDupMedia(media: DataFrame, dim: Int = 16,
                   maxHamming: Int = 3): DataFrame = {
    // center each feature on its own mean before sign-hashing — the
    // pHash construction (bits = coefficient vs median): raw byte
    // histograms are near-constant vectors, and sign-LSH is
    // scale-invariant, so WITHOUT centering every bland payload hashes
    // identically and candidate generation goes quadratic. The centered
    // vector captures the payload's position pattern instead.
    val feats = extractFeatures(media, dim)
    val mean = aggregate(col("feature"), lit(0.0d), (a, x) => a + x) /
      greatest(size(col("feature")), lit(1))
    val sigs = feats
      .select(col("media_id"),
        transform(col("feature"), x => x - mean).as("__cf"))
      .select(col("media_id"),
        graft.expressions.VectorExprs.lshSignBits(col("__cf"), 64).as("__sig"))
      .localCheckpoint(false) // decode once: both join sides reuse it
    val bands = sigs.select(col("media_id"), col("__sig"),
        explode(sequence(lit(0), lit(3))).as("__b"))
      .withColumn("__bv",
        expr("shiftrightunsigned(__sig, __b * 16)").bitwiseAND(lit(0xFFFFL)))
    val left = bands.select(col("media_id").as("id_a"),
      col("__sig").as("__sa"), col("__b"), col("__bv"))
    val right = bands.select(col("media_id").as("id_b"),
      col("__sig").as("__sb"), col("__b"), col("__bv"))
    left.join(right, Seq("__b", "__bv"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__sa"), col("__sb"))
      .distinct() // a pair may collide in several bands
      .select(col("id_a"), col("id_b"),
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
