package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed per partition in bounded
  * batches. ALL THREE codecs are REAL and JDK-only: IMAGE via
  * `javax.imageio` (PNG/JPEG/GIF/BMP → true width/height and a
  * bucketed-luminance feature), AUDIO via `javax.sound.sampled`
  * (WAV/PCM → true sample rate, channel count, duration, windowed
  * RMS, peak), and VIDEO via a hand-rolled RIFF/AVI container parser
  * ([[parseAvi]]) whose frames the JDK itself decodes — MJPEG `00dc`
  * frames are plain JPEGs (ImageIO), and uncompressed 24-bit DIB
  * `00db` frames are decoded directly. Payloads in any OTHER video
  * container (the JDK ships no general codec) fall back to the
  * clearly-marked deterministic [[stubDecode]]; a production
  * deployment swaps in an FFmpeg JNI binding at [[decodeAvi]]'s seam
  * without touching any of the distribution logic — all paths share
  * one schema and one batching shape.
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

  // ------------------------------------------------------------- video

  /** Acoustic fingerprint decode: per-window RMS (loudness) AND
    * zero-crossing rate (the cheap spectral proxy — ZCR of a periodic
    * signal tracks its fundamental frequency). The RMS envelope alone
    * is the audio version of the video-envelope trap measured for
    * q153: the fixture corpus (and much real audio) is
    * constant-loudness, so an RMS-only signature is a
    * near-non-discriminator; ZCR separates same-loudness clips with
    * different content. Returns `[rms_0..rms_{w−1}, zcr_0..zcr_{w−1}]`.
    * Same streaming one-pass shape as [[decodeWav]] (the sample-read
    * inner loop is duplicated deliberately: a per-sample visitor
    * closure would box 16M samples on the hot decode path).
    */
  private[ops] def decodeWavFingerprint(payload: Array[Byte], windows: Int,
                                        maxFrames: Long = 1L << 24)
      : Option[Array[Float]] = {
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
        val bytes = in.readAllBytes()
        val frameBytes = bytesPerSample * channels
        val frames = math.min(nFrames, bytes.length / frameBytes).toInt
        if (frames <= 0) return None
        val sumsq = new Array[Double](windows)
        val cross = new Array[Long](windows)
        val cnts = new Array[Long](windows)
        var prev = 0.0
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
          val idx = ((f.toLong * windows) / frames).toInt
          sumsq(idx) += mono * mono
          cnts(idx) += 1
          if (f > 0 && prev * mono < 0) cross(idx) += 1
          prev = mono
          f += 1
        }
        Some(Array.tabulate(2 * windows) { i =>
          if (i < windows) {
            if (cnts(i) == 0) 0f else math.sqrt(sumsq(i) / cnts(i)).toFloat
          } else {
            val w = i - windows
            if (cnts(w) == 0) 0f else (cross(w).toDouble / cnts(w)).toFloat
          }
        })
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Parsed AVI container: geometry/timing from the `avih` main header
    * and the byte extent of every video frame chunk in `movi` order
    * (`isDib` = uncompressed `00db` frame vs MJPEG `00dc`). */
  private[ops] final case class AviInfo(
      width: Int, height: Int, microSecPerFrame: Int, bitCount: Int,
      frames: Vector[(Int, Int, Boolean)]) {
    def nFrames: Int = frames.length
    def durationMs: Int = (frames.length.toLong * microSecPerFrame / 1000L).toInt
    def fps: Int =
      if (microSecPerFrame <= 0) 0 else math.round(1e6 / microSecPerFrame).toInt
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def cc(b: Array[Byte], off: Int): String =
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Generic RIFF chunk walk over an AVI payload (public AVI RIFF
    * layout: `RIFF('AVI ' LIST('hdrl' avih …) LIST('movi' ##dc/##db …)
    * [idx1])`): collects the `avih` main header (geometry + frame
    * period), the first stream format's bit depth (`strf`,
    * BITMAPINFOHEADER), and the extent of every `##dc`/`##db` frame
    * chunk. Bounds-checked throughout — a malformed chunk size
    * truncates the walk instead of throwing, and a payload without the
    * RIFF/AVI magic returns None from the two magic compares alone (no
    * exception cost on image/audio/opaque payloads).
    */
  private[ops] def parseAvi(payload: Array[Byte]): Option[AviInfo] = {
    if (payload == null || payload.length < 24) return None
    if (!(cc(payload, 0) == "RIFF" && cc(payload, 8) == "AVI ")) return None
    var width = 0; var height = 0; var uspf = 0; var bitCount = -1
    val frames = Vector.newBuilder[(Int, Int, Boolean)]
    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val id = cc(payload, pos)
        val sz = le32(payload, pos + 4)
        if (sz < 0 || pos + 8 + sz > end) return // malformed: stop cleanly
        id match {
          case "LIST" if sz >= 4 => walk(pos + 12, pos + 8 + sz)
          case "avih" if sz >= 40 =>
            uspf = le32(payload, pos + 8)        // dwMicroSecPerFrame
            width = le32(payload, pos + 8 + 32)  // dwWidth
            height = le32(payload, pos + 8 + 36) // dwHeight
          case "strf" if sz >= 16 && bitCount < 0 =>
            bitCount = le16(payload, pos + 8 + 14) // BITMAPINFOHEADER.biBitCount
          case _ if id(0).isDigit && id(1).isDigit &&
              (id.substring(2) == "dc" || id.substring(2) == "db") =>
            frames += ((pos + 8, sz, id.substring(2) == "db"))
          case _ => ()
        }
        pos += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
      }
    }
    walk(12, payload.length)
    val fr = frames.result()
    if (fr.isEmpty || uspf <= 0 || width <= 0 || height <= 0) None
    else Some(AviInfo(width, height, uspf, if (bitCount < 0) 24 else bitCount, fr))
  }

  /** Decode one frame chunk to a `dim`-bucket mean-luminance feature
    * (the [[decodeImage]] reduction): MJPEG frames are plain JPEGs —
    * the JDK's ImageIO decodes them — and uncompressed 24-bit DIB
    * frames (bottom-up, BGR, 4-byte-aligned rows) are read directly. */
  private def frameLumBuckets(payload: Array[Byte], off: Int, sz: Int,
                              isDib: Boolean, w: Int, h: Int, bitCount: Int,
                              dim: Int, maxPixels: Long): Option[Array[Float]] = {
    if (!isDib)
      return decodeImage(java.util.Arrays.copyOfRange(payload, off, off + sz),
        dim, maxPixels).map(_._3)
    if (bitCount != 24 || w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (sz.toLong < stride.toLong * h) return None
    val n = w.toLong * h
    val sums = new Array[Double](dim)
    val cnts = new Array[Long](dim)
    var y = 0
    while (y < h) {
      val rowOff = off + (h - 1 - y) * stride // DIB rows are bottom-up
      var x = 0
      while (x < w) {
        val b = payload(rowOff + 3 * x) & 0xFF
        val g = payload(rowOff + 3 * x + 1) & 0xFF
        val r = payload(rowOff + 3 * x + 2) & 0xFF
        val lum = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
        val idx = (((y.toLong * w + x) * dim) / n).toInt
        sums(idx) += lum
        cnts(idx) += 1
        x += 1
      }
      y += 1
    }
    Some(Array.tabulate(dim)(i => if (cnts(i) == 0) 0f else (sums(i) / cnts(i)).toFloat))
  }

  /** REAL video decode via the RIFF/AVI walk + per-frame JDK decode:
    * payload → (width, height, fps, duration_ms, `dim`-window temporal
    * mean-luminance envelope, peak frame luminance) — the video
    * analogue of [[decodeWav]]'s RMS envelope. Work per payload is
    * BOUNDED regardless of clip length: at most `maxFramesDecoded`
    * evenly-spaced frames decode (each under the [[decodeImage]]
    * `maxPixels` bomb guard), and the envelope windows by ORIGINAL
    * frame index so sampling preserves the time axis. Returns None
    * when the bytes aren't RIFF/AVI, the header is malformed, or no
    * frame decodes — callers fall back to [[stubDecode]].
    */
  private[ops] def decodeAvi(payload: Array[Byte], dim: Int,
                             maxFramesDecoded: Int = 64,
                             maxPixels: Long = 1L << 26)
      : Option[(Int, Int, Int, Int, Array[Float], Float)] = {
    parseAvi(payload).flatMap { info =>
      try {
        val n = info.nFrames
        val take = math.min(n, maxFramesDecoded)
        val sums = new Array[Double](dim)
        val cnts = new Array[Long](dim)
        var peak = 0.0
        var decoded = 0
        var s = 0
        while (s < take) {
          val fi = ((s.toLong * n) / take).toInt
          val (off, sz, isDib) = info.frames(fi)
          frameLumBuckets(payload, off, sz, isDib, info.width, info.height,
            info.bitCount, 1, maxPixels).foreach { mean1 =>
            val m = mean1(0)
            if (m > peak) peak = m
            val w = ((fi.toLong * dim) / n).toInt
            sums(w) += m
            cnts(w) += 1
            decoded += 1
          }
          s += 1
        }
        if (decoded == 0) None
        else Some((info.width, info.height, info.fps, info.durationMs,
          Array.tabulate(dim)(i =>
            if (cnts(i) == 0) 0f else (sums(i) / cnts(i)).toFloat),
          peak.toFloat))
      } catch { case _: Exception => None }
    }
  }

  // -- RIFF/AVI writer (fixture-scale encoder; shares no code with the
  //    parser, so round-trip tests exercise both directions honestly) --
  private def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
  }
  private def w32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
    o.write((v >> 16) & 0xFF); o.write((v >> 24) & 0xFF)
  }
  private def wcc(o: java.io.ByteArrayOutputStream, s: String): Unit =
    o.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream(data.length + 10)
    wcc(o, id); w32(o, data.length); o.write(data, 0, data.length)
    if ((data.length & 1) == 1) o.write(0) // word-align
    o.toByteArray
  }
  private def riffList(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    wcc(o, typ)
    parts.foreach(p => o.write(p, 0, p.length))
    riffChunk("LIST", o.toByteArray)
  }

  /** Assemble a single-video-stream AVI — public AVI RIFF layout
    * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
    * LIST('movi' frames…) idx1)` — around pre-encoded frame chunks:
    * JPEG bytes for MJPEG (`00dc`) or bottom-up BGR DIB rows (`00db`,
    * for bit-exact tests). */
  private[ops] def buildAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
                            fps: Int, dib: Boolean): Array[Byte] = {
    require(frames.nonEmpty && fps > 0, "buildAvi needs frames and fps > 0")
    val maxFrame = frames.map(_.length).max
    val avih = {
      val o = new java.io.ByteArrayOutputStream(56)
      w32(o, 1000000 / fps); w32(o, maxFrame * fps); w32(o, 0)
      w32(o, 0x10) // AVIF_HASINDEX
      w32(o, frames.length); w32(o, 0); w32(o, 1); w32(o, maxFrame)
      w32(o, w); w32(o, h)
      (0 until 4).foreach(_ => w32(o, 0))
      o.toByteArray
    }
    val strh = {
      val o = new java.io.ByteArrayOutputStream(56)
      wcc(o, "vids"); wcc(o, if (dib) "DIB " else "MJPG")
      w32(o, 0); w16(o, 0); w16(o, 0); w32(o, 0)
      w32(o, 1); w32(o, fps) // dwScale / dwRate = fps
      w32(o, 0); w32(o, frames.length); w32(o, maxFrame); w32(o, -1); w32(o, 0)
      w16(o, 0); w16(o, 0); w16(o, w); w16(o, h)
      o.toByteArray
    }
    val strf = {
      val o = new java.io.ByteArrayOutputStream(40)
      w32(o, 40); w32(o, w); w32(o, h); w16(o, 1); w16(o, 24)
      if (dib) w32(o, 0) else wcc(o, "MJPG") // biCompression
      w32(o, frames.head.length); w32(o, 0); w32(o, 0); w32(o, 0); w32(o, 0)
      o.toByteArray
    }
    val hdrl = riffList("hdrl", riffChunk("avih", avih),
      riffList("strl", riffChunk("strh", strh), riffChunk("strf", strf)))
    val fid = if (dib) "00db" else "00dc"
    val frameChunks = frames.map(f => riffChunk(fid, f))
    val movi = riffList("movi", frameChunks: _*)
    val idx1 = {
      val o = new java.io.ByteArrayOutputStream(16 * frames.length)
      var off = 4 // offsets are relative to the 'movi' fourcc
      frames.zip(frameChunks).foreach { case (f, fc) =>
        wcc(o, fid); w32(o, 0x10); w32(o, off); w32(o, f.length)
        off += fc.length
      }
      o.toByteArray
    }
    val body = new java.io.ByteArrayOutputStream()
    wcc(body, "AVI ")
    Seq(hdrl, movi, riffChunk("idx1", idx1)).foreach(p => body.write(p, 0, p.length))
    riffChunk("RIFF", body.toByteArray)
  }

  /** STUB decode — deterministic bytes→feature map standing in for a
    * real codec (non-AVI video containers and opaque bytes only, since
    * round 9). Produces a `dim`-length feature from byte statistics;
    * same payload ⇒ same feature on any executor.
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
    * duration + windowed-RMS envelope + peak), RIFF/AVI takes the REAL
    * [[decodeAvi]] video path (true geometry / fps / duration +
    * temporal-luminance envelope + peak frame), and anything else —
    * other video containers and opaque bytes — falls back to the
    * deterministic stub. One schema for all paths; on the video row
    * `sample_rate` carries fps (frames per second IS the video
    * stream's sampling rate) and `peak` the brightest sampled frame's
    * mean luminance.
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
                case None => decodeAvi(payload, dim) match {
                  case Some((w, h, fps, ms, env, peak)) =>
                    Row(r.getLong(0), nBytes,
                      Integer.valueOf(w), Integer.valueOf(h),
                      Integer.valueOf(fps), null,
                      Integer.valueOf(ms), env.toSeq, java.lang.Float.valueOf(peak))
                  case None =>
                    Row(r.getLong(0), nBytes, null, null, null, null, null,
                      stubDecode(payload, dim).toSeq, null)
                }
              }
            }
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** SplitMix64 finalizer (public-domain constants, Steele/Lea/Flood
    * 2014) — the per-cluster pattern hash behind the synthetic media
    * fixtures below. Cheap, stateless, and avalanche-complete: two
    * different cluster ids yield statistically independent patterns.
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The fixtures' duplicate-cluster key: 32 CONSECUTIVE ids form one
    * near-dup cluster. Keying the cluster on the id's high bits (not
    * `id mod 32`, the round-9 construction) makes duplicate-cluster
    * COUNT scale with the id range while cluster SIZE stays fixed —
    * the growth law a real corpus follows (a 10× crawl has ~10× the
    * duplicate clusters, not 10×-larger clusters). Under the old
    * mod-32 key the class space was 32 FOREVER, so near-dup output
    * grew quadratically at any corpus scale — measured: ×2 corpus →
    * 4.08× pairs regardless of the replica id offset (the round-9
    * verdict's offset hypothesis; disproven in PLANS.md). With the
    * high-bit key, disjoint id ranges (e.g. ScaleUp replicas) get
    * entirely fresh clusters via [[mix64]], and output scales ~R×.
    */
  private def mediaCluster(id: Long): Long = id >>> 5

  /** Deterministic PNG fixture generator: one real `size`×`size` PNG
    * payload per id, REAL bytes from the JDK's PNG encoder — the
    * container ships no media fixtures, so this op is how the ImageIO
    * decode path gets exercised end-to-end at fixture scale. The pixel
    * pattern is a pure function of the id: a per-cluster hashed pixel
    * field keyed by [[mediaCluster]] (32 consecutive ids render
    * near-identical images — the near-dup structure [[nearDupMedia]]
    * mines, with cluster count scaling with the id range) plus one
    * id-keyed "noise" pixel (so same-cluster images are close, not
    * equal). Same mapPartitions shape as every other codec op; payload
    * generation never shuffles.
    */
  def syntheticPng(ids: DataFrame, idCol: String, size: Int = 8): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val img = new java.awt.image.BufferedImage(
          size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val cluster = mediaCluster(id)
        val px = size.toLong * size
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) {
            val lum = (mix64(cluster * px + y * size + x) & 0xFF).toInt
            img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
            x += 1
          }
          y += 1
        }
        val nz = mix64(~id) // noise stream disjoint from the pattern hash
        val noisePos = ((nz >>> 8) % px).toInt
        val noiseLum = (nz & 0xFF).toInt
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
    * is a pure function of the id: a square wave whose half-period AND
    * amplitude both vary PER SEGMENT, keyed by one [[mediaCluster]]
    * hash per segment (32 consecutive ids sound near-identical — the
    * near-dup structure the signature ops mine, with cluster count
    * scaling with the id range) plus one id-keyed spike sample (so
    * same-cluster clips are close, not equal). BOTH fingerprint halves
    * are informative: the ZCR envelope varies via the half-period
    * (2..33) and the RMS envelope via the amplitude (constant
    * amplitude would be the "constant-loudness trap" [[nearDupAudio]]'s
    * scaladoc warns about — measured: it left only ~8 effective
    * signature dims and a 0.23% accidental cross-cluster collision
    * rate, a quadratic term at corpus scale; with amplitude modulation
    * the singleton-cluster false-pair rate drops to ~0). Amplitudes are
    * 2048-multiples (4096..10240), so windowed RMS decodes to exact
    * binary fractions (0.125..0.3125 of full scale). Payload
    * generation never shuffles.
    */
  def syntheticWav(ids: DataFrame, idCol: String, samples: Int = 400,
                   sampleRate: Int = 8000): DataFrame = {
    val spark = ids.sparkSession
    val segs = 8
    val rdd = ids.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val cluster = mediaCluster(id)
        // one hash per segment, two fields: half-period 2..33 from the
        // low bits, amplitude 4096/6144/8192/10240 from bits 8-9
        val seed = Array.tabulate(segs)(s => mix64(cluster * segs + s))
        val halves = seed.map(m => 2 + (m & 31L).toInt)
        val amps = seed.map(m => (2048 * (2 + ((m >>> 8) & 3L))).toInt)
        val pcm = new Array[Byte](samples * 2)
        var f = 0
        while (f < samples) {
          val seg = f * segs / samples
          val half = halves(seg)
          val amp: Short =
            (if ((f / half) % 2 == 0) amps(seg) else -amps(seg)).toShort
          pcm(2 * f) = (amp & 0xFF).toByte          // little-endian
          pcm(2 * f + 1) = ((amp >> 8) & 0xFF).toByte
          f += 1
        }
        val nz = mix64(~id) // id-keyed uniqueness
        val spikePos = ((nz >>> 8) % samples).toInt
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

  /** Deterministic AVI fixture generator — the video sibling of
    * [[syntheticPng]]/[[syntheticWav]]: one real RIFF/AVI payload per
    * id, `frames` frames of REAL ImageIO-encoded JPEG bytes in an
    * MJPEG `00dc` stream (or uncompressed DIB `00db` when
    * `dib = true`, for bit-exact anchors — JPEG is lossy). Frame
    * pixels are a pure function of (id, frame): the [[syntheticPng]]
    * per-cluster hashed pixel field keyed by [[mediaCluster]],
    * phase-advanced per frame (so 32 consecutive ids render
    * near-identical clips — the near-dup structure the signature ops
    * mine, with cluster count scaling with the id range) plus one
    * (id, frame)-keyed noise pixel. Payload generation never shuffles.
    */
  def syntheticAvi(ids: DataFrame, idCol: String, frames: Int = 6,
                   size: Int = 16, fps: Int = 10, dib: Boolean = false): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val cluster = mediaCluster(id)
        val px = size.toLong * size
        val nz = mix64(~id)
        val frameBytes = (0 until frames).map { f =>
          val img = new java.awt.image.BufferedImage(size, size,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < size) {
            var x = 0
            while (x < size) {
              val lum =
                ((mix64(cluster * px + y * size + x) & 0xFF) + f * 29).toInt % 256
              img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
              x += 1
            }
            y += 1
          }
          val noisePos = (((nz >>> 8) + f) % px).toInt
          val noiseLum = ((nz & 0xFF) + f * 7).toInt % 256
          img.setRGB(noisePos % size, noisePos / size,
            (noiseLum << 16) | (noiseLum << 8) | noiseLum)
          if (dib) {
            val stride = ((size * 3 + 3) / 4) * 4
            val out = new Array[Byte](stride * size)
            var yy = 0
            while (yy < size) {
              var xx = 0
              while (xx < size) {
                val rgb = img.getRGB(xx, size - 1 - yy) // DIB rows: bottom-up
                val o = yy * stride + 3 * xx
                out(o) = (rgb & 0xFF).toByte // BGR order
                out(o + 1) = ((rgb >> 8) & 0xFF).toByte
                out(o + 2) = ((rgb >> 16) & 0xFF).toByte
                xx += 1
              }
              yy += 1
            }
            out
          } else {
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "jpg", baos)
            baos.toByteArray
          }
        }
        Row(id, "video", buildAvi(frameBytes, size, size, fps, dib),
          size, size, Integer.valueOf(frames * 1000 / fps))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** DC-EXACT AVI fixture generator: [[syntheticAvi]]'s MJPEG shape
    * with frames composed of FLAT 8×8 blocks, which makes the lossy
    * JPEG round-trip integer-lossless — a flat block has only a DC
    * coefficient, the JDK encoder's quality-0.75 luminance quant table
    * has Q(0,0) = 8 (libjpeg quality 75 scaling of the Annex-K table),
    * so quantization of DC = 8·(v−128) is division by 8 with zero
    * remainder and the decoder's DC-only IDCT shortcut reproduces v
    * exactly (gray blocks keep Cb = Cr = 128, flat chroma quantizes to
    * 0). MultimodalSpec pins the claim for every v in 0..255 through
    * the real encode→container→decode path. The point: the REAL codec
    * runs end-to-end (Huffman, dequantize, IDCT, container walk) yet
    * decoded luminance is a pure integer function of the generator
    * parameters, so a SQL oracle can replay the whole downstream
    * near-dup DECISION bit-for-bit — the lossless subchannel of a
    * lossy codec. The full-AC path stays exercised by [[syntheticAvi]]
    * in q151/q152 and the MultimodalSpec frame anchors.
    *
    * Block values are the [[syntheticPng]] cluster-hash field at BLOCK
    * granularity (`mix64(cluster · nBlocks + b)`), phase-advanced per
    * frame, plus one (id, frame)-keyed noise BLOCK — same near-dup
    * cluster structure, same mix64 replay the q101 oracle uses.
    * `size` must be a multiple of 8 (blocks must tile exactly: a
    * partial edge block would get non-flat padding and lose the
    * DC-only property). Payload generation never shuffles.
    */
  def syntheticAviDc(ids: DataFrame, idCol: String, frames: Int = 4,
                     size: Int = 64, fps: Int = 10): DataFrame = {
    require(size % 8 == 0, s"size must be a multiple of 8, got $size")
    val spark = ids.sparkSession
    val grid = size / 8
    val nb = grid.toLong * grid
    val rdd = ids.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val cluster = mediaCluster(id)
        val nz = mix64(~id)
        val frameBytes = (0 until frames).map { f =>
          val img = new java.awt.image.BufferedImage(size, size,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val noisePos = (((nz >>> 8) + f) % nb).toInt
          val noiseLum = (((nz & 0xFF) + f * 7) % 256).toInt
          var by = 0
          while (by < grid) {
            var bx = 0
            while (bx < grid) {
              val b = by * grid + bx
              val lum =
                if (b == noisePos) noiseLum
                else (((mix64(cluster * nb + b) & 0xFF) + f * 29) % 256).toInt
              val rgb = (lum << 16) | (lum << 8) | lum
              var y = by * 8
              while (y < by * 8 + 8) {
                var x = bx * 8
                while (x < bx * 8 + 8) { img.setRGB(x, y, rgb); x += 1 }
                y += 1
              }
              bx += 1
            }
            by += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", baos)
          baos.toByteArray
        }
        Row(id, "video", buildAvi(frameBytes, size, size, fps, dib = false),
          size, size, Integer.valueOf(frames * 1000 / fps))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Frame sampling for video payloads: emit `frames` evenly-spaced
    * (frame_idx, frame_ts_ms, frame_feature) rows per video. RIFF/AVI
    * payloads take the REAL path — frame bytes located by the
    * [[parseAvi]] container walk, per-frame `dim`-bucket luminance via
    * the JDK frame decode, and frame_ts_ms from real container timing
    * (original frame index × `avih` frame period). Other payloads keep
    * the deterministic byte-slice stub (ts an even spread of
    * `duration_ms`) so the row-explosion plumbing is total over opaque
    * bytes.
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
          parseAvi(payload) match {
            case Some(info) =>
              val n = info.nFrames
              (0 until frames).iterator.map { f =>
                val fi =
                  if (frames == 1) 0
                  else math.min(n - 1, ((n - 1).toLong * f / (frames - 1)).toInt)
                val (off, sz, isDib) = info.frames(fi)
                val feat = frameLumBuckets(payload, off, sz, isDib, info.width,
                  info.height, info.bitCount, dim, 1L << 26)
                  .getOrElse(new Array[Float](dim))
                Row(id, f, (fi.toLong * info.microSecPerFrame / 1000L).toInt,
                  feat.toSeq)
              }
            case None =>
              (0 until frames).iterator.map { f =>
                val tsMs = if (frames == 1) 0 else dur * f / (frames - 1)
                // STUB frame decode: slice the payload deterministically
                val lo = if (payload.isEmpty) 0 else (payload.length.toLong * f / frames).toInt
                val hi = if (payload.isEmpty) 0 else (payload.length.toLong * (f + 1) / frames).toInt
                Row(id, f, tsMs, stubDecode(payload.slice(lo, hi), dim).toSeq)
              }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Fallback "resample" for payloads ImageIO can't read: scales the
    * byte budget by the pixel ratio deterministically via byte
    * stride-sampling, keeping [[resize]] total over opaque bytes.
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

  /** REAL resample for decodable payloads: ImageIO decode → bilinear
    * Graphics2D scale → PNG re-encode. PNG, not JPEG, on the way out:
    * lossless and encoder-deterministic, so resized fixtures stay
    * byte-stable and re-decodable to exact geometry. Returns None when
    * the bytes aren't a decodable image or exceed the `maxPixels`
    * bomb guard, at which point [[resize]] falls back to
    * [[stubResize]].
    */
  private[ops] def realResize(payload: Array[Byte], dstW: Int, dstH: Int,
                              maxPixels: Long = 1L << 26): Option[Array[Byte]] = {
    if (payload == null || payload.length < 8 || dstW <= 0 || dstH <= 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0 ||
          img.getWidth.toLong * img.getHeight > maxPixels) return None
      val out = new java.awt.image.BufferedImage(dstW, dstH,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, dstW, dstH, null)
      } finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      Some(baos.toByteArray)
    } catch { case _: Exception => None }
  }

  /** Image resize: payload → re-encoded payload at (targetW, targetH),
    * metadata updated in the same pass. Decodable images take the REAL
    * decode → bilinear scale → PNG re-encode path ([[realResize]]);
    * opaque bytes keep the deterministic stub so the operator is total.
    * Same mapPartitions shape either way — payloads transform in place
    * and never shuffle.
    */
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
          val resized = realResize(payload, targetW, targetH)
            .getOrElse(stubResize(payload, w, h, targetW, targetH))
          Row(r.getLong(0), r.getString(1), resized, targetW, targetH,
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
  /** Perceptual near-duplicate pairs over VIDEO payloads — keyframe
    * alignment, the standard video near-dup shape: sample `keyframes`
    * evenly-spaced frames per clip ([[sampleFrames]] — REAL decode for
    * AVI payloads), sign-project each frame's SPATIAL luminance
    * feature to a 64-bit signature, and pair clips whose ALIGNED
    * keyframes (same sample ordinal) fall within `maxHamming` bits,
    * banded exactly like [[nearDupMedia]]. Emits (id_a, id_b,
    * frames_matched, max_hamming) for pairs matching at least
    * `minMatchFrames` keyframes.
    *
    * Why keyframes rather than the temporal envelope: a time-mean
    * envelope collapses spatial structure, so clips with similar
    * global brightness PROFILES but different content collide
    * (measured on the 500-clip fixture corpus: 71k of 125k possible
    * pairs within hamming 3 of an envelope signature, vs ~3.7k genuine
    * same-pattern pairs). Spatial per-frame signatures keep the image
    * path's discrimination; joining on the sample ordinal keeps
    * candidate generation O(bucket) — no cross-frame explosion.
    *
    * Scale shape unchanged: payloads decode map-side and collapse to
    * `keyframes` longs per clip BEFORE any exchange; only (id,
    * frame_idx, band) rows shuffle (4·keyframes per clip).
    */
  def nearDupVideo(media: DataFrame, keyframes: Int = 4, dim: Int = 16,
                   maxHamming: Int = 3, minMatchFrames: Int = 2,
                   maxBucketSize: Long = Long.MaxValue,
                   portable: Boolean = false): DataFrame =
    bandedCandidates(videoSigs(media, keyframes, dim, portable),
        Seq("frame_idx"), maxBucketSize)
      .select(col("id_a"), col("id_b"), col("frame_idx"),
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("frames_matched"),
        max(col("hamming")).as("max_hamming"))
      .where(col("frames_matched") >= minMatchFrames)

  /** Acoustic fingerprints as a DataFrame: (media_id, afp) where `afp`
    * is [[decodeWavFingerprint]]'s 2·`windows` RMS+ZCR vector. Rows
    * whose payloads aren't decodable WAV are dropped (audio near-dup
    * is only defined over audio). Payloads never shuffle — the
    * mapPartitions projection collapses each clip to `2·windows`
    * floats before any exchange.
    */
  def audioFingerprint(media: DataFrame, windows: Int = 8,
                       batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
            decodeWavFingerprint(payload, windows)
              .map(fp => Row(r.getLong(0), fp.toSeq))
          }
        }
      }
    spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("afp",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))))
  }

  /** Perceptual near-duplicate pairs over AUDIO payloads — the audio
    * leg of the q101/q153 family, completing the image/video/audio
    * triad. Signature input is the RMS+ZCR fingerprint; each HALF is
    * centered on its own mean before sign-hashing (RMS and ZCR live on
    * different scales — a joint mean would hand every bit to whichever
    * half sits higher, which for constant-loudness corpora degenerates
    * to the envelope trap q153's first cut measured). Banding,
    * pigeonhole recall at `maxHamming` ≤ 3, and the payloads-never-
    * shuffle shape are identical to [[nearDupMedia]].
    */
  def nearDupAudio(media: DataFrame, windows: Int = 8,
                   maxHamming: Int = 3,
                   maxBucketSize: Long = Long.MaxValue,
                   portable: Boolean = false): DataFrame =
    bandedCandidates(audioSigs(media, windows, portable), Nil, maxBucketSize)
      .select(col("id_a"), col("id_b"),
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)

  /** Perceptual near-duplicate pairs over arbitrary media payloads
    * (the image pHash path; see family scaladoc above). */
  def nearDupMedia(media: DataFrame, dim: Int = 16,
                   maxHamming: Int = 3,
                   maxBucketSize: Long = Long.MaxValue,
                   portable: Boolean = false): DataFrame =
    bandedCandidates(mediaSigs(media, dim, portable), Nil, maxBucketSize)
      .select(col("id_a"), col("id_b"),
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)

  // ---- shared signature machinery for the near-dup triad ------------

  /** Image-path signatures: feature centered on its own mean before
    * sign-hashing — the pHash construction (bits = coefficient vs
    * median): raw byte histograms are near-constant vectors and
    * sign-LSH is scale-invariant, so WITHOUT centering every bland
    * payload hashes identically and candidate generation goes
    * quadratic.
    */
  private def mediaSigs(media: DataFrame, dim: Int,
                        portable: Boolean = false): DataFrame = {
    val mean = aggregate(col("feature"), lit(0.0d), (a, x) => a + x) /
      greatest(size(col("feature")), lit(1))
    extractFeatures(media, dim)
      .select(col("media_id"),
        transform(col("feature"), x => x - mean).as("__cf"))
      .select(col("media_id"), signBits(col("__cf"), dim, portable).as("__sig"))
      .transform(graft.core.Checkpoints.sessionCk) // decode once: both join sides reuse it
  }

  /** Signature family switch shared by the near-dup triad: the default
    * is the engine's 64-bit XXH64-plane sign hash; `portable = true`
    * selects the 63-bit md5-Rademacher family (`hp:k:i` parity — the
    * q41/q43/q71 plane family), whose sign decisions a DuckDB oracle
    * re-derives bit-for-bit from md5 alone. 63 bits (not 64) because
    * the portable signature packs into a signed long; [[sigBands]]'s
    * fourth band then carries 15 bits — the pigeonhole recall argument
    * (hamming ≤ 3 leaves ≥ 1 of 4 disjoint bands intact) is unchanged.
    */
  private def signBits(cf: org.apache.spark.sql.Column, dim: Int,
                       portable: Boolean): org.apache.spark.sql.Column =
    if (portable) graft.expressions.VectorExprs.portableLshSig(cf, 63, dim)
    else graft.expressions.VectorExprs.lshSignBits(cf, 64)

  /** Video-path signatures: one spatial signature per aligned keyframe. */
  private def videoSigs(media: DataFrame, keyframes: Int, dim: Int,
                        portable: Boolean = false): DataFrame = {
    val mean = aggregate(col("frame_feature"), lit(0.0d), (a, x) => a + x) /
      greatest(size(col("frame_feature")), lit(1))
    sampleFrames(media, keyframes, dim)
      .select(col("media_id"), col("frame_idx"),
        transform(col("frame_feature"), x => x - mean).as("__cf"))
      .select(col("media_id"), col("frame_idx"),
        signBits(col("__cf"), dim, portable).as("__sig"))
      .transform(graft.core.Checkpoints.sessionCk)
  }

  /** Audio-path signatures: RMS and ZCR halves centered independently. */
  private def audioSigs(media: DataFrame, windows: Int,
                        portable: Boolean = false): DataFrame = {
    val w = windows
    def centered(half: org.apache.spark.sql.Column) = {
      val m = aggregate(half, lit(0.0d), (a, x) => a + x) / lit(w)
      transform(half, x => x - m)
    }
    audioFingerprint(media, w)
      .select(col("media_id"),
        concat(centered(slice(col("afp"), 1, w)),
          centered(slice(col("afp"), w + 1, w))).as("__cf"))
      .select(col("media_id"),
        signBits(col("__cf"), 2 * w, portable).as("__sig"))
      .transform(graft.core.Checkpoints.sessionCk)
  }

  /** 16-bit band expansion of 64-bit signatures: 4 (band, value) keys
    * per signature, the pigeonhole construction behind the hamming ≤ 3
    * recall guarantee.
    */
  private def sigBands(sigs: DataFrame): DataFrame =
    sigs.withColumn("__b", explode(sequence(lit(0), lit(3))))
      .withColumn("__bv",
        expr("shiftrightunsigned(__sig, __b * 16)").bitwiseAND(lit(0xFFFFL)))

  /** Candidate pairs via band buckets, with the family's drop-and-
    * report bucket cap (the same contract as `Dedup.minhashNearDups`):
    * a degenerate bucket — thousands of byte-identical or blank
    * payloads landing on one (band, value) — would otherwise go
    * quadratic silently. Capped buckets drop WHOLE and are enumerable
    * via the paired `*DroppedBuckets` audit; pairs that also share a
    * non-degenerate band still surface (the LSH recall contract: any
    * one band hit suffices). Uncapped calls skip the counting pass
    * entirely.
    */
  private def bandedCandidates(sigs: DataFrame, extraKeys: Seq[String],
                               maxBucketSize: Long): DataFrame = {
    require(maxBucketSize >= 2,
      s"maxBucketSize must be >= 2, got $maxBucketSize")
    val bands0 = sigBands(sigs)
    val keys = extraKeys ++ Seq("__b", "__bv")
    val bands =
      if (maxBucketSize == Long.MaxValue) bands0
      else bands0.join(
        bands0.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__bn"))
          .where(col("__bn") <= maxBucketSize).drop("__bn"),
        keys)
    val extra = extraKeys.map(col)
    val left = bands.select(
      (Seq(col("media_id").as("id_a"), col("__sig").as("__sa"),
        col("__b"), col("__bv")) ++ extra): _*)
    val right = bands.select(
      (Seq(col("media_id").as("id_b"), col("__sig").as("__sb"),
        col("__b"), col("__bv")) ++ extra): _*)
    left.join(right, keys)
      .where(col("id_a") < col("id_b"))
      .select((Seq(col("id_a"), col("id_b"), col("__sa"), col("__sb")) ++
        extra): _*)
      .distinct() // a pair may collide in several bands
  }

  private def droppedBuckets(sigs: DataFrame, extraKeys: Seq[String],
                             maxBucketSize: Long): DataFrame = {
    // no default and no MaxValue: an unsatisfiable cap would make the
    // audit a silent no-op that reads as "nothing dropped"
    require(maxBucketSize >= 2 && maxBucketSize < Long.MaxValue,
      s"maxBucketSize must be a real cap in [2, Long.MaxValue), got $maxBucketSize")
    val keys = extraKeys ++ Seq("__b", "__bv")
    sigBands(sigs)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > maxBucketSize)
      .select((extraKeys.map(col) ++ Seq(col("__b").as("band"),
        col("__bv").as("bucket"), col("n_rows"))): _*)
  }

  /** Audit leg of [[nearDupMedia]]'s bucket cap: the (band, bucket)
    * keys whose buckets exceeded `maxBucketSize` and were dropped
    * whole, with row counts. Run with the same `dim` as the paired
    * call. A non-empty result at a generous cap means the corpus has
    * a degenerate payload mass (blank/identical media) worth scrubbing
    * before near-dup, not that the cap should be raised.
    */
  def mediaDroppedBuckets(media: DataFrame, dim: Int = 16,
                          maxBucketSize: Long,
                          portable: Boolean = false): DataFrame =
    droppedBuckets(mediaSigs(media, dim, portable), Nil, maxBucketSize)

  /** Audit leg of [[nearDupVideo]]'s bucket cap (buckets are per
    * aligned keyframe ordinal). */
  def videoDroppedBuckets(media: DataFrame, keyframes: Int = 4,
                          dim: Int = 16, maxBucketSize: Long): DataFrame =
    droppedBuckets(videoSigs(media, keyframes, dim), Seq("frame_idx"),
      maxBucketSize)

  /** Audit leg of [[nearDupAudio]]'s bucket cap. */
  def audioDroppedBuckets(media: DataFrame, windows: Int = 8,
                          maxBucketSize: Long): DataFrame =
    droppedBuckets(audioSigs(media, windows), Nil, maxBucketSize)
}
