package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = {
    val rows = Seq(
      Row(1L, "image", "aaaa".getBytes("UTF-8"), 64, 64, null),
      Row(2L, "image", "aaaa".getBytes("UTF-8"), 64, 64, null), // same payload
      Row(3L, "video", ("x" * 100).getBytes("UTF-8"), 640, 480,
        Integer.valueOf(10000)),
      Row(4L, "audio", null, null, null, Integer.valueOf(5000)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 2), Multimodal.mediaSchema)
  }

  test("extractFeatures: deterministic stub decode, null-payload safe") {
    val f = Multimodal.extractFeatures(media, dim = 4, batchSize = 2)
    assert(f.count() == 4)
    val m = f.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getSeq[Float](r.fieldIndex("feature")))).toMap
    assert(m(1L) == m(2L))          // identical payload ⇒ identical feature
    assert(m(1L)._1 == 4)           // n_bytes
    assert(m(4L)._1 == 0)           // null payload → zero feature, no crash
    assert(m(4L)._2.forall(_ == 0f))
    // non-image bytes take the stub path: no decoded geometry
    assert(f.where($"media_id" === 1).head().isNullAt(2))
  }

  test("extractFeatures decodes a real 2x2 PNG to exact geometry and luminance") {
    // checkerboard: black, white / white, black — Rec.601 luma of pure
    // black is 0.0 and pure white exactly 1.0, so with dim = 4 (one
    // pixel per bucket) the feature is exact, not approximate
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xFFFFFF)
    img.setRGB(0, 1, 0xFFFFFF); img.setRGB(1, 1, 0x000000)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val rows = Seq(Row(9L, "image", baos.toByteArray, null, null, null))
    val m = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), Multimodal.mediaSchema)
    val r = Multimodal.extractFeatures(m, dim = 4).head()
    assert(r.getInt(r.fieldIndex("width")) == 2)
    assert(r.getInt(r.fieldIndex("height")) == 2)
    assert(r.getSeq[Float](r.fieldIndex("feature")) == Seq(0f, 1f, 1f, 0f))
  }

  test("extractFeatures decodes a real WAV to exact rate/channels/duration/RMS/peak") {
    // ±8192 square wave: 8192/32768 = 0.25 exactly in binary floating
    // point, so every RMS window and the peak decode to exactly 0.25
    val samples = 400
    val pcm = new Array[Byte](samples * 2)
    for (f <- 0 until samples) {
      val amp: Short = if ((f / 5) % 2 == 0) 8192 else -8192
      pcm(2 * f) = (amp & 0xFF).toByte
      pcm(2 * f + 1) = ((amp >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val rows = Seq(Row(7L, "audio", baos.toByteArray, null, null, null))
    val m = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), Multimodal.mediaSchema)
    val r = Multimodal.extractFeatures(m, dim = 4).head()
    assert(r.getInt(r.fieldIndex("sample_rate")) == 8000)
    assert(r.getInt(r.fieldIndex("channels")) == 1)
    assert(r.getInt(r.fieldIndex("duration_ms")) == 50) // 400 / 8000 s
    assert(r.isNullAt(r.fieldIndex("width"))) // no geometry on the audio path
    assert(r.getSeq[Float](r.fieldIndex("feature")) == Seq(0.25f, 0.25f, 0.25f, 0.25f))
    assert(r.getFloat(r.fieldIndex("peak")) == 0.25f)
  }

  test("decodeWav averages stereo channels to mono before windowing") {
    // L = +0.25, R = −0.25 every frame → mono average 0 → RMS 0, peak 0
    val samples = 100
    val pcm = new Array[Byte](samples * 4)
    for (f <- 0 until samples) {
      val l: Short = 8192; val rch: Short = -8192
      pcm(4 * f) = (l & 0xFF).toByte;       pcm(4 * f + 1) = ((l >> 8) & 0xFF).toByte
      pcm(4 * f + 2) = (rch & 0xFF).toByte; pcm(4 * f + 3) = ((rch >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val got = Multimodal.decodeWav(baos.toByteArray, dim = 2)
    assert(got.isDefined)
    val (rate, ch, ms, rms, peak) = got.get
    assert(rate == 8000 && ch == 2 && ms == 12) // 100/8000 s = 12.5 ms, floor
    assert(rms.toSeq == Seq(0f, 0f) && peak == 0f)
  }

  test("decodeWav reads the committed fixture (independent encoder) exactly") {
    // tone_sq5_8k.wav was written by a hand-rolled RIFF encoder (not
    // javax.sound), so this guards decoder/container compatibility, not
    // just round-tripping our own writer: same ±8192 square wave shape
    val path = getClass.getResource("/tone_sq5_8k.wav")
    assert(path != null, "committed WAV fixture missing")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path.toURI))
    val got = Multimodal.decodeWav(bytes, dim = 4)
    assert(got.isDefined, "fixture did not decode")
    val (rate, ch, ms, rms, peak) = got.get
    assert(rate == 8000 && ch == 1 && ms == 50)
    assert(rms.toSeq == Seq(0.25f, 0.25f, 0.25f, 0.25f) && peak == 0.25f)
  }

  test("syntheticWav emits decodable WAVs with cluster-keyed near-dup structure") {
    val ids = Seq(0L, 32L, 1L).toDF("doc_id")
    val media = Multimodal.syntheticWav(ids, "doc_id")
    assert(media.count() == 3)
    val p0 = media.where($"media_id" === 0L).head().getAs[Array[Byte]]("payload")
    assert(p0(0) == 'R'.toByte && p0(8) == 'W'.toByte) // RIFF/WAVE magic
    val d0 = Multimodal.decodeWav(p0, dim = 4).get
    assert(d0._1 == 8000 && d0._2 == 1 && d0._3 == 50)
    // cluster 0's loudest segment: amp 10240/32768 = 0.3125 exactly
    // (spike ≤ 8191 stays below it)
    assert(d0._5 == 0.3125f)
    // ids 0 and 1 share the cluster (id >>> 5): same clip except each
    // one's spike sample
    val p1 = media.where($"media_id" === 1L).head().getAs[Array[Byte]]("payload")
    val diffs = p0.zip(p1).count { case (a, b) => a != b }
    assert(diffs <= 4, s"same-cluster clips differ in $diffs bytes, want <= 4")
    // a different cluster yields a genuinely different clip
    val p32 = media.where($"media_id" === 32L).head().getAs[Array[Byte]]("payload")
    assert(p0.zip(p32).count { case (a, b) => a != b } > 100)
  }

  test("syntheticPng emits decodable PNGs whose luminance matches the pattern") {
    val ids = Seq(0L, 1L, 32L).toDF("doc_id")
    val media = Multimodal.syntheticPng(ids, "doc_id", size = 8)
    assert(media.count() == 3)
    val payload = media.where($"media_id" === 0L).head()
      .getAs[Array[Byte]]("payload")
    // PNG magic
    assert((payload(0) & 0xFF) == 0x89 && payload(1) == 'P'.toByte)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(img.getWidth == 8 && img.getHeight == 8)
    // id 0: cluster 0, noise pixel at index 44 — pixel (1,0) (index 1)
    // is the untouched cluster pattern: lum = mix64(1) & 0xFF = 193
    assert((img.getRGB(1, 0) & 0xFF) == 193)
    // ids 0 and 1 share cluster 0: identical except each one's noise pixel
    val p1 = media.where($"media_id" === 1L).head().getAs[Array[Byte]]("payload")
    val img1 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p1))
    val diffs = (for { y <- 0 until 8; x <- 0 until 8
      if img.getRGB(x, y) != img1.getRGB(x, y) } yield (x, y)).size
    assert(diffs <= 2, s"same-cluster images differ in $diffs pixels, want <= 2")
    // id 32 opens cluster 1: a hash-fresh pattern sharing nothing
    val p32 = media.where($"media_id" === 32L).head().getAs[Array[Byte]]("payload")
    val img32 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p32))
    val crossDiffs = (for { y <- 0 until 8; x <- 0 until 8
      if img.getRGB(x, y) != img32.getRGB(x, y) } yield (x, y)).size
    assert(crossDiffs > 32, s"cross-cluster images differ in only $crossDiffs pixels")
  }

  // independent hand-rolled AVI encoder (java.nio, sharing nothing with
  // Multimodal.buildAvi) — guards parser/container compatibility, not
  // just round-tripping our own writer; same role as tone_sq5_8k.wav
  private def specAvi(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def ch(id: String, data: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + data.length + (data.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array()
    }
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0).array()
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes("US-ASCII")).put("DIB ".getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0).putInt(1).putInt(fps).putInt(0)
      .putInt(frames.length).putInt(0).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort).array()
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).array()
    def lst(typ: String, parts: Array[Byte]*): Array[Byte] =
      ch("LIST", typ.getBytes("US-ASCII") ++ parts.flatten)
    val hdrl = lst("hdrl", ch("avih", avih),
      lst("strl", ch("strh", strh), ch("strf", strf)))
    val movi = lst("movi", frames.map(fb => ch("00db", fb)): _*)
    ch("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  // constant-gray 24-bit DIB frame: stride 12 at w=4 (already 4-aligned)
  private def grayDib(w: Int, h: Int, lum: Int): Array[Byte] =
    Array.fill(((w * 3 + 3) / 4) * 4 * h)(lum.toByte)

  // Rec.601 luma of a pure gray pixel, via the decoder's own formula
  private def grayLum(l: Int): Float =
    ((0.299 * l + 0.587 * l + 0.114 * l) / 255.0).toFloat

  test("decodeAvi reads an independently-encoded DIB AVI exactly") {
    val white = grayLum(255)
    val avi = specAvi(Seq(grayDib(4, 4, 0), grayDib(4, 4, 255),
      grayDib(4, 4, 255), grayDib(4, 4, 0)), 4, 4, fps = 5)
    val got = Multimodal.decodeAvi(avi, dim = 4)
    assert(got.isDefined, "independently-encoded AVI did not decode")
    val (w, h, fps, ms, env, peak) = got.get
    assert(w == 4 && h == 4 && fps == 5 && ms == 800)
    // one frame per window, each frame a constant gray — exact values
    assert(env.toSeq == Seq(0f, white, white, 0f))
    assert(peak == white)
  }

  test("decodeAvi survives truncated and non-AVI payloads") {
    val avi = specAvi(Seq(grayDib(4, 4, 128)), 4, 4, fps = 10)
    assert(Multimodal.decodeAvi(avi.take(40), dim = 2).isEmpty)  // truncated header
    assert(Multimodal.decodeAvi(avi.dropRight(20), dim = 2).isEmpty) // truncated movi
    assert(Multimodal.decodeAvi("notavideo".getBytes("UTF-8"), dim = 2).isEmpty)
    assert(Multimodal.decodeAvi(null, dim = 2).isEmpty)
  }

  test("syntheticAvi emits decodable MJPEG AVIs with id-keyed near-dup structure") {
    val ids = Seq(0L, 32L, 1L).toDF("doc_id")
    val media = Multimodal.syntheticAvi(ids, "doc_id", frames = 6, size = 16, fps = 10)
    assert(media.count() == 3)
    val p0 = media.where($"media_id" === 0L).head().getAs[Array[Byte]]("payload")
    assert(p0(0) == 'R'.toByte && p0(8) == 'A'.toByte) // RIFF/AVI magic
    val d0 = Multimodal.decodeAvi(p0, dim = 4).get
    assert(d0._1 == 16 && d0._2 == 16 && d0._3 == 10 && d0._4 == 600)
    // MJPEG loss is small: the envelope tracks the lossless DIB twin
    val dib0 = Multimodal.syntheticAvi(ids, "doc_id", frames = 6, size = 16,
      fps = 10, dib = true).where($"media_id" === 0L).head()
      .getAs[Array[Byte]]("payload")
    val dDib = Multimodal.decodeAvi(dib0, dim = 4).get
    val jpegErr = d0._5.zip(dDib._5).map { case (a, b) => math.abs(a - b) }.max
    assert(jpegErr < 0.02, s"JPEG-vs-DIB envelope error $jpegErr")
    // ids 0 and 1 share the cluster key: near-identical clips
    val p1 = media.where($"media_id" === 1L).head().getAs[Array[Byte]]("payload")
    val d1 = Multimodal.decodeAvi(p1, dim = 4).get
    val baseErr = d0._5.zip(d1._5).map { case (a, b) => math.abs(a - b) }.max
    assert(baseErr < 0.02, s"same-cluster envelope error $baseErr")
  }

  test("extractFeatures routes AVI payloads to the real video decode") {
    val media = Multimodal.syntheticAvi(Seq(5L).toDF("doc_id"), "doc_id",
      frames = 6, size = 16, fps = 10)
    val r = Multimodal.extractFeatures(media, dim = 4).head()
    assert(r.getInt(r.fieldIndex("width")) == 16)
    assert(r.getInt(r.fieldIndex("height")) == 16)
    assert(r.getInt(r.fieldIndex("sample_rate")) == 10) // fps in the rate slot
    assert(r.isNullAt(r.fieldIndex("channels")))        // video ≠ audio
    assert(r.getInt(r.fieldIndex("duration_ms")) == 600)
    val peak = r.getFloat(r.fieldIndex("peak"))
    assert(peak > 0f && peak <= 1f)
  }

  test("sampleFrames decodes real AVI frames with container timing") {
    val avi = specAvi(Seq(grayDib(4, 4, 0), grayDib(4, 4, 128),
      grayDib(4, 4, 255)), 4, 4, fps = 10)
    val rows = Seq(Row(11L, "video", avi, 4, 4, Integer.valueOf(99999)))
    val m = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), Multimodal.mediaSchema)
    val fr = Multimodal.sampleFrames(m, frames = 3, dim = 2).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getSeq[Float](3))).sortBy(_._1)
    // container timing (100 ms/frame), NOT the bogus duration_ms column
    assert(fr.map(t => (t._1, t._2)).toSeq == Seq((0, 0), (1, 100), (2, 200)))
    assert(fr(0)._3 == Seq(0f, 0f))
    assert(fr(1)._3 == Seq(grayLum(128), grayLum(128)))
    assert(fr(2)._3 == Seq(grayLum(255), grayLum(255)))
  }

  test("nearDupVideo pairs aligned near-identical clips, not different content") {
    // 4x4 DIB frames with controlled spatial patterns (1 px per bucket
    // at dim 16): A = left-half bright, B = A with one pixel nudged,
    // C = top-half bright — A/C centered features are orthogonal, so
    // their signatures differ in ~half the bits
    def dib(f: (Int, Int) => Int): Array[Byte] = {
      val stride = 12
      val out = new Array[Byte](stride * 4)
      for (y <- 0 until 4; x <- 0 until 4) {
        val off = (3 - y) * stride + 3 * x // bottom-up
        val l = f(x, y).toByte
        out(off) = l; out(off + 1) = l; out(off + 2) = l
      }
      out
    }
    val a = dib((x, _) => if (x < 2) 255 else 0)
    val b = dib((x, y) => if (x == 0 && y == 0) 250 else if (x < 2) 255 else 0)
    val c = dib((_, y) => if (y < 2) 255 else 0)
    val rows = Seq(
      Row(1L, "video", specAvi(Seq(a, a, a), 4, 4, 10), 4, 4, Integer.valueOf(300)),
      Row(2L, "video", specAvi(Seq(b, b, b), 4, 4, 10), 4, 4, Integer.valueOf(300)),
      Row(3L, "video", specAvi(Seq(c, c, c), 4, 4, 10), 4, 4, Integer.valueOf(300)))
    val m = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 2), Multimodal.mediaSchema)
    val out = Multimodal.nearDupVideo(m, keyframes = 3, dim = 16,
      maxHamming = 3, minMatchFrames = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.exists { case (ia, ib, fm) => ia == 1L && ib == 2L && fm == 3L },
      s"near-identical clips did not pair: ${out.toSeq}")
    assert(!out.exists { case (ia, ib, _) => ia == 3L || ib == 3L },
      s"orthogonal-content clip paired: ${out.toSeq}")
  }

  test("DC-exact JPEG: every flat 8x8 block value 0..255 round-trips exactly") {
    // the q153 oracle's load-bearing claim (syntheticAviDc scaladoc): a
    // flat block has only a DC coefficient, the JDK's quality-0.75
    // luminance quant table has Q(0,0)=8, so encode→decode is the
    // integer identity. Pin it for ALL 256 values through the exact
    // ImageIO call the generator makes — one 128x128 image of 256 blocks.
    val img = new java.awt.image.BufferedImage(128, 128,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (by <- 0 until 16; bx <- 0 until 16) {
      val v = by * 16 + bx
      val rgb = (v << 16) | (v << 8) | v
      for (y <- by * 8 until by * 8 + 8; x <- bx * 8 until bx * 8 + 8)
        img.setRGB(x, y, rgb)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(baos.toByteArray))
    for (y <- 0 until 128; x <- 0 until 128) {
      val v = (y / 8) * 16 + (x / 8)
      val d = dec.getRGB(x, y)
      assert(((d >> 16) & 0xFF) == v && ((d >> 8) & 0xFF) == v && (d & 0xFF) == v,
        s"block value $v decoded to ${d & 0xFFFFFF} at ($x,$y)")
    }
  }

  test("syntheticAviDc keyframe features equal the generator values exactly") {
    // end-to-end DC-exactness: generator → MJPEG AVI → container walk →
    // REAL JPEG decode → bucket means must equal the mix64 block values
    // computed independently here (the same arithmetic the q153 DuckDB
    // oracle replays)
    def mix64(z0: Long): Long = { // splitmix64, reimplemented independently
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val ids = Seq(0L, 1L, 32L)
    val media = Multimodal.syntheticAviDc(ids.toDF("doc_id"), "doc_id",
      frames = 4, size = 64, fps = 10)
    val fr = Multimodal.sampleFrames(media, frames = 3, dim = 16).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getSeq[Float](3))).toMap
    for (id <- ids; s <- 0 until 3) {
      val o = 3 * s / 2 // sample ordinal -> container frame (0, 1, 3)
      val cluster = id >>> 5
      val nz = mix64(~id)
      val noisePos = (((nz >>> 8) + o) % 64).toInt
      val noiseLum = (((nz & 0xFF) + o * 7) % 256).toInt
      def blockVal(b: Int): Int =
        if (b == noisePos) noiseLum
        else (((mix64(cluster * 64L + b) & 0xFF) + o * 29) % 256).toInt
      val expected = Array.tabulate(16) { i =>
        var sum = 0.0
        var p = i * 256
        while (p < (i + 1) * 256) {
          val v = blockVal(((p / 64) / 8) * 8 + ((p % 64) / 8))
          sum += (0.299 * v + 0.587 * v + 0.114 * v) / 255.0
          p += 1
        }
        (sum / 256).toFloat
      }
      assert(fr((id, s)) == expected.toSeq,
        s"id=$id sample=$s: decoded feature != generator replay")
    }
    // near-dup structure survives: same-cluster ids pair, cross-cluster don't
    val pairs = Multimodal.nearDupVideo(media, keyframes = 3, dim = 16,
      maxHamming = 3, minMatchFrames = 2, portable = true).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)), s"same-cluster clips did not pair: ${pairs.toSeq}")
    assert(!pairs.exists { case (a, b) => a == 32L || b == 32L },
      s"cross-cluster clip paired: ${pairs.toSeq}")
  }

  test("sampleFrames: N evenly-spaced frames per video only") {
    val fr = Multimodal.sampleFrames(media, frames = 5, dim = 4)
    assert(fr.count() == 5) // only media 3 is video
    val idx = fr.select($"frame_idx", $"frame_ts_ms").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1)
    assert(idx.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
    assert(idx.last._2 == 10000) // last frame at duration end
  }

  test("resize: images only, metadata updated, byte budget scales with pixels") {
    val out = Multimodal.resize(media, 32, 32)
    assert(out.count() == 2) // only the two images
    val r = out.where($"media_id" === 1).head()
    assert(r.getAs[Int]("width") == 32 && r.getAs[Int]("height") == 32)
    // 64×64 → 32×32 = ¼ the pixels → ¼ the stub byte budget
    assert(r.getAs[Array[Byte]]("payload").length == 1) // 4 bytes / 4
    // deterministic: same input ⇒ same output
    val again = Multimodal.resize(media, 32, 32)
      .where($"media_id" === 1).head().getAs[Array[Byte]]("payload")
    assert(again.toSeq == r.getAs[Array[Byte]]("payload").toSeq)
  }

  test("resize really resamples decodable images (decode → scale → PNG)") {
    // constant-color image: bilinear of a constant is the same constant,
    // so every output pixel is exact at any target size
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x336699)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val rows = Seq(Row(21L, "image", baos.toByteArray, 8, 8, null))
    val m = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), Multimodal.mediaSchema)
    val out = Multimodal.resize(m, 4, 4).head().getAs[Array[Byte]]("payload")
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(dec != null, "resized payload is not a decodable image")
    assert(dec.getWidth == 4 && dec.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((dec.getRGB(x, y) & 0xFFFFFF) == 0x336699)
  }

  test("metadata projection prunes the payload column from the scan") {
    val md = Multimodal.metadata(media)
    assert(md.columns.toSeq ==
      Seq("media_id", "media_type", "width", "height", "duration_ms", "n_bytes"))
    assert(md.where($"media_id" === 3).head().getAs[Int]("n_bytes") == 100)
  }

  test("nearDupMedia pairs identical payloads, skips distinct ones") {
    // doc 3's feature must DIFFER IN DIRECTION, not just magnitude:
    // sign-LSH is scale-invariant (cosine semantics), so any two
    // near-constant byte histograms hash identically by design — a
    // half-high/half-low position pattern points elsewhere
    val rows = Seq(
      Row(1L, "image", "aaaa".getBytes("UTF-8"), 64, 64, null),
      Row(2L, "image", "aaaa".getBytes("UTF-8"), 64, 64, null), // exact dup
      Row(3L, "image", Array.tabulate(100)(i =>
        if (i % 4 < 2) 0xFF.toByte else 0x00.toByte), 64, 64, null),
      Row(4L, "image", null, null, null, null))
    val m = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 2), Multimodal.mediaSchema)
    val out = Multimodal.nearDupMedia(m, dim = 4, maxHamming = 3)
      .select($"id_a", $"id_b", $"hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // identical payloads ⇒ identical signature ⇒ hamming 0; the null
    // payload shares the zero-feature signature with nothing dissimilar
    assert(out.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
    assert(!out.exists { case (a, b, _) => Set(a, b).contains(3L) })
  }

  test("nearDupMedia emits each pair once despite multi-band collisions") {
    // identical payloads collide in ALL four bands — distinct() must
    // still yield exactly one (1,2) row
    val rows = Seq(
      Row(1L, "image", "samebytes".getBytes("UTF-8"), 8, 8, null),
      Row(2L, "image", "samebytes".getBytes("UTF-8"), 8, 8, null))
    val m = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), Multimodal.mediaSchema)
    val out = Multimodal.nearDupMedia(m, dim = 4, maxHamming = 3).collect()
    assert(out.length == 1)
  }

  test("embeddingNearDups finds only above-threshold pairs (dedup path)") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.999f, 0.04f)), // near-dup pair
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.embeddingNearDups(vecs, "vec_id", "embedding",
      bits = 2, threshold = 0.99)
    val pairs = out.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
  test("decodeWavFingerprint: RMS tracks amplitude, ZCR tracks frequency") {
    // two square waves, SAME amplitude, different half-periods: RMS
    // halves must agree, ZCR halves must differ by the period ratio
    def sq(half: Int): Array[Byte] = {
      val samples = 800
      val pcm = new Array[Byte](samples * 2)
      (0 until samples).foreach { f =>
        val amp: Short = if ((f / half) % 2 == 0) 8192 else -8192
        pcm(2 * f) = (amp & 0xFF).toByte
        pcm(2 * f + 1) = ((amp >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val w = 4
    val Some(a) = Multimodal.decodeWavFingerprint(sq(2), w)
    val Some(b) = Multimodal.decodeWavFingerprint(sq(8), w)
    val (aRms, aZcr) = (a.take(w), a.drop(w))
    val (bRms, bZcr) = (b.take(w), b.drop(w))
    // constant |amp| = 8192/32768 = 0.25 everywhere
    (aRms ++ bRms).foreach(r => assert(math.abs(r - 0.25f) < 1e-3))
    // a crossing every `half` frames: rate ~ 1/2 vs ~ 1/8
    aZcr.foreach(z => assert(math.abs(z - 0.5f) < 0.05f))
    bZcr.foreach(z => assert(math.abs(z - 0.125f) < 0.05f))
  }

  test("nearDupAudio: same-cluster clips pair, cross-cluster don't") {
    // clusters by id >>> 5 (syntheticWav ZCR-envelope key): 0,5,7 share
    // cluster 0; 32,37 share cluster 1; 64 and 96 open singleton
    // clusters and must stay unpaired
    val ids = Seq(0L, 5L, 7L, 32L, 37L, 64L, 96L).toDF("id")
    val media = Multimodal.syntheticWav(ids, "id")
    val pairs = Multimodal.nearDupAudio(media, windows = 8, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 5L)) && pairs.contains((0L, 7L)) &&
      pairs.contains((5L, 7L)))
    assert(pairs.contains((32L, 37L)))
    // no cross-cluster pair: every reported pair must share id >>> 5
    assert(pairs.forall { case (x, y) => (x >> 5) == (y >> 5) })
  }
  test("media bucket cap: degenerate payload mass drops whole with audit") {
    import spark.implicits._
    // 12 byte-identical payloads: every (band, value) bucket holds all
    // 12 signatures -> 66 pairs uncapped; a cap of 8 drops them all and
    // the audit reports the buckets
    val blank = (1L to 12L).map(i => (i, "image", "same-bytes".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "payload")
    assert(Multimodal.nearDupMedia(blank, dim = 4).count() == 66)
    assert(Multimodal.nearDupMedia(blank, dim = 4, maxBucketSize = 8L).count() == 0)
    val audit = Multimodal.mediaDroppedBuckets(blank, dim = 4, maxBucketSize = 8L)
    assert(audit.count() == 4) // all four bands degenerate
    assert(audit.select("n_rows").collect().forall(_.getLong(0) == 12L))
    // a generous cap is a no-op: capped == uncapped on a healthy corpus
    val healthy = Multimodal.syntheticPng((0L until 40L).toDF("id"), "id")
    assert(rows(Multimodal.nearDupMedia(healthy, dim = 16, maxBucketSize = 1000L)) ==
      rows(Multimodal.nearDupMedia(healthy, dim = 16)))
    // audio/video audits share the machinery and the real-cap contract
    intercept[IllegalArgumentException] {
      Multimodal.audioDroppedBuckets(blank, windows = 4,
        maxBucketSize = Long.MaxValue)
    }
  }
}
