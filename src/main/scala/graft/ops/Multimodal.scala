package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed per partition in bounded
  * batches — the Spark-side plumbing (schema, partitioning, batch
  * shape) is real; the codec itself is a clearly-marked deterministic
  * STUB because no image/audio libraries exist in this container. A
  * production deployment swaps `stubDecode` for a real codec (e.g. a
  * JNI JPEG decoder) without touching any of the distribution logic.
  *
  * Scale: payloads never shuffle — every operator is a mapPartitions
  * projection; only the (small) extracted features move. Batch size
  * bounds peak memory per task regardless of payload sizes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", IntegerType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decode — deterministic bytes→feature map standing in for a
    * real codec. Produces a `dim`-length feature from byte statistics;
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
            Row(r.getLong(0),
              if (payload == null) 0 else payload.length,
              stubDecode(payload, dim).toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
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
