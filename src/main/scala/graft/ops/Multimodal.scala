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
}
