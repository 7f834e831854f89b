package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-storage operators: quantization and related vector-column
  * transforms for the embedding side of a training-data pipeline
  * (ANN indexes and near-dup sweeps over 100 TB of vectors are memory-
  * bound — int8 storage is the standard 4× shrink before any index is
  * built; cf. IVF/PQ-family systems).
  */
object VectorOps {

  /** Symmetric per-vector int8 quantization: scale by 127/max|x| and
    * round half-away-from-zero, the faiss-style ScalarQuantizer shape.
    * Emits audit statistics rather than the quantized payload (the
    * payload write is a trivial cast once the stats validate):
    * n_dims, qsum / qmin / qmax (exact integer checksums of the
    * quantized vector), n_sat (elements at ±127 — saturation count).
    * Zero vectors (max|x| = 0) quantize to all-zero.
    *
    * Parity: floats widen to double exactly; x*127/maxabs is two
    * correctly-rounded IEEE ops, so every engine computes the identical
    * double, and [[Numeric.roundAway]] matches the C-family round().
    * Integer stats are exact — the whole output is hash-portable.
    *
    * Scale shape: map-side explode + per-vector agg; the only shuffle
    * carries (vec_id, small-int) rows. At 100 TB: embarrassingly
    * parallel, no skew (fixed dim per vector).
    */
  def quantizeInt8Stats(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val asD = col(vecCol).cast("array<double>")
    val maxabs = array_max(transform(asD, x => abs(x)))
    val elems = df
      .select(col(idCol), maxabs.as("__m"), posexplode(asD).as(Seq("__i", "__x")))
      .select(col(idCol),
        when(col("__m") > 0,
          Numeric.roundAway(col("__x") * 127.0 / col("__m"), 0))
          .otherwise(0.0).cast("long").as("__q"))
    elems.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dims"),
        sum(col("__q")).as("qsum"),
        min(col("__q")).as("qmin"),
        max(col("__q")).as("qmax"),
        sum(when(abs(col("__q")) === 127, 1L).otherwise(0L)).as("n_sat"))
  }

  /** Johnson–Lindenstrauss random projection with a DETERMINISTIC
    * md5-derived ±1 matrix — dimensionality reduction for the embedding
    * column without any stored projection matrix: sign(j,k) is a pure
    * function of (input dim j, output dim k), so every engine, every
    * rerun, and every external consumer projects identically (the same
    * rerun-stability argument as the md5 train/val split).
    *
    * Arithmetic is exact: inputs quantize to integers
    * (⌊x·10⁶⌋ — float→double widening and the one multiply/floor are
    * exact or correctly rounded IEEE steps identical everywhere), and
    * the projection is then a ±1-weighted integer sum — order-free, so
    * no float-summation divergence across engines or partitionings.
    *
    * Scale shape: posexplode to (id, dim, int) rows, ONE partial-
    * aggregated groupBy(id) with k conditional sums — the shuffle
    * carries k longs per vector; no dims×k row blowup, no matrix join.
    */
  def jlProject(df: DataFrame, vecCol: String, idCol: String,
                k: Int = 16): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val asD = col(vecCol).cast("array<double>")
    val q = df.select(col(idCol), posexplode(asD).as(Seq("__j", "__x")))
      .select(col(idCol), col("__j"),
        floor(col("__x") * 1000000.0).cast("long").as("__xq"))
    val sums = (0 until k).map { kk =>
      val bit = conv(substring(
        md5(concat(col("__j").cast("string"), lit(s"_$kk"))), 1, 8), 16, 10)
        .cast("long") % 2
      sum(when(bit === 0, col("__xq")).otherwise(-col("__xq"))).as(s"proj_$kk")
    }
    q.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
  }
}
