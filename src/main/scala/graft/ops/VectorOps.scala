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

  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]],
                            eigenvalues: Array[Double], n: Long)

  /** Distributed PCA over the embedding column — the data-dependent
    * counterpart of [[jlProject]] (JL preserves distances obliviously;
    * PCA finds the directions this corpus actually varies in, the
    * standard pre-step for visualization, whitening, and IVF/PQ-style
    * index training).
    *
    * Scale shape: the d×d second-moment matrix is accumulated
    * PER-PARTITION in one pass (`mapPartitions` over primitive arrays —
    * the one genuinely imperative kernel where a row-wise relational
    * formulation would explode d² rows per vector into the shuffle), so
    * the job moves exactly one d² double array per partition and the
    * driver reduces partials. Eigenvectors come from power iteration
    * with deflation on the 64×64 driver-side matrix — O(k·iters·d²)
    * scalar work, irrelevant next to the scan. Deterministic: fixed
    * init (dominant-diagonal basis vector), fixed iteration count, and
    * a sign convention (largest-|component| coordinate positive).
    *
    * NULL and wrong-dimension vectors are skipped (counted out of `n`).
    */
  def pcaFit(df: DataFrame, vecCol: String, k: Int = 4,
             iters: Int = 100, portable: Boolean = false,
             quantScale: Double = 1e4): PcaModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(vecCol).cast("array<double>"))
      .where(col(vecCol).isNotNull)
      .as[Seq[Double]]
    val dims = vecs.head().length
    // `portable` swaps the float second-moment accumulation for
    // FixedPoint long arithmetic: elements quantize to q = roundAway
    // (x·quantScale) and the (Σq_i, Σq_i·q_j) sums are exact integers —
    // order-free, so the moments (and hence components) are bit-stable
    // across partitionings AND re-derivable by the DuckDB oracle. The
    // semantic is PCA of the 1e-4-quantized corpus (perturbation
    // O(quantScale⁻¹·σ), far under the 6-dp output rounding's
    // discrimination for well-separated eigenvalues). Saturation is
    // checked, not assumed: addExact/multiplyExact throw on the
    // ~9·10¹⁰-row bound (n·(max|x|·1e4)² < 2⁶³ at max|x| = 1) instead
    // of wrapping silently.
    val (n, mean, c) =
      if (portable) {
        val partials = vecs.rdd.mapPartitions { it =>
          var n0 = 0L
          val s = new Array[Long](dims)
          val m = new Array[Long](dims * dims)
          val q = new Array[Long](dims)
          it.foreach { v =>
            if (v.length == dims) {
              n0 += 1
              var i = 0
              while (i < dims) { q(i) = FixedPoint.quantizeD(v(i), quantScale); i += 1 }
              i = 0
              while (i < dims) {
                val qi = q(i)
                s(i) = Math.addExact(s(i), qi)
                var j = 0
                while (j < dims) {
                  m(i * dims + j) = Math.addExact(m(i * dims + j), Math.multiplyExact(qi, q(j)))
                  j += 1
                }
                i += 1
              }
            }
          }
          if (n0 == 0) Iterator.empty else Iterator((n0, s, m))
        }
        val (n1, s1, m1) = partials.reduce { case ((na, sa, ma), (nb, sb, mb)) =>
          var i = 0; while (i < sa.length) { sa(i) = Math.addExact(sa(i), sb(i)); i += 1 }
          i = 0; while (i < ma.length) { ma(i) = Math.addExact(ma(i), mb(i)); i += 1 }
          (na + nb, sa, ma)
        }
        val nD = n1.toDouble
        val mu = s1.map(x => (x.toDouble / quantScale) / nD)
        val cm = Array.tabulate(dims, dims)((i, j) =>
          (((m1(i * dims + j).toDouble / quantScale) / quantScale) / nD) - mu(i) * mu(j))
        (n1, mu, cm)
      } else {
        val partials = vecs.rdd.mapPartitions { it =>
          var n0 = 0L
          val s = new Array[Double](dims)
          val m = new Array[Double](dims * dims)
          it.foreach { v =>
            if (v.length == dims) {
              val a = v.toArray
              n0 += 1
              var i = 0
              while (i < dims) {
                val ai = a(i)
                s(i) += ai
                var j = 0
                while (j < dims) { m(i * dims + j) += ai * a(j); j += 1 }
                i += 1
              }
            }
          }
          if (n0 == 0) Iterator.empty else Iterator((n0, s, m))
        }
        val (n1, s1, m1) = partials.reduce { case ((na, sa, ma), (nb, sb, mb)) =>
          var i = 0; while (i < sa.length) { sa(i) += sb(i); i += 1 }
          i = 0; while (i < ma.length) { ma(i) += mb(i); i += 1 }
          (na + nb, sa, ma)
        }
        val mu = s1.map(_ / n1)
        // covariance C = M/n − μμᵀ (symmetric PSD up to rounding)
        val cm = Array.tabulate(dims, dims)((i, j) =>
          m1(i * dims + j) / n1 - mu(i) * mu(j))
        (n1, mu, cm)
      }
    val comps = new Array[Array[Double]](k)
    val eigs = new Array[Double](k)
    for (kk <- 0 until k) {
      // deterministic init: basis vector at the largest remaining diagonal
      val d0 = (0 until dims).maxBy(i => c(i)(i))
      var v = Array.tabulate(dims)(i => if (i == d0) 1.0 else 0.0)
      var lambda = 0.0
      for (_ <- 0 until iters) {
        val w = Array.tabulate(dims)(i => (0 until dims).map(j => c(i)(j) * v(j)).sum)
        val norm = math.sqrt(w.map(x => x * x).sum)
        if (norm > 0) { v = w.map(_ / norm); lambda = norm }
      }
      // sign convention: the largest-|coordinate| entry is positive
      val imax = (0 until dims).maxBy(i => math.abs(v(i)))
      if (v(imax) < 0) v = v.map(-_)
      comps(kk) = v; eigs(kk) = lambda
      // deflate: C ← C − λ v vᵀ
      for (i <- 0 until dims; j <- 0 until dims) c(i)(j) -= lambda * v(i) * v(j)
    }
    PcaModel(mean, comps, eigs, n)
  }

  /** Project the corpus onto the fitted components: pc_k = (x−μ)·v_k,
    * computed map-side against plan-shipped component arrays (typedlit
    * → codegen reference table; no join, no shuffle — the μ·v_k term is
    * a per-component constant folded at plan time).
    */
  def pcaProject(df: DataFrame, vecCol: String, idCol: String,
                 model: PcaModel): DataFrame = {
    val asD = col(vecCol).cast("array<double>")
    val cols = model.components.zipWithIndex.map { case (v, kk) =>
      val vLit = typedlit(v.toIndexedSeq)
      val meanDot = model.mean.zip(v).map { case (a, b) => a * b }.sum
      (aggregate(
        zip_with(asD, vLit, (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x) - lit(meanDot)).as(s"pc_$kk")
    }
    df.select((col(idCol) +: cols.toIndexedSeq): _*)
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
    // One native pass per row (round 17): the composable posexplode →
    // 16-conditional-sum groupBy re-derived the fixed ±1 md5 matrix per
    // ELEMENT per OUTPUT (dims × k md5 evals per vector) and shuffled a
    // corpus×dims row stream for a per-row linear map. JlProjectExpr
    // memoizes the sign matrix and projects in one compiled loop — zero
    // exchanges; JlProjectSpec pins bit-parity including the null/empty
    // and all-null-element edge shapes.
    val asD = col(vecCol).cast("array<double>")
    val p = graft.expressions.VectorExprs.jlProject(asD, k)
    df.select(col(idCol), p.as("__p"))
      .where(col("__p").isNotNull)
      .select(col(idCol) +: (0 until k).map(kk =>
        col(s"__p.proj_$kk").as(s"proj_$kk")): _*)
  }
}
