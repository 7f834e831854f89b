package graft.model

/** Cubic B-spline basis (Cox–de Boor, order 4) with knots at data
  * quantiles — the stand-in for mgcv's "cs" cubic-regression-spline
  * basis (reference: `mgcv::gam` smooths at
  * /root/reference/R/_analyze_data.R:206-225). Divergence documented in
  * SURVEY.md §7: no mgcv in a zero-dep Scala engine, so smooths use an
  * unpenalized B-spline basis of modest rank plus a small ridge in the
  * solver; acceptance for the model stage is statistical, not bit-exact.
  */
final class Spline(val knots: Array[Double]) {
  // Clamped knot vector: 4 copies of each boundary knot.
  private val t: Array[Double] = {
    val inner = knots
    val lo = inner.head
    val hi = inner.last
    Array(lo, lo, lo) ++ inner ++ Array(hi, hi, hi)
  }
  /** Number of basis functions (order-4 B-splines over the knot vector). */
  val size: Int = t.length - 4

  /** Evaluate all basis functions at x (clamped to the knot range). */
  def basis(xRaw: Double): Array[Double] = {
    val lo = knots.head
    val hi = knots.last
    val x = if (xRaw <= lo) lo else if (xRaw >= hi) hi - 1e-9 * (hi - lo) else xRaw
    val out = new Array[Double](size)
    // Cox–de Boor recursion, degree 0 → 3
    val n = t.length - 1
    val b = new Array[Double](n)
    var i = 0
    while (i < n) {
      b(i) = if (t(i) <= x && x < t(i + 1)) 1.0 else 0.0
      i += 1
    }
    var d = 1
    while (d <= 3) {
      i = 0
      while (i < n - d) {
        val den1 = t(i + d) - t(i)
        val den2 = t(i + d + 1) - t(i + 1)
        val a1 = if (den1 > 0) (x - t(i)) / den1 * b(i) else 0.0
        val a2 = if (den2 > 0) (t(i + d + 1) - x) / den2 * b(i + 1) else 0.0
        b(i) = a1 + a2
        i += 1
      }
      d += 1
    }
    System.arraycopy(b, 0, out, 0, size)
    out
  }
}

object Spline {
  /** Knots at evenly-spaced quantiles of the (sorted copy of) data,
    * deduplicated; k = number of knots (>= 2).
    */
  def atQuantiles(values: Array[Double], k: Int): Spline = {
    val sorted = values.clone().sorted
    val qs = (0 until k).map { i =>
      sorted(((sorted.length - 1).toLong * i / (k - 1)).toInt)
    }.distinct.toArray
    val knots = if (qs.length >= 2) qs else Array(qs.head, qs.head + 1.0)
    new Spline(knots)
  }

  /** Fixed-range knots (for covariates with a known domain, e.g.
    * seconds-of-day 0..86400 or yday 1..366).
    */
  def uniform(lo: Double, hi: Double, k: Int): Spline =
    new Spline((0 until k).map(i => lo + (hi - lo) * i / (k - 1)).toArray)
}
