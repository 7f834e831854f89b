package graft.model

/** mgcv-parity cubic regression spline basis — the "cr"/"cs" smooth the
  * reference actually fits (`mgcv::gam` at
  * /root/reference/R/_analyze_data.R:206-225), built from the public
  * construction in Wood, *Generalized Additive Models* (2017) §5.3.1:
  * the CARDINAL natural-cubic-spline basis where coefficient β_j is the
  * smooth's VALUE at knot x*_j, with the exact integrated-squared-
  * second-derivative penalty S = Dᵀ B⁻¹ D.
  *
  * The engine's GAM uses the B-spline basis in [[Spline]] (documented
  * divergence, SURVEY.md §7); this class exists to MEASURE that
  * divergence — GamSpec fits both bases on the same synthetic signal
  * and pins the prediction delta to a number — and doubles as a
  * drop-in alternative basis for callers who want knot-value
  * coefficients ([[basisRow]] + [[penalty]] feed [[Glm.fit]] directly).
  *
  * [[shrinkPenalty]] reproduces mgcv's "cs" shrinkage modification:
  * the penalty's two null-space eigenvalues (constant + linear, which
  * plain S leaves unpenalized) are replaced by 0.1× and 0.01× the
  * smallest positive eigenvalue, so λ→∞ shrinks the whole term to
  * zero (mgcv `smooth.construct.cs.smooth.spec`).
  */
final class Crs(val knots: Array[Double]) {
  val k: Int = knots.length
  require(k >= 4, s"cr basis needs >= 4 knots, got $k")
  require(knots.sliding(2).forall(p => p(1) > p(0)), "knots must be strictly increasing")

  private val h = Array.tabulate(k - 1)(i => knots(i + 1) - knots(i))

  // D: (k-2)×k second-difference map, B: (k-2)×(k-2) tridiagonal —
  // f''(interior knots) = B⁻¹ D β for the natural interpolating spline
  private val dMat = Array.tabulate(k - 2, k) { (i, j) =>
    if (j == i) 1.0 / h(i)
    else if (j == i + 1) -1.0 / h(i) - 1.0 / h(i + 1)
    else if (j == i + 2) 1.0 / h(i + 1)
    else 0.0
  }
  private val bMat = Array.tabulate(k - 2, k - 2) { (i, j) =>
    if (i == j) (h(i) + h(i + 1)) / 3.0
    else if (math.abs(i - j) == 1) h(math.max(i, j)) / 6.0
    else 0.0
  }

  // F = B⁻¹ D, padded with zero first/last rows (natural boundary:
  // f'' = 0 at the end knots) so row j gives f''(x*_j) from β
  private val fFull: Array[Array[Double]] = {
    val f = Crs.solveMany(bMat, dMat)
    Array(new Array[Double](k)) ++ f ++ Array(new Array[Double](k))
  }

  /** Basis row b(x): f(x) = b(x)·β with β_j = f(x*_j). Piecewise exact
    * on [x*_j, x*_{j+1}] (Wood 2017 eq. 5.4); x clamps to the knot
    * range like [[Spline.basis]].
    */
  def basisRow(xRaw: Double): Array[Double] = {
    val x = math.max(knots(0), math.min(knots(k - 1), xRaw))
    var j = k - 2
    var i = 0
    while (i < k - 1) { if (x < knots(i + 1)) { j = i; i = k } else i += 1 }
    val hj = h(j)
    val dxm = knots(j + 1) - x
    val dxp = x - knots(j)
    val am = dxm / hj
    val ap = dxp / hj
    val cm = (dxm * dxm * dxm / hj - hj * dxm) / 6.0
    val cp = (dxp * dxp * dxp / hj - hj * dxp) / 6.0
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      out(c) = cm * fFull(j)(c) + cp * fFull(j + 1)(c)
      c += 1
    }
    out(j) += am
    out(j + 1) += ap
    out
  }

  /** Exact curvature penalty S = Dᵀ B⁻¹ D (k×k): βᵀSβ = ∫ f''(x)² dx. */
  def penalty: Array[Array[Double]] = {
    val s = Array.ofDim[Double](k, k)
    var a = 0
    while (a < k) {
      var b = 0
      while (b < k) {
        var v = 0.0
        var r = 0
        // Dᵀ F where F = B⁻¹D (rows 1..k-2 of fFull)
        while (r < k - 2) { v += dMat(r)(a) * fFull(r + 1)(b); r += 1 }
        s(a)(b) = v
        b += 1
      }
      a += 1
    }
    s
  }

  /** The "cs" shrinkage penalty: eigen-decompose S and lift its two
    * zero eigenvalues (constant/linear null space) to 0.1× and 0.01×
    * the smallest positive one — mgcv's exact modification.
    */
  def shrinkPenalty: Array[Array[Double]] = {
    val (values, vectors) = Crs.jacobiEigen(penalty)
    // values descending; last two are the (numerically ~0) null space
    values(k - 2) = values(k - 3) * 0.1
    values(k - 1) = values(k - 2) * 0.1
    val s = Array.ofDim[Double](k, k)
    var a = 0
    while (a < k) {
      var b = 0
      while (b < k) {
        var v = 0.0
        var e = 0
        while (e < k) { v += vectors(a)(e) * values(e) * vectors(b)(e); e += 1 }
        s(a)(b) = v
        b += 1
      }
      a += 1
    }
    s
  }
}

object Crs {
  /** Knots at `k` evenly-spaced points over [lo, hi] (mgcv default
    * places them at data quantiles; uniform matches [[Spline.uniform]]
    * so basis comparisons share knot positions).
    */
  def uniform(lo: Double, hi: Double, k: Int): Crs =
    new Crs((0 until k).map(i => lo + (hi - lo) * i / (k - 1)).toArray)

  /** Solve A X = B for X (A square, small — Gaussian elimination with
    * partial pivoting; k ≤ ~20 here, cost is noise).
    */
  private def solveMany(a0: Array[Array[Double]],
                        b0: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a0.length
    val m = b0(0).length
    val a = a0.map(_.clone())
    val b = b0.map(_.clone())
    var c = 0
    while (c < n) {
      var piv = c
      var r = c + 1
      while (r < n) { if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r; r += 1 }
      val t = a(c); a(c) = a(piv); a(piv) = t
      val tb = b(c); b(c) = b(piv); b(piv) = tb
      r = c + 1
      while (r < n) {
        val f = a(r)(c) / a(c)(c)
        var j = c
        while (j < n) { a(r)(j) -= f * a(c)(j); j += 1 }
        j = 0
        while (j < m) { b(r)(j) -= f * b(c)(j); j += 1 }
        r += 1
      }
      c += 1
    }
    val x = Array.ofDim[Double](n, m)
    var r = n - 1
    while (r >= 0) {
      var j = 0
      while (j < m) {
        var v = b(r)(j)
        var cc = r + 1
        while (cc < n) { v -= a(r)(cc) * x(cc)(j); cc += 1 }
        x(r)(j) = v / a(r)(r)
        j += 1
      }
      r -= 1
    }
    x
  }

  /** Cyclic Jacobi eigen-decomposition of a small symmetric matrix:
    * returns (eigenvalues descending, column eigenvectors aligned).
    */
  private[model] def jacobiEigen(s0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = s0.length
    val a = s0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var total = 0.0
    var ti = 0
    while (ti < n) {
      var tj = 0
      while (tj < n) { total += a(ti)(tj) * a(ti)(tj); tj += 1 }
      ti += 1
    }
    var sweep = 0
    while (sweep < 50) {
      var off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) { off += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      // RELATIVE convergence: penalty matrices in x-units can have
      // uniformly tiny entries (1/h³ over seconds-of-day knots), so an
      // absolute floor would declare victory before rotating at all
      if (off < 1e-26 * math.max(total, Double.MinPositiveValue)) sweep = 50
      else {
        p = 0
        while (p < n - 1) {
          var q = p + 1
          while (q < n) {
            if (math.abs(a(p)(q)) > 1e-300) {
              val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
              val t = math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                  case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                  case tt => tt
                }
              val c = 1.0 / math.sqrt(t * t + 1.0)
              val s = t * c
              var i = 0
              while (i < n) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = c * aip - s * aiq
                a(i)(q) = s * aip + c * aiq
                i += 1
              }
              i = 0
              while (i < n) {
                val api = a(p)(i); val aqi = a(q)(i)
                a(p)(i) = c * api - s * aqi
                a(q)(i) = s * api + c * aqi
                val vip = v(i)(p); val viq = v(i)(q)
                v(i)(p) = c * vip - s * viq
                v(i)(q) = s * vip + c * viq
                i += 1
              }
            }
            q += 1
          }
          p += 1
        }
        sweep += 1
      }
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = Array.tabulate(n, n)((r, c) => v(r)(order(c)))
    (values, vectors)
  }
}
