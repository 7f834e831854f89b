package graft.model

/** Penalized IRLS for log-link count GLMs — Poisson and negative
  * binomial (NB2) — in plain Scala (no external math deps; per-group
  * data is ≤ ~17.5k rows × ~70 columns, see SURVEY.md §2.9).
  *
  * NB2: Var(y) = mu + alpha*mu²; alpha estimated between IRLS rounds by
  * method of moments (fixed-theta simplification documented in
  * SURVEY.md §7 risk 1; reference uses mgcv's nb() family,
  * /root/reference/R/_analyze_data.R:214).
  */
object Glm {

  final case class Fit(beta: Array[Double], alpha: Double, converged: Boolean)

  /** Second-difference penalty blocks: for each (offset, len) block of
    * spline coefficients, λ·D'D with D the (len−2)×len second-difference
    * operator — the fixed-λ stand-in for mgcv's smoothing penalty
    * (penalizes curvature of adjacent B-spline coefficients).
    */
  def diffPenalty(p: Int, blocks: Seq[(Int, Int)], lambda: Double): Array[Array[Double]] = {
    val pen = Array.ofDim[Double](p, p)
    blocks.foreach { case (off, len) =>
      var r = 0
      while (r < len - 2) {
        // row of D: +1 at r, −2 at r+1, +1 at r+2 → add λ·dᵀd
        val idx = Array(off + r, off + r + 1, off + r + 2)
        val cf = Array(1.0, -2.0, 1.0)
        var a = 0
        while (a < 3) {
          var b = 0
          while (b < 3) {
            pen(idx(a))(idx(b)) += lambda * cf(a) * cf(b)
            b += 1
          }
          a += 1
        }
        r += 1
      }
    }
    pen
  }

  /** Weighted penalized least squares via normal equations + Cholesky:
    * (X'WX + ridge·I + penalty) beta = X'Wz.
    */
  private def solveWLS(x: Array[Array[Double]], z: Array[Double],
                       w: Array[Double], ridge: Double,
                       penalty: Array[Array[Double]]): Array[Double] = {
    val p = x(0).length
    val ata = Array.ofDim[Double](p, p)
    val atb = new Array[Double](p)
    var i = 0
    while (i < x.length) {
      val xi = x(i); val wi = w(i); val zi = z(i)
      var a = 0
      while (a < p) {
        val xa = xi(a) * wi
        atb(a) += xa * zi
        var b = a
        while (b < p) {
          ata(a)(b) += xa * xi(b)
          b += 1
        }
        a += 1
      }
      i += 1
    }
    var a = 0
    while (a < p) {
      var b = a + 1
      while (b < p) { ata(b)(a) = ata(a)(b); b += 1 }
      a += 1
    }
    a = 0
    while (a < p) {
      ata(a)(a) += ridge
      if (penalty != null) {
        var b = 0
        while (b < p) { ata(a)(b) += penalty(a)(b); b += 1 }
      }
      a += 1
    }
    choleskySolve(ata, atb)
  }

  /** In-place Cholesky factorization + solve; falls back to adding
    * jitter on non-PD (collinear basis columns).
    */
  private def choleskySolve(m: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val p = b.length
    var jitter = 0.0
    var attempts = 0
    while (attempts < 4) {
      val l = Array.ofDim[Double](p, p)
      var ok = true
      var i = 0
      while (i < p && ok) {
        var j = 0
        while (j <= i && ok) {
          var s = m(i)(j) + (if (i == j) jitter else 0.0)
          var k = 0
          while (k < j) { s -= l(i)(k) * l(j)(k); k += 1 }
          if (i == j) {
            if (s <= 1e-12) ok = false
            else l(i)(i) = math.sqrt(s)
          } else l(i)(j) = s / l(j)(j)
          j += 1
        }
        i += 1
      }
      if (ok) {
        // forward then backward substitution
        val y = new Array[Double](p)
        i = 0
        while (i < p) {
          var s = b(i)
          var k = 0
          while (k < i) { s -= l(i)(k) * y(k); k += 1 }
          y(i) = s / l(i)(i)
          i += 1
        }
        val xs = new Array[Double](p)
        i = p - 1
        while (i >= 0) {
          var s = y(i)
          var k = i + 1
          while (k < p) { s -= l(k)(i) * xs(k); k += 1 }
          xs(i) = s / l(i)(i)
          i -= 1
        }
        return xs
      }
      jitter = if (jitter == 0.0) 1e-6 else jitter * 100
      attempts += 1
    }
    new Array[Double](p) // degenerate group: all-zero coefficients
  }

  /** Fit log-link count GLM. `negBin=true` adds the NB2 variance with
    * method-of-moments alpha refreshed each iteration.
    */
  def fit(x: Array[Array[Double]], y: Array[Double], negBin: Boolean,
          maxIter: Int = 25, ridge: Double = 1e-6, tol: Double = 1e-8,
          penalty: Array[Array[Double]] = null): Fit = {
    val n = y.length
    val p = x(0).length
    var beta = new Array[Double](p)
    // init: intercept at log(mean), guard all-zero groups
    val ybar = math.max(y.sum / n, 1e-3)
    beta(0) = math.log(ybar)
    var alpha = 0.0
    var converged = false
    var iter = 0
    val eta = new Array[Double](n)
    val mu = new Array[Double](n)
    val z = new Array[Double](n)
    val w = new Array[Double](n)
    while (iter < maxIter && !converged) {
      var i = 0
      while (i < n) {
        var e = 0.0
        val xi = x(i)
        var j = 0
        while (j < p) { e += xi(j) * beta(j); j += 1 }
        eta(i) = math.max(-30, math.min(30, e))
        mu(i) = math.exp(eta(i))
        // working response + weights for log link:
        // z = eta + (y-mu)/mu ; w = mu (Poisson) or mu/(1+alpha*mu) (NB2)
        z(i) = eta(i) + (y(i) - mu(i)) / mu(i)
        w(i) = if (negBin) mu(i) / (1.0 + alpha * mu(i)) else mu(i)
        i += 1
      }
      val newBeta = solveWLS(x, z, w, ridge, penalty)
      var delta = 0.0
      var j = 0
      while (j < p) {
        delta = math.max(delta, math.abs(newBeta(j) - beta(j)) / (1 + math.abs(beta(j))))
        j += 1
      }
      beta = newBeta
      if (negBin) {
        // method-of-moments: alpha = sum((y-mu)^2 - mu) / sum(mu^2)
        var num = 0.0; var den = 0.0
        i = 0
        while (i < n) {
          val r = y(i) - mu(i)
          num += r * r - mu(i)
          den += mu(i) * mu(i)
          i += 1
        }
        alpha = math.max(0.0, if (den > 0) num / den else 0.0)
      }
      converged = delta < tol
      iter += 1
    }
    Fit(beta, alpha, converged)
  }

  def predict(x: Array[Double], beta: Array[Double]): Double = {
    var e = 0.0
    var j = 0
    while (j < x.length) { e += x(j) * beta(j); j += 1 }
    math.exp(math.max(-30, math.min(30, e)))
  }
}
