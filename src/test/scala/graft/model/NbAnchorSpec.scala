package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** External anchors for the NB2 family (M2/M3 acceptance,
  * reference R/_analyze_data.R:206-225 — mgcv `nb()`). The container has
  * no R, so instead of replaying mgcv output this suite pins the family
  * SEMANTICS against closed-form facts of the negative-binomial GLM that
  * are derivable independently of the implementation:
  *
  *  1. saturated-in-groups log-link NB2 MLE means equal group sample
  *     means for ANY dispersion (the group-dummy score equation
  *     Σ (y−μ)/(1+αμ) = 0 has μ̂ = ȳ as its unique root);
  *  2. the profile-ML α̂ maximizes the NB2 likelihood as computed by an
  *     INDEPENDENT implementation (Stirling-series lgamma, direct sum —
  *     shares no code with Glm's Lanczos/golden-section path);
  *  3. the NB2 deviance formula agrees with the independent saturated −
  *     fitted log-likelihood difference (the definition mgcv uses);
  *  4. equidispersed data profiles to α = 0 and collapses to the
  *     Poisson fit exactly.
  *
  * Every expected value below is computed by THIS file's own math; Glm
  * is only ever the system under test.
  */
class NbAnchorSpec extends AnyFunSuite {

  // ---- independent NB2 math: Stirling lgamma + direct likelihood ----

  /** Stirling series with argument shift — deliberately a different
    * algorithm from Glm's Lanczos form. |err| < 1e-10 over the range
    * exercised here.
    */
  private def lgammaStirling(x0: Double): Double = {
    var x = x0
    var shift = 0.0
    while (x < 8.0) { shift -= math.log(x); x += 1.0 }
    val z = x
    (z - 0.5) * math.log(z) - z + 0.5 * math.log(2 * math.Pi) +
      1.0 / (12 * z) - 1.0 / (360 * z * z * z) +
      1.0 / (1260 * math.pow(z, 5)) + shift
  }

  private def nbLl(y: Seq[Double], mu: Seq[Double], alpha: Double): Double = {
    val r = 1.0 / alpha
    y.zip(mu).map { case (yi, mi) =>
      lgammaStirling(yi + r) - lgammaStirling(r) - lgammaStirling(yi + 1.0) +
        r * math.log(r / (r + mi)) + yi * math.log(mi / (r + mi))
    }.sum
  }

  // overdispersed anchor sample: mean 6, variance 17.5
  private val y = Seq(2.0, 3.0, 6.0, 7.0, 12.0)
  private val ones = y.map(_ => Array(1.0)).toArray

  test("anchor 1: intercept-only NB2 MLE mean is the sample mean (any alpha)") {
    val f = Glm.fit(ones, y.toArray, negBin = true)
    assert(math.abs(math.exp(f.beta(0)) - 6.0) < 1e-6,
      s"exp(beta0)=${math.exp(f.beta(0))} vs ybar=6")
    // the identity holds at FIXED alpha too: refit pinned to a very
    // different dispersion must still recover ybar (score-equation fact,
    // not an artifact of the profiling loop)
    val g = Glm.fit(ones, y.toArray, negBin = false) // Poisson limb
    assert(math.abs(math.exp(g.beta(0)) - 6.0) < 1e-6)
  }

  test("anchor 2: profiled alpha maximizes the INDEPENDENT NB2 likelihood") {
    val f = Glm.fit(ones, y.toArray, negBin = true)
    assert(f.alpha > 0, "overdispersed sample must not collapse to Poisson")
    val mu = y.map(_ => math.exp(f.beta(0)))
    // independent fine grid over log-alpha: the grid argmax must agree
    // with the golden-section profile to grid resolution
    val grid = (-600 to 300).map(i => math.pow(10, i / 100.0)) // 1e-6..1e3, 2.3% steps
    val best = grid.maxBy(a => nbLl(y, mu, a))
    assert(math.abs(math.log(f.alpha) - math.log(best)) < 0.05,
      s"profiled alpha=${f.alpha} vs independent grid argmax=$best")
    // local-max property under the independent likelihood directly
    val ll0 = nbLl(y, mu, f.alpha)
    assert(ll0 >= nbLl(y, mu, f.alpha * 1.1) - 1e-9)
    assert(ll0 >= nbLl(y, mu, f.alpha / 1.1) - 1e-9)
  }

  test("anchor 3: NB2 deviance equals 2*(saturated - fitted) independent ll") {
    val f = Glm.fit(ones, y.toArray, negBin = true)
    val a = f.alpha
    val mu = y.map(_ => 6.0)
    val got = Glm.deviance(y.toArray, mu.toArray, a, negBin = true)
    // saturated model: mu_i = y_i (all y > 0 here); same alpha
    val want = 2.0 * (nbLl(y, y, a) - nbLl(y, mu, a))
    assert(math.abs(got - want) < 1e-8, s"deviance $got vs independent $want")
  }

  test("anchor 4: two-group saturated design recovers both sample means " +
    "under one shared dispersion") {
    // groups with very different means AND dispersions: A ~ mean 2,
    // B ~ mean 10 — the dummy-design score equations force each fitted
    // mean to its group mean regardless of the shared alpha
    val ya = Seq(1.0, 2.0, 3.0)
    val yb = Seq(4.0, 10.0, 16.0)
    val x = (ya.map(_ => Array(1.0, 0.0)) ++ yb.map(_ => Array(1.0, 1.0))).toArray
    val f = Glm.fit(x, (ya ++ yb).toArray, negBin = true)
    val muA = math.exp(f.beta(0))
    val muB = math.exp(f.beta(0) + f.beta(1))
    assert(math.abs(muA - 2.0) < 1e-5, s"muA=$muA")
    assert(math.abs(muB - 10.0) < 1e-5, s"muB=$muB")
  }

  test("anchor 6: q197 shape — 7-level one-hot saturated design at " +
    "LARGE counts recovers every level mean (needs the maxIter headroom)") {
    // the q197 registry row's exact design: one indicator per level, no
    // intercept. Large counts (~y=900) expose the cold-init walk: the
    // non-first columns start at eta=0 and a log-link IRLS that
    // overshoots upward retreats ~1 eta-unit per step, so the default
    // maxIter=25 strands the Poisson limb (found live at sf0.1 — this
    // test pins the fix and fails if the 60-iter headroom regresses)
    val rng = new scala.util.Random(7)
    val levels = 7
    val perLevel = 20
    val y = Array.tabulate(levels * perLevel) { i =>
      val l = i / perLevel
      (850 + 40 * l + rng.nextInt(120)).toDouble
    }
    val x = Array.tabulate(levels * perLevel) { i =>
      Array.tabulate(levels)(j => if (j == i / perLevel) 1.0 else 0.0)
    }
    val totals = (0 until levels).map(l =>
      y.slice(l * perLevel, (l + 1) * perLevel).sum) // integer-valued
    val nb = Glm.fit(x, y, negBin = true, maxIter = 60)
    val po = Glm.fit(x, y, negBin = false, maxIter = 60)
    // the q197 DuckDB gate compares round(exp(beta_j)*n, 4) against the
    // EXACT integer level total, so the convergence bar this spec must
    // pin is |fitted_total - total| < 5e-5 — not the ~0.09-absolute
    // slack of a 1e-4-relative check at y~900 (r16 advice). Assert the
    // gate's own form: half-up round-4 of the fitted total equals the
    // integer total exactly.
    def round4(v: Double): BigDecimal =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    (0 until levels).foreach { j =>
      val nbTotal = math.exp(nb.beta(j)) * perLevel
      val poTotal = math.exp(po.beta(j)) * perLevel
      assert(math.abs(nbTotal - totals(j)) < 5e-5 &&
        round4(nbTotal) == BigDecimal(totals(j)),
        s"NB level $j: fitted total $nbTotal vs ${totals(j)}")
      assert(math.abs(poTotal - totals(j)) < 5e-5 &&
        round4(poTotal) == BigDecimal(totals(j)),
        s"Poisson level $j: fitted total $poTotal vs ${totals(j)}")
    }
  }

  test("anchor 5: equidispersed data collapses to the exact Poisson fit") {
    val yc = Seq(4.0, 4.0, 4.0, 4.0)
    val f = Glm.fit(yc.map(_ => Array(1.0)).toArray, yc.toArray, negBin = true)
    assert(f.alpha == 0.0, s"constant data must profile to Poisson, got ${f.alpha}")
    assert(math.abs(math.exp(f.beta(0)) - 4.0) < 1e-5)
    // and the NB2 deviance at alpha=0 is the Poisson deviance: 0 here
    assert(math.abs(Glm.deviance(yc.toArray, yc.toArray, 0.0, negBin = true)) < 1e-12)
  }
}
