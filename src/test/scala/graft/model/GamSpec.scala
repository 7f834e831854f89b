package graft.model

import graft.SparkSpec

class GamSpec extends SparkSpec {

  test("Spline basis: partition of unity, local support") {
    val sp = Spline.uniform(0, 100, 6)
    Seq(0.0, 13.7, 50.0, 99.9).foreach { x =>
      val b = sp.basis(x)
      assert(math.abs(b.sum - 1.0) < 1e-9, s"sum at $x")
      assert(b.count(_ > 1e-12) <= 4) // cubic: at most 4 active
    }
  }

  test("Crs basis: cardinal at knots, partition of unity, exact-zero curvature penalty on lines") {
    val cr = Crs.uniform(0, 100, 7)
    // cardinal: b(x*_j) = e_j — coefficients ARE knot values
    cr.knots.zipWithIndex.foreach { case (kx, j) =>
      val b = cr.basisRow(kx)
      b.zipWithIndex.foreach { case (v, i) =>
        assert(math.abs(v - (if (i == j) 1.0 else 0.0)) < 1e-9, s"b($kx)($i)=$v")
      }
    }
    // natural interpolation of a constant is that constant
    Seq(3.3, 47.2, 99.1).foreach { x =>
      assert(math.abs(cr.basisRow(x).sum - 1.0) < 1e-9, s"unity at $x")
    }
    // βᵀSβ = ∫f''² is 0 for linear knot values, positive for curvature
    val s = cr.penalty
    def quad(beta: Array[Double]) = {
      var v = 0.0
      for (a <- 0 until 7; b <- 0 until 7) v += beta(a) * s(a)(b) * beta(b)
      v
    }
    val line = cr.knots.map(kx => 2.0 + 0.3 * kx)
    val bent = cr.knots.map(kx => kx * kx / 100.0)
    assert(math.abs(quad(line)) < 1e-9 * quad(bent))
    assert(quad(bent) > 0)
    // the cs shrinkage penalty penalizes the null space too
    val ss = cr.shrinkPenalty
    def quadS(beta: Array[Double]) = {
      var v = 0.0
      for (a <- 0 until 7; b <- 0 until 7) v += beta(a) * ss(a)(b) * beta(b)
      v
    }
    assert(quadS(line) > 0)
  }

  test("Crs midpoint basis row equals its exact-rational closed form " +
    "(pins B's tridiagonal values)") {
    // The ONE Crs ingredient the q198 linear-reproduction anchor cannot
    // see is the tridiagonal B's VALUES (D·β = 0 annihilates B⁻¹ for
    // every linear signal). Pin them here by hand-derived rationals:
    // knots {0,1,2,3} → B = [[2/3,1/6],[1/6,2/3]] (det 5/12),
    // B⁻¹ = [[8/5,-2/5],[-2/5,8/5]], D = [[1,-2,1,0],[0,1,-2,1]],
    // F = B⁻¹D row₁ = [8/5,-18/5,12/5,-2/5]. At x = 1/2 (segment 0):
    // am = ap = 1/2, cm = cp = -1/16, and fFull(0) is the natural
    // zero row, so b(1/2) = (e₀+e₁)/2 - F₁/16
    //             = [2/5, 29/40, -3/20, 1/40].
    // A wrong B entry (or a broken solve) moves these four numbers.
    val cr = new Crs(Array(0.0, 1.0, 2.0, 3.0))
    val b = cr.basisRow(0.5)
    val want = Array(2.0 / 5, 29.0 / 40, -3.0 / 20, 1.0 / 40)
    b.zip(want).zipWithIndex.foreach { case ((got, w), i) =>
      assert(math.abs(got - w) < 1e-12, s"b(0.5)($i)=$got want $w")
    }
    // and the mirrored segment: b(2.5) must be the reverse by symmetry
    val b2 = cr.basisRow(2.5)
    b2.zip(want.reverse).zipWithIndex.foreach { case ((got, w), i) =>
      assert(math.abs(got - w) < 1e-12, s"b(2.5)($i)=$got want $w")
    }
  }

  test("q198 shape: log-linear signal over the cr basis fits exactly at " +
    "the gate's bar (|mu - y| < 5e-5, ridge 1e-9)") {
    // the q198 registry row's exact design: x ∈ 0..7 over
    // Crs.uniform(0,7,4), y = 5·2^x (exactly log-linear, so in the
    // natural-spline span). The DuckDB gate compares round(mu, 4)
    // against the INTEGER y, so the bar is 5e-5 ABSOLUTE at mu up to
    // 640 — this test pins the ridge=1e-9 choice (measured worst
    // |mu-y| on this design: 5.1e-6 at the default ridge=1e-6, only
    // 10x under the bar; 5.1e-9 at 1e-9) and fails if IRLS
    // convergence or linear reproduction regresses.
    val crs = Crs.uniform(0, 7, 4)
    val xs = (0 to 7).toArray
    val x = xs.map(v => crs.basisRow(v.toDouble))
    val y = xs.map(v => 5.0 * (1L << v))
    Seq(true, false).foreach { nb =>
      val f = Glm.fit(x, y, negBin = nb, maxIter = 60, ridge = 1e-9)
      xs.indices.foreach { i =>
        val mu = Glm.predict(x(i), f.beta)
        assert(math.abs(mu - y(i)) < 5e-5,
          s"negBin=$nb x=${xs(i)}: mu=$mu vs y=${y(i)} " +
            f"(err ${math.abs(mu - y(i))}%.2e)")
        // the gate's own form: half-up round-4 equals the exact integer
        val r4 = BigDecimal(mu).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        assert(r4 == BigDecimal(y(i)), s"negBin=$nb round4($mu) != ${y(i)}")
      }
    }
  }

  test("Glm Poisson IRLS recovers log-linear rate") {
    // y ~ Poisson(exp(1 + 0.5*x)); deterministic pseudo-sample via quantiles
    val rng = new scala.util.Random(7)
    val x = Array.tabulate(2000)(i => Array(1.0, i / 1000.0 - 1.0))
    val y = x.map { xi =>
      val mu = math.exp(1.0 + 0.5 * xi(1))
      // Poisson draw (Knuth) with fixed seed
      var l = math.exp(-mu); var k = 0; var p = 1.0
      while ({ p *= rng.nextDouble(); p > l }) k += 1
      k.toDouble
    }
    val fit = Glm.fit(x, y, negBin = false)
    assert(math.abs(fit.beta(0) - 1.0) < 0.1)
    assert(math.abs(fit.beta(1) - 0.5) < 0.1)
  }

  test("Glm NB2 estimates overdispersion alpha > 0 on overdispersed data") {
    val rng = new scala.util.Random(11)
    val x = Array.fill(3000)(Array(1.0))
    // NB via Poisson-Gamma mixture: mu=20, alpha=0.3
    val y = x.map { _ =>
      val g = {
        // Gamma(shape=1/alpha, scale=alpha*mu) ≈ via sum of exponentials fallback
        val shape = 1.0 / 0.3
        var s = 0.0
        (1 to shape.toInt).foreach(_ => s += -math.log(rng.nextDouble()))
        s * 0.3 * 20.0 / shape * shape // scale to mean 20
      }
      val mu = g
      var l = math.exp(-math.min(mu, 700)); var k = 0; var p = 1.0
      while ({ p *= rng.nextDouble(); p > l }) k += 1
      k.toDouble
    }
    val fit = Glm.fit(x, y, negBin = true)
    assert(fit.alpha > 0.05, s"alpha=${fit.alpha}")
    assert(math.abs(math.exp(fit.beta(0)) - 20.0) < 4.0)
  }

  test("profile-ML theta attains at least the MoM warm start's NB2 likelihood") {
    val rng = new scala.util.Random(29)
    val x = Array.fill(4000)(Array(1.0))
    // overdispersed counts: Poisson(Gamma mean), target mu=15, alpha≈0.4
    val y = x.map { _ =>
      val shape = 1.0 / 0.4
      var g = 0.0
      (1 to 5).foreach(_ => g += -math.log(rng.nextDouble()))
      val mu = g / 5.0 * 15.0
      var l = math.exp(-math.min(mu, 700)); var k = 0; var p = 1.0
      while ({ p *= rng.nextDouble(); p > l }) k += 1
      k.toDouble
    }
    val mom = Glm.fit(x, y, negBin = true, mlTheta = false)
    val ml = Glm.fit(x, y, negBin = true)
    def muOf(f: Glm.Fit) = x.map(Glm.predict(_, f.beta))
    val llMom = Glm.nbLogLik(y, muOf(mom), math.max(mom.alpha, 1e-8))
    val llMl = Glm.nbLogLik(y, muOf(ml), math.max(ml.alpha, 1e-8))
    assert(llMl >= llMom - 1e-6, s"ML ll $llMl < MoM ll $llMom")
    assert(ml.alpha > 0.02, s"alpha=${ml.alpha}")
  }

  test("alpha == 0 fits carry a Poisson-consistent beta (refit-on-collapse contract)") {
    // When the profile collapses dispersion to exactly 0 the returned beta
    // must be re-estimated under Poisson weights, not left paired with the
    // stale NB2-weighted estimate. Underdispersed and equidispersed groups
    // both profile to the lower bound and exercise the collapse path.
    val x = Array.fill(60)(Array(1.0))
    val under = Array.tabulate(60)(i => if (i % 2 == 0) 9.0 else 11.0) // var 1 < mean 10
    val equi = Array.tabulate(60)(i => (i % 3) match {
      case 0 => 10.0; case 1 => 10.0 - math.sqrt(15.0); case _ => 10.0 + math.sqrt(15.0)
    })
    for ((y, tag) <- Seq((under, "under"), (equi, "equi"))) {
      val ml = Glm.fit(x, y, negBin = true)
      assert(ml.alpha == 0.0, s"$tag: alpha=${ml.alpha}")
      val pois = Glm.fit(x, y, negBin = false)
      assert(math.abs(ml.beta(0) - pois.beta(0)) < 1e-10,
        s"$tag: beta ${ml.beta(0)} vs Poisson ${pois.beta(0)}")
    }
  }

  test("GAM recovers smooth daily + weekday signal (statistical gate, M2/M4)") {
    // Known signal: volume = exp(3 + 0.8*sin(2π·itime/86400) + weekday lift)
    val cfg = Gam.Config(hourly = true, negBin = false)
    val rng = new scala.util.Random(3)
    val start = java.time.LocalDateTime.parse("2018-01-01T00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC)
    val rows = (0 until 24 * 365).map { h =>
      val t = start + h * 3600L
      val f = Gam.feats(t)
      val lift = if (f.weekday == 0 || f.weekday == 6) 0.0 else 0.5
      val mu = math.exp(3.0 + 0.8 * math.sin(2 * math.Pi * f.itime / 86400.0) + lift)
      var l = math.exp(-mu); var k = 0; var p = 1.0
      while ({ p *= rng.nextDouble(); p > l }) k += 1
      Gam.TrainRow("n1", "c1", t, k.toDouble)
    }
    val grid = (0 until 24 * 7).map(h => start + 366L * 86400 + h * 3600L)
    val preds = Gam.fitScoreGroup(rows, grid, cfg).toSeq
    assert(preds.size == grid.size)
    // statistical acceptance: mean relative error vs true mu < 15%
    val relErrs = preds.map { p =>
      val f = Gam.feats(p.epochSec)
      val lift = if (f.weekday == 0 || f.weekday == 6) 0.0 else 0.5
      val mu = math.exp(3.0 + 0.8 * math.sin(2 * math.Pi * f.itime / 86400.0) + lift)
      math.abs(p.yhat - mu) / mu
    }
    val mre = relErrs.sum / relErrs.size
    assert(mre < 0.15, s"mean relative error $mre")
  }

  test("smoothing penalty shrinks fitted curvature monotonically in lambda") {
    val start = java.time.LocalDateTime.parse("2018-01-01T00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC)
    val rng = new scala.util.Random(5)
    val rows = (0 until 24 * 120).map { h =>
      val t = start + h * 3600L
      val f = Gam.feats(t)
      val mu = math.exp(2.0 + 1.0 * math.sin(2 * math.Pi * f.itime / 86400.0))
      var l = math.exp(-mu); var k = 0; var p = 1.0
      while ({ p *= rng.nextDouble(); p > l }) k += 1
      Gam.TrainRow("n", "c", t, k.toDouble)
    }
    val grid = (0 until 24).map(h => start + 200L * 86400 + h * 3600L)
    def spread(lambda: Double): Double = {
      val preds = Gam.fitScoreGroup(rows, grid,
        Gam.Config(hourly = true, negBin = false, lambda = lambda)).toSeq
      val v = preds.map(_.yhat.toDouble)
      v.max - v.min
    }
    // the second-difference penalty's null space is LINEAR coefficient
    // profiles, so λ→∞ doesn't flatten to a constant — but curvature
    // (and hence the fitted daily spread of a sinusoid) must shrink
    // monotonically with λ
    val (lo, mid, hi) = (spread(1.0), spread(1e6), spread(1e9))
    assert(hi <= mid && mid < lo, s"spreads not monotone: $lo, $mid, $hi")
  }

  // shared 1-D penalized-spline setup for the GCV tests: design
  // [1, spline(t) drop-first], one penalty block over the smooth
  private def splineDesign(n: Int, k: Int): (Array[Array[Double]], Seq[(Int, Int)], Spline) = {
    val sp = Spline.uniform(0, 100, k)
    val x = Array.tabulate(n) { i =>
      val t = i * 100.0 / (n - 1)
      val b = sp.basis(t)
      Array(1.0) ++ b.drop(1)
    }
    (x, Seq((1, sp.size - 1)), sp)
  }

  private def poisson(rng: scala.util.Random, mu: Double): Double = {
    var l = math.exp(-math.min(mu, 700)); var kk = 0; var p = 1.0
    while ({ p *= rng.nextDouble(); p > l }) kk += 1
    kk.toDouble
  }

  test("edf decreases monotonically in lambda and stays within (0, p]") {
    val rng = new scala.util.Random(13)
    val (x, blocks, _) = splineDesign(800, 10)
    val y = x.indices.map { i =>
      val t = i * 100.0 / 799
      poisson(rng, math.exp(2.0 + math.sin(4 * math.Pi * t / 100)))
    }.toArray
    val edfs = Seq(1e-4, 1.0, 1e2, 1e4).map { lam =>
      val pen = Glm.diffPenalty(x(0).length, blocks, lam)
      Glm.score(x, y, Glm.fit(x, y, negBin = false, penalty = pen),
        negBin = false, pen, lam).edf
    }
    assert(edfs == edfs.sortBy(-_), s"edf not decreasing: $edfs")
    assert(edfs.head <= x(0).length + 1e-6 && edfs.last > 0, s"edf out of range: $edfs")
    // the penalty null space (constant+linear coefficient profiles)
    // keeps edf well above 1 even at huge λ, but far below p
    assert(edfs.head - edfs.last > 2.0, s"penalty has no bite: $edfs")
  }

  test("GCV selection: wiggly signal keeps λ small, pure noise prefers big λ, " +
    "and the winner is the grid's GCV argmin") {
    val rng = new scala.util.Random(17)
    val (x, blocks, _) = splineDesign(800, 10)
    val grid = Seq(1e-3, 1e-1, 10.0, 1e3, 1e5)
    val wigglyY = x.indices.map { i =>
      val t = i * 100.0 / 799
      poisson(rng, math.exp(2.0 + math.sin(6 * math.Pi * t / 100)))
    }.toArray
    val flatY = x.indices.map(_ => poisson(rng, math.exp(2.0))).toArray
    val w = Glm.fitGcv(x, wigglyY, negBin = false, blocks, grid)
    val f = Glm.fitGcv(x, flatY, negBin = false, blocks, grid)
    assert(w.lambda < f.lambda, s"wiggly λ=${w.lambda} !< flat λ=${f.lambda}")
    // selected fit beats the over-smoothed extreme on deviance for the
    // wiggly node (the thing fixed λ couldn't promise)
    val stiffPen = Glm.diffPenalty(x(0).length, blocks, 1e5)
    val stiff = Glm.score(x, wigglyY,
      Glm.fit(x, wigglyY, negBin = false, penalty = stiffPen),
      negBin = false, stiffPen, 1e5)
    assert(w.deviance < stiff.deviance)
  }

  test("fitScoreGroup with lambdaGrid recovers the wiggly signal a stiff fixed λ misses (M2)") {
    val rng = new scala.util.Random(23)
    val start = java.time.LocalDateTime.parse("2018-01-01T00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC)
    val rows = (0 until 24 * 180).map { h =>
      val t = start + h * 3600L
      val f = Gam.feats(t)
      val mu = math.exp(2.0 + 1.2 * math.sin(2 * math.Pi * f.itime / 86400.0))
      Gam.TrainRow("n", "c", t, poisson(rng, mu))
    }
    val grid = (0 until 24).map(h => start + 200L * 86400 + h * 3600L)
    def mre(cfg: Gam.Config): Double = {
      val preds = Gam.fitScoreGroup(rows, grid, cfg).toSeq
      val errs = preds.map { p =>
        val f = Gam.feats(p.epochSec)
        val mu = math.exp(2.0 + 1.2 * math.sin(2 * math.Pi * f.itime / 86400.0))
        math.abs(p.yhat - mu) / mu
      }
      errs.sum / errs.size
    }
    val selected = mre(Gam.Config(hourly = true, negBin = false,
      lambdaGrid = Seq(1e-2, 1.0, 1e2, 1e4, 1e6)))
    val stiff = mre(Gam.Config(hourly = true, negBin = false, lambda = 1e6))
    assert(selected < stiff, s"GCV mre $selected !< stiff mre $stiff")
    assert(selected < 0.2, s"selected-λ mre $selected")
  }

  test("fitPredict: distributed per-group fit, one row per group×grid-slot") {
    import spark.implicits._
    val start = java.time.LocalDateTime.parse("2018-01-01T00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC)
    val rows = for {
      g <- Seq("a", "b")
      h <- 0 until 24 * 60 // 60 days hourly
    } yield (g, "corr_" + g, new java.sql.Timestamp((start + h * 3600L) * 1000),
      (if (g == "a") 10.0 else 100.0) + (h % 24))
    val df = rows.toDF("node", "corridor", "ts", "volume")
    val out = Gam.fitPredict(df, "node", "corridor", "ts", "volume",
      "2018-03-15 00:00:00", "2018-03-15 23:00:00", 3600,
      Gam.Config(hourly = true))
    assert(out.count() == 2 * 24)
    val avg = out.groupBy($"node").avg("PREDICTION").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(avg("b") > avg("a") * 3) // group separation survives
  }

  test("measured divergence: B-spline vs mgcv cr/cs basis on the M2 synthetic signal (§7)") {
    // The engine's documented divergence from the reference is basis
    // choice: clamped B-splines + coefficient-difference penalty here,
    // mgcv's shrinkage cubic regression spline there. This pins the
    // divergence as a NUMBER: fit both bases (equal rank, same knots,
    // same Poisson IRLS, each at its own GCV-chosen λ) on the known M2
    // signal and measure the fitted-curve disagreement.
    val rng = new scala.util.Random(7)
    val n = 24 * 120
    val ts = Array.tabulate(n)(i => (i.toLong * 3600L) % 86400)
    def mu(t: Double) = math.exp(3.0 + 0.8 * math.sin(2 * math.Pi * t / 86400.0))
    val y = ts.map(t => poisson(rng, mu(t.toDouble)))

    // rank parity: B-spline with 8 uniform knots has 10 basis fns →
    // drop-first gives 9 smooth cols; cr with 10 knots gives the same
    val bsp = Spline.uniform(0, 86400, 8)
    val crs = Crs.uniform(0, 86400, 10)
    val p = 10
    val xB = ts.map(t => Array(1.0) ++ bsp.basis(t.toDouble).drop(1))
    val xC = ts.map(t => Array(1.0) ++ crs.basisRow(t.toDouble).drop(1))

    // embed each smooth's penalty at design offset 1, normalized to
    // unit max-entry so one λ grid serves both scales (mgcv similarly
    // rescales each S before smoothing-parameter selection)
    def embed(s: Array[Array[Double]]): Array[Array[Double]] = {
      val m = s.map(_.max).max.max(s.map(_.min).min.abs)
      val out = Array.ofDim[Double](p, p)
      for (a <- 1 until p; b <- 1 until p) out(a)(b) = s(a)(b) / m
      out
    }
    val penB = embed(Glm.diffPenalty(p, Seq((1, 9)), 1.0))
    val penC = embed {
      val full = crs.shrinkPenalty // the "cs" variant the reference fits
      Array.tabulate(p, p)((a, b) => full(a)(b)) // drop-first: row/col 0 constrained out
    }
    def best(x: Array[Array[Double]], pen0: Array[Array[Double]]): Glm.Fit =
      Seq(1e-4, 1e-2, 1.0, 1e2, 1e4).map { lam =>
        val pen = pen0.map(_.map(_ * lam))
        Glm.score(x, y, Glm.fit(x, y, negBin = false, penalty = pen),
          negBin = false, pen, lam)
      }.minBy(_.gcv).fit

    val fitB = best(xB, penB)
    val fitC = best(xC, penC)
    val grid = 0 until 86400 by 600
    val (dSum, eBSum, eCSum) = grid.foldLeft((0.0, 0.0, 0.0)) { case ((d, eb, ec), t) =>
      val pb = Glm.predict(Array(1.0) ++ bsp.basis(t.toDouble).drop(1), fitB.beta)
      val pc = Glm.predict(Array(1.0) ++ crs.basisRow(t.toDouble).drop(1), fitC.beta)
      val truth = mu(t.toDouble)
      (d + math.abs(pb - pc) / ((pb + pc) / 2), eb + math.abs(pb - truth) / truth,
        ec + math.abs(pc - truth) / truth)
    }
    val (relDelta, mreB, mreC) = (dSum / grid.size, eBSum / grid.size, eCSum / grid.size)
    info(f"mean |B-spline − cr/cs| / mean = $relDelta%.4f " +
      f"(B-spline MRE vs truth $mreB%.4f, cr/cs MRE $mreC%.4f)")
    // the divergence number: the two bases must agree with each other
    // more closely than either agrees with the noisy truth — basis
    // choice is then demonstrably NOT the binding error term
    assert(relDelta < 0.10, f"basis divergence $relDelta%.4f")
    assert(relDelta < math.max(mreB, mreC) + 0.02,
      f"basis divergence $relDelta%.4f exceeds fit error ($mreB%.4f, $mreC%.4f)")
    assert(mreB < 0.15 && mreC < 0.15)
  }
}
