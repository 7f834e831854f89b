package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")

  test("cosine: orthogonal=0, identical=1, zero-vector=0") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0), Array(0.0, 0.0)))
      .toDF("a", "b", "z")
    val r = df.select(
      Similarity.cosine($"a", $"b"), Similarity.cosine($"a", $"a"),
      Similarity.cosine($"a", $"z")).head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0 && r.getDouble(2) == 0.0)
  }

  test("bruteForceTopK ranks by cosine desc, excludes self") {
    val q = vecs.where($"vec_id" === 1)
    val out = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 2)
    val got = out.orderBy("rank").select($"neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(2L, 3L)) // 2 closest to 1; 3 ties 4, id asc breaks tie
  }

  test("ivfTopK: probed cells yield true-cosine ranked neighbors") {
    val many = (1L to 100L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 0.37 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(many, many.where($"vec_id" <= 3),
      "vec_id", "embedding", nCentroids = 8, nProbe = 8, k = 3)
    // nProbe = nCentroids → exhaustive → must equal brute force exactly
    val brute = Similarity.bruteForceTopK(many, many.where($"vec_id" <= 3),
      "vec_id", "embedding", 3)
    assert(rows(out.select($"query_id", $"rank", $"neighbor_id")) ==
      rows(brute.select($"query_id", $"rank", $"neighbor_id")))
  }

  test("ANN recall floors: IVF and LSH recover a usable share of true top-5") {
    // 200 vectors on a smooth curve (deterministic), 10 query points
    val corpus = (1L to 200L).map(i =>
      (i, Array.tabulate(16)(d => math.cos(i * 0.05 + d * 0.4).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = corpus.where($"vec_id" % 20 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5))
    val ivf = pairs(Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
      nCentroids = 16, nProbe = 4, k = 5))
    val lsh = pairs(Similarity.lshTopK(corpus, "vec_id", "embedding", bits = 4, k = 5)
      .where($"query_id" % 20 === 0))
    val ivfRecall = (ivf intersect truth).size.toDouble / truth.size
    val lshRecall = (lsh intersect truth).size.toDouble / truth.size
    // deterministic hash planes/centroids → stable values; floors mark
    // the quality bar the scale paths must not regress below (measured:
    // IVF 1.0 with the k-means quantizer, LSH 0.88)
    assert(ivfRecall >= 0.9, s"IVF recall@5 = $ivfRecall")
    assert(lshRecall >= 0.7, s"LSH recall@5 = $lshRecall")
  }

  test("ivfTopK plan is map-side: no corpus×centroid explode, no assignment window") {
    val many = (1L to 100L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 0.37 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(many, many.where($"vec_id" <= 3),
      "vec_id", "embedding", nCentroids = 8, nProbe = 2, k = 3)
    val plan = out.queryExecution.optimizedPlan
    // exactly one Window (the final top-k rank) and one Generate (the
    // nProbe explode on the tiny query side); assignment itself is a
    // pure projection — the N×C shape the old plan shuffled is gone
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Window => LWindow}
    assert(plan.collect { case w: LWindow => w }.size == 1, plan)
    assert(plan.collect { case g: Generate => g }.size == 1, plan)
  }

  test("trainCentroids improves assignment quality over a degenerate seed " +
    "(Lloyd optimizes mean vector-to-centroid cosine)") {
    // unbalanced direction clusters (sizes 100/30/15/5) with jitter; the
    // seed is 4 vectors from the SAME big cluster — the worst case a
    // mass-weighted sample can produce — so cells start collapsed
    val rnd = new scala.util.Random(43)
    def vec(base: Int) = Array.tabulate(12)(d =>
      (if (d == base * 3) 1.0 else 0.0) + rnd.nextDouble() * 0.15)
    val raw: Seq[(Long, Array[Double])] =
      (0 until 100).map(i => (i.toLong, vec(0))) ++
        (100 until 130).map(i => (i.toLong, vec(1))) ++
        (130 until 145).map(i => (i.toLong, vec(2))) ++
        (145 until 150).map(i => (i.toLong, vec(3)))
    val corpus = raw.toDF("vec_id", "v")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def quality(cents: Array[Array[Double]]): Double =
      raw.map { case (_, v) => cents.map(c => cos(v, c)).max }.sum / raw.size
    val badInit = raw.take(4).map(_._2.clone()).toArray // all cluster-0
    val trained = Similarity.trainCentroids(corpus, "v", badInit, iters = 5)
    assert(quality(trained) > quality(badInit) + 0.05,
      s"trained=${quality(trained)} seed=${quality(badInit)}")
    // trained cells separate: every cluster direction now has a centroid
    // whose best-fit similarity is high
    assert(quality(trained) > 0.9, s"trained quality=${quality(trained)}")
  }

  test("trainCentroids: Lloyd rounds pull centroids onto the true clusters") {
    // two tight, well-separated direction clusters
    val pts = ((1L to 30L).map(i => (i, Array(1.0, 0.02 * (i % 5), 0.0))) ++
      (31L to 60L).map(i => (i, Array(0.0, 0.02 * (i % 5), 1.0))))
      .toDF("vec_id", "v")
    val init = Array(Array(0.9, 0.1, 0.1), Array(0.1, 0.1, 0.9))
    val trained = Similarity.trainCentroids(pts, "v", init, iters = 3)
    assert(trained(0)(0) > 0.95 && trained(0)(2) < 0.1) // cluster-1 direction
    assert(trained(1)(2) > 0.95 && trained(1)(0) < 0.1) // cluster-2 direction
  }

  test("trainCentroids tolerates NULL vectors (no driver-side NPE)") {
    val pts = ((1L to 10L).map(i => (i, Option(Array(1.0, 0.0)))) :+
      (11L, Option.empty[Array[Double]]))
      .toDF("vec_id", "v")
    val init = Array(Array(0.5, 0.5))
    val trained = Similarity.trainCentroids(pts, "v", init, iters = 2)
    assert(trained.length == 1 && trained(0)(0) > 0.95)
  }

  test("semDedup: within-cluster near-identicals collapse to the smallest id; " +
    "NULL vectors and singletons keep themselves") {
    // two well-separated direction clusters; ids 1,2,3 near-identical in
    // cluster A, id 4 alone in cluster B, id 5 NULL
    val pts = Seq(
      (1L, Option(Array(1.0, 0.0, 0.01))),
      (2L, Option(Array(1.0, 0.0, 0.02))),
      (3L, Option(Array(1.0, 0.0, 0.00))),
      (4L, Option(Array(0.0, 1.0, 0.00))),
      (5L, Option.empty[Array[Double]])).toDF("vec_id", "v")
    // nClusters = 1 keeps the cell assignment trivially deterministic so
    // the DECISION semantics are what's pinned (with k > 1 the hash-seeded
    // quantizer may legitimately split the near-identical trio)
    val out = Similarity.semDedup(pts, "vec_id", "v",
      nClusters = 1, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(out(1L) == (1L, false)) // smallest id keeps itself
    assert(out(2L) == (1L, true))
    assert(out(3L) == (1L, true))
    assert(out(4L) == (4L, false)) // own cluster: no candidates
    assert(out(5L) == (5L, false)) // NULL vector never matches
  }

  test("semDedup portable mode: same decision semantics under the md5 " +
    "plane cells (identical directions share a cell by construction)") {
    val pts = Seq(
      (1L, Option(Array(1.0, 0.0, 0.01))),
      (2L, Option(Array(1.0, 0.0, 0.02))),
      (3L, Option(Array(1.0, 0.0, 0.00))),
      (4L, Option(Array(0.0, 1.0, 0.00))),
      (5L, Option.empty[Array[Double]])).toDF("vec_id", "v")
    // near-identical directions project to near-identical plane dots, so
    // the trio shares every sign bit; the orthogonal id 4 may or may not
    // share a cell, but its cosine vs the trio is ~0 — below threshold
    // either way. No driver collect happens on this path (no k-means).
    val out = Similarity.semDedup(pts, "vec_id", "v",
      nClusters = 16, threshold = 0.9, portableDim = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(out(1L) == (1L, false))
    assert(out(2L) == (1L, true))
    assert(out(3L) == (1L, true))
    assert(out(4L) == (4L, false))
    assert(out(5L) == (5L, false))
  }

  test("portableLshSignature: NULL and shorter-than-dim vectors get a " +
    "NULL bucket (never alias into bucket 0); bits=0 is the one-bucket fold") {
    val df = Seq(
      (1L, Option(Array(1.0, 2.0, 3.0))),
      (2L, Option(Array(1.0, 2.0))), // too short for dim=3
      (3L, Option.empty[Array[Double]])).toDF("id", "v")
    val out = df.select($"id",
      Similarity.portableLshSignature($"v", bits = 4, dim = 3).as("b"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(out(1L).isDefined)
    assert(out(2L).isEmpty && out(3L).isEmpty)
    val one = df.where($"id" === 1L).select(
      Similarity.portableLshSignature($"v", bits = 0, dim = 3)).head().getLong(0)
    assert(one == 0L) // nClusters = 1 -> constant cell, no empty-reduce crash
  }

  test("semDedup portable mode rejects a non-power-of-two cell count") {
    val pts = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "v")
    intercept[IllegalArgumentException] {
      Similarity.semDedup(pts, "vec_id", "v",
        nClusters = 12, threshold = 0.5, portableDim = 2)
    }
  }

  test("multiProbeLshTopK: each probe step lifts recall monotonically; floor holds") {
    val corpus = (1L to 200L).map(i =>
      (i, Array.tabulate(16)(d => math.cos(i * 0.05 + d * 0.4).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = corpus.where($"vec_id" % 20 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(
      Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5))
    def recall(p: Int): Double = {
      val got = pairs(Similarity.multiProbeLshTopK(corpus, queries,
        "vec_id", "embedding", bits = 6, probes = p, k = 5, portableDim = 16))
      (got intersect truth).size.toDouble / truth.size
    }
    val r = Seq(0, 2, 4, 6).map(recall)
    // candidates grow as supersets probe-by-probe, and anything that
    // displaces a true top-5 member from the window is itself true
    // top-5 — recall is provably monotone in probes
    assert(r.sliding(2).forall { case Seq(a, b) => b >= a })
    assert(r.last > r.head,
      s"probing must add recall on this fixture: $r")
    assert(r.last >= 0.8, s"multi-probe recall@5 floor: $r")
  }

  test("portableLshProbes: home bucket first, then distinct single-bit flips") {
    val df = Seq((1L, Array.tabulate(16)(d => math.sin(d * 0.7)))).toDF("id", "v")
    val row = df.select(
      Similarity.portableLshSignature($"v", 6, 16).as("home"),
      graft.expressions.VectorExprs.portableLshProbes($"v", 6, 16, 4).as("pr"))
      .head()
    val home = row.getLong(0)
    val pr = row.getSeq[Long](1)
    assert(pr.length == 5 && pr.head == home)
    assert(pr.distinct.length == 5)
    pr.tail.foreach(b =>
      assert(java.lang.Long.bitCount(b ^ home) == 1, s"$b vs $home"))
  }

  test("lshTopK returns only true-cosine values for pairs it finds") {
    val out = Similarity.lshTopK(vecs, "vec_id", "embedding", bits = 2, k = 3)
    val brute = Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", 3)
      .select($"query_id", $"neighbor_id", $"sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.select($"query_id", $"neighbor_id", $"sim").collect().foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(brute.contains(k) || r.getDouble(2) <= brute.values.max)
      brute.get(k).foreach(v => assert(math.abs(v - r.getDouble(2)) < 1e-12))
    }
  }

  test("pqTopK: ADC ranking recovers brute-force neighbors (recall floor)") {
    // unit-norm corpus on a smooth curve — the PQ contract (ADC sums
    // approximate cosine exactly when inputs are unit-norm)
    val corpus = (1L to 200L).map { i =>
      val raw = Array.tabulate(16)(d => math.cos(i * 0.05 + d * 0.4))
      val n = math.sqrt(raw.map(x => x * x).sum)
      (i, raw.map(x => (x / n).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.where($"vec_id" % 20 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5))
    val pq = Similarity.pqTopK(corpus, queries, "vec_id", "embedding",
      m = 4, ksub = 16, k = 5, rerank = 20)
    // structural contract: exactly k rows per query, self excluded
    val perQuery = pq.groupBy($"query_id").count()
      .select($"count").as[Long].collect().toSet
    assert(perQuery == Set(5L))
    assert(pq.where($"query_id" === $"neighbor_id").count() == 0)
    val recall = (pairs(pq) intersect truth).size.toDouble / truth.size
    // raw ADC measures 0.4 here (quantization blurs near-identical
    // curve points); the exact-rerank stage is what makes PQ usable —
    // deterministic seed + Lloyd → stable measured value pins the bar
    assert(recall >= 0.9, s"PQ+rerank recall@5 = $recall")
  }

  test("pqTopK ADC score equals the exact codebook dot product") {
    // corpus whose subvectors take few distinct values → with ksub
    // large enough every subvector IS its own codeword after Lloyd, so
    // ADC must reproduce exact cosine (unit-norm inputs) to float
    // precision
    val corpus = (1L to 24L).map { i =>
      val raw = Array.tabulate(8)(d => if ((i + d) % 4 == 0) 1.0 else 0.5)
      val n = math.sqrt(raw.map(x => x * x).sum)
      (i, raw.map(x => (x / n).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.where($"vec_id" === 1)
    val pq = Similarity.pqTopK(corpus, queries, "vec_id", "embedding",
      m = 4, ksub = 8, k = 3, kmeansIters = 6)
    val brute = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 3)
      .select($"neighbor_id".as[Long], $"sim".as[Double]).collect().toMap
    pq.select($"neighbor_id".as[Long], $"sim".as[Double]).collect().foreach {
      case (id, adc) =>
        brute.get(id).foreach(exact => assert(math.abs(adc - exact) < 1e-3,
          s"ADC $adc vs exact $exact for $id"))
    }
  }
  test("ivfPqTopK: composed IVF+PQ with rerank meets the brute-force recall floor") {
    // same unit-norm curve fixture as the PQ recall test
    val corpus = (1L to 200L).map { i =>
      val raw = Array.tabulate(16)(d => math.cos(i * 0.05 + d * 0.4))
      val n = math.sqrt(raw.map(x => x * x).sum)
      (i, raw.map(x => (x / n).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.where($"vec_id" % 20 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5))
    val ivfpq = Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
      nCentroids = 8, nProbe = 4, m = 4, ksub = 16, k = 5, rerank = 20)
    // structural contract: exactly k rows per query, self excluded
    val perQuery = ivfpq.groupBy($"query_id").count()
      .select($"count").as[Long].collect().toSet
    assert(perQuery == Set(5L))
    assert(ivfpq.where($"query_id" === $"neighbor_id").count() == 0)
    val recall = (pairs(ivfpq) intersect truth).size.toDouble / truth.size
    // SAME probe budget as the IVF recall test (nProbe/nCentroids = 1/2
    // of cells here) — deterministic seeds make the measured value
    // stable; the floor is the bar the composed path must hold
    assert(recall >= 0.9, s"IVF+PQ recall@5 = $recall")
    // exhaustive probe + full-corpus rerank must equal brute force
    val exhaustive = Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
      nCentroids = 8, nProbe = 8, m = 4, ksub = 16, k = 5, rerank = 199)
    assert(rows(exhaustive.select($"query_id", $"rank", $"neighbor_id")) ==
      rows(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
        .select($"query_id", $"rank", $"neighbor_id")))
  }

  test("ivfPqTopK plan: corpus never shuffles — probe and LUT joins broadcast") {
    val corpus = (1L to 100L).map { i =>
      val raw = Array.tabulate(8)(d => math.cos(i * 0.05 + d * 0.4))
      val n = math.sqrt(raw.map(x => x * x).sum)
      (i, raw.map(x => (x / n).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.ivfPqTopK(corpus, corpus.where($"vec_id" <= 3),
      "vec_id", "embedding", nCentroids = 4, nProbe = 2,
      m = 4, ksub = 8, k = 3)
    val planStr = out.queryExecution.executedPlan.toString
    // every join against the code table rides a broadcast — a sort-merge
    // join would mean the corpus side shuffled for probing
    assert(!planStr.contains("SortMergeJoin"), planStr)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = out.queryExecution.optimizedPlan
    assert(plan.collect { case w: LWindow => w }.size == 1, plan)
  }

  test("knnClassify: majority of k nearest labeled neighbors, ties to " +
    "smaller label, unlabeled corpus rows ignored") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0, 0.0), null.asInstanceOf[java.lang.Integer]), // query
      (2L, Array(0.99, 0.1), Integer.valueOf(7)),
      (3L, Array(0.98, 0.2), Integer.valueOf(7)),
      (4L, Array(0.97, 0.3), Integer.valueOf(8)),
      (5L, Array(0.0, 1.0), Integer.valueOf(9)),   // far away
      (6L, Array(1.0, 0.01), null.asInstanceOf[java.lang.Integer])) // unlabeled: excluded
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(df, df.where($"vec_id" === 1L),
      "vec_id", "embedding", "label", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 7, 2L))) // neighbors 2,3 (7) beat 4 (8)
  }
}

