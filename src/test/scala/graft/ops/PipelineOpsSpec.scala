package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber equals the single-window row_number") {
    val df = (1L to 97L).map(i => (i, s"k${(i * 37) % 100}")).toDF("id", "key")
    val got = Windows.globalRowNumber(df, Seq($"key", $"id"), "pos", partitions = 5)
    val want = df.withColumn("pos",
      row_number().over(Window.orderBy($"key", $"id")).cast("long"))
    assert(rows(got.select($"id", $"pos")) == rows(want.select($"id", $"pos")))
  }

  test("profile counts rows/nulls/distincts/min/max per column in one pass") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (2L, null), (2L, "a"), (null, "a"), (3L, "c"))
      .toDF("num", "str")
    val got = Profiling.profile(df, Seq("num", "str"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("num") == ((5L, 1L, 3L, "1", "3")))
    assert(got("str") == ((5L, 1L, 3L, "a", "c")))
  }

  test("pageRank matches a driver-side integer simulation") {
    // star: a<->b, a<->c (a has outdeg 2; b, c feed a)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
      .toDF("src", "dst")
    val scale = 1000000000000L
    // independent reference: same integer recurrence, plain Scala
    def simulate(iters: Int): Map[String, Long] = {
      val out = Map("a" -> 2L, "b" -> 1L, "c" -> 1L)
      val es = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
      var r = Map("a" -> scale, "b" -> scale, "c" -> scale)
      (1 to iters).foreach { _ =>
        val in = es.groupBy(_._2).map { case (dst, g) =>
          dst -> g.map { case (src, _) => r(src) / out(src) }.sum
        }
        r = r.keys.map(n => n -> (15L * scale + 85L * in.getOrElse(n, 0L)) / 100L).toMap
      }
      r
    }
    val got = Graph.pageRank(edges, "src", "dst", iterations = 3, scale = scale)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == simulate(3))
    // cycle invariant: on a→b→c→a every rank stays exactly at scale
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val cyc = Graph.pageRank(cycle, "src", "dst", iterations = 2, scale = scale)
      .collect().map(_.getLong(1)).toSet
    assert(cyc == Set(scale))
  }

  test("pageRank tolScaled exits early and lands within the geometric tail " +
    "of the converged fixed point") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
      .toDF("src", "dst")
    val scale = 1000000000000L
    // exact integer fixed point from the driver-side simulation (the
    // recurrence oscillates with period 2 on this bipartite-ish star
    // and contracts ~0.7225 per 2 rounds; iterate until it stops moving)
    val out = Map("a" -> 2L, "b" -> 1L, "c" -> 1L)
    val es = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
    var sim = Map("a" -> scale, "b" -> scale, "c" -> scale)
    var moved = true
    while (moved) {
      val in = es.groupBy(_._2).map { case (dst, g) =>
        dst -> g.map { case (src, _) => sim(src) / out(src) }.sum
      }
      val next = sim.keys.map(n =>
        n -> (15L * scale + 85L * in.getOrElse(n, 0L)) / 100L).toMap
      moved = next != sim
      sim = next
    }
    // 200 nominal iterations under a tolerance: the early exit fires
    // once a 4-round window moves no node more than tol, at which point
    // the remaining drift to the fixed point is a geometric tail of the
    // same magnitude — so the result must land within a few tol of the
    // simulated fixed point (and 200 un-exited rounds would take ~50
    // checkpoint barriers, which this test's runtime would show)
    val tol = 1000000L
    val got = Graph.pageRank(edges, "src", "dst", iterations = 200,
      scale = scale, tolScaled = tol)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (n, r) =>
      assert(math.abs(r - sim(n)) <= 10 * tol, s"$n: $r vs fixpoint ${sim(n)}")
    }
    // tolScaled = 0 stays the exact fixed-count recurrence (oracle path)
    val exact = Graph.pageRank(edges, "src", "dst", iterations = 3, scale = scale,
      tolScaled = 0L).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactRef = Graph.pageRank(edges, "src", "dst", iterations = 3, scale = scale)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact == exactRef)
  }

  test("connectedComponents matches a union-find reference (chains, " +
    "cliques, long path)") {
    // deterministic mixed graph: a 3-clique, scattered mod-edges, and a
    // LONG path (forces the pointer-doubling acceleration to matter)
    val es = Seq((0L, 1L), (1L, 2L), (2L, 0L)) ++          // clique
      (10L to 45L).map(i => (i, i + 1L)) ++                 // 36-node path
      Seq((100L, 107L), (107L, 114L), (200L, 300L))         // sparse pairs
    val got = Graph.connectedComponents(es.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val want = nodes.map { n =>
      val root = find(n)
      // canonical label: min node id in the component
      n -> nodes.filter(m => find(m) == root).min
    }.toMap
    assert(got == want)
    // the 36-node path must fully collapse within the doubling bound
    assert((10L to 46L).forall(got(_) == 10L))
  }

  test("mixtureSchedule: prefix proportionality of the stride interleave") {
    // srcA 60 docs, srcB 30, srcC 10 → any reasonable prefix holds
    // roughly 60/30/10% of each source
    val df = ((1 to 60).map(i => (i.toLong, "srcA")) ++
      (61 to 90).map(i => (i.toLong, "srcB")) ++
      (91 to 100).map(i => (i.toLong, "srcC")))
      .toDF("doc_id", "source")
    val sched = Sampling.mixtureSchedule(df, $"source", $"doc_id")
      .orderBy($"pos").collect().map(_.getString(1))
    assert(sched.length == 100)
    // positions are a permutation; check the half-way prefix mix
    val half = sched.take(50)
    assert(math.abs(half.count(_ == "srcA") - 30) <= 2,
      s"srcA in prefix: ${half.count(_ == "srcA")}")
    assert(math.abs(half.count(_ == "srcB") - 15) <= 2)
    assert(math.abs(half.count(_ == "srcC") - 5) <= 2)
    // deterministic: same input → same order
    val again = Sampling.mixtureSchedule(df, $"source", $"doc_id")
      .orderBy($"pos").collect().map(_.getString(1))
    assert(sched.toSeq == again.toSeq)
  }

  test("tokenBudgetFill: whole-source tiers, deterministic boundary prefix") {
    // srcA: 2 docs × 100 (prio 100), srcB: 4 docs × 50 (prio 50),
    // srcC: 2 docs × 100 (prio 100; tie broken A before B? no — by
    // priority desc then source asc: A(100), C(100), B(50)).
    // total = 600, budget 70% = 420 → A(200) full, C(200) full (cum 400),
    // B partial with rem 20 → exactly 0 docs of weight 50 fit.
    val df = Seq(
      (1L, "srcA", 100L), (2L, "srcA", 100L),
      (3L, "srcB", 50L), (4L, "srcB", 50L), (5L, "srcB", 50L), (6L, "srcB", 50L),
      (7L, "srcC", 100L), (8L, "srcC", 100L))
      .toDF("doc_id", "source", "n_chars")
    val got = Sampling.tokenBudgetFill(df, $"source", $"n_chars", $"doc_id",
      budgetPermille = 700, priority = expr("sum(n_chars) div count(1)"))
      .collect().map(r => r.getLong(0) -> ((r.getString(3), r.getBoolean(4)))).toMap
    assert(got(1L) == (("full", true)) && got(2L) == (("full", true)))
    assert(got(7L) == (("full", true)) && got(8L) == (("full", true)))
    assert(Seq(3L, 4L, 5L, 6L).forall(got(_)._1 == "partial"))
    assert(Seq(3L, 4L, 5L, 6L).forall(!got(_)._2)) // rem 20 < any doc
    // larger budget: 80% = 480 → rem 80 admits exactly one 50-char doc
    val got2 = Sampling.tokenBudgetFill(df, $"source", $"n_chars", $"doc_id",
      budgetPermille = 800, priority = expr("sum(n_chars) div count(1)"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(Seq(3L, 4L, 5L, 6L).count(got2) == 1)
  }

  test("epochMix: integer epochs replicate exactly, fractional epochs " +
    "match the driver-replayed draw, 0.x acts as downsample") {
    val df = (1L to 400L).map(i =>
      (i, if (i <= 100) "a" else if (i <= 200) "b"
          else if (i <= 300) "c" else "d")).toDF("doc_id", "dom")
    val out = Sampling.epochMix(df, $"doc_id", $"dom",
      epochsPpm = Map("a" -> 3000000L, "b" -> 2500000L, "c" -> 500000L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDom = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDom("a") == 300) // exactly 3 epochs
    assert(byDom("d") == 100) // default: exactly 1 epoch
    // replay the draw on the driver: thr(frac) = floor(frac_ppm*2^48/1e6)
    def extra(id: Long, fracPpm: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"mix:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) <
        ((BigInt(fracPpm) << 48) / 1000000L).toLong
    }
    val expB = (101L to 200L).map(i => 2 + (if (extra(i, 500000L)) 1 else 0)).sum
    val expC = (201L to 300L).count(i => extra(i, 500000L))
    assert(byDom("b") == expB)
    assert(byDom.getOrElse("c", 0) == expC)
    // epoch_copy is 1..copies per doc, dense
    val copies = out.filter(_._1 == 1L).map(_._3).sorted.toSeq
    assert(copies == Seq(1L, 2L, 3L))
  }

  test("vocabCoverage: exact ppm over a known distribution") {
    // 10 occurrences: "a"×5, "b"×3, "c"×2 → top-1 covers 500000 ppm,
    // top-2 800000, top-3 1000000
    val df = Seq((1L, "a a a b b"), (2L, "a a b c c")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(df, "text", Seq(1, 2, 3))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1) == ((5L, 10L, 500000L)))
    assert(got(2) == ((8L, 10L, 800000L)))
    assert(got(3) == ((10L, 10L, 1000000L)))
  }

  test("drift: exact ppm shares, PSI NULL on new/vanished buckets") {
    // old slice: 3×bucket0, 1×bucket1; new slice: 2×bucket0, 2×bucket2
    val df = Seq(
      (false, 0L), (false, 0L), (false, 0L), (false, 1L),
      (true, 0L), (true, 0L), (true, 2L), (true, 2L))
      .toDF("isnew", "bucket")
    val got = Profiling.drift(df, $"isnew", $"bucket")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) null else r.getDouble(6)))).toMap
    assert(got(0L)._1 == 3L && got(0L)._2 == 2L)
    assert(got(0L)._3 == 750000L && got(0L)._4 == 500000L && got(0L)._5 == 250000L)
    val psi0 = got(0L)._6.asInstanceOf[Double]
    assert(math.abs(psi0 - (0.5 - 0.75) * math.log(0.5 / 0.75)) < 1e-12)
    assert(got(1L)._6 == null) // vanished bucket
    assert(got(2L)._6 == null) // brand-new bucket
  }

  test("hardNegatives excludes self and same-label, ranks by cosine desc") {
    val df = Seq(
      (1L, Array(1.0, 0.0), 7),   // query, label 7
      (2L, Array(1.0, 0.01), 7),  // same label: must never appear
      (3L, Array(1.0, 0.1), 8),   // impostor, very close
      (4L, Array(0.0, 1.0), 8),   // impostor, orthogonal
      (5L, Array(1.0, 0.2), 9))   // impostor, close
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(df, df.where($"vec_id" === 1L),
      "vec_id", "embedding", "label", k = 3)
      .orderBy($"rank")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getInt(4)))
    assert(got.map(_._1).toSeq == Seq(3L, 5L, 4L)) // cosine desc
    assert(!got.map(_._1).contains(2L))
    assert(got.map(_._3).toSeq == Seq(1, 2, 3))
  }

  test("rollingDistinct equals the naive window definition on random activity") {
    val rnd = new scala.util.Random(7)
    // sparse keys with gaps longer and shorter than the window
    val rows7 = (1 to 400).map { _ =>
      (java.sql.Date.valueOf(f"2024-02-${1 + rnd.nextInt(28)}%02d"),
        (rnd.nextInt(25) + 1).toLong)
    }
    val df = rows7.toDF("d", "k")
    val got = Aggs.rollingDistinct(df, $"d", $"k", windowDays = 7)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // naive: for each grid day count distinct keys active in (d-7, d]
    val acts = rows7.distinct
    val days = acts.map(_._1.toLocalDate)
    val (lo, hi) = (days.min(Ordering.by((x: java.time.LocalDate) => x.toEpochDay)),
      days.max(Ordering.by((x: java.time.LocalDate) => x.toEpochDay)))
    var d = lo
    while (!d.isAfter(hi)) {
      val want = acts.filter { case (ad, _) =>
        val a = ad.toLocalDate
        !a.isAfter(d) && a.isAfter(d.minusDays(7))
      }.map(_._2).distinct.size.toLong
      assert(got(d.toString) == want, s"day $d")
      d = d.plusDays(1)
    }
  }

  test("rollingDistinct: zero-active grid days and exact window edges") {
    val df = Seq(
      (java.sql.Date.valueOf("2024-01-01"), 1L),
      (java.sql.Date.valueOf("2024-01-01"), 1L), // duplicate activity
      (java.sql.Date.valueOf("2024-01-20"), 1L)) // gap >> window
      .toDF("d", "k")
    val got = Aggs.rollingDistinct(df, $"d", $"k", windowDays = 3)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got("2024-01-01") == 1L)
    assert(got("2024-01-03") == 1L) // last day inside the 3-day window
    assert(got("2024-01-04") == 0L) // window passed, key inactive
    assert(got("2024-01-19") == 0L)
    assert(got("2024-01-20") == 1L)
    assert(got.size == 20) // full grid, min..max activity day
  }
}
