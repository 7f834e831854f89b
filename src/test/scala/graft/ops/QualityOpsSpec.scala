package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 quality operators: Gopher rule battery, bigram LM scoring,
  * winnowing fingerprints, int8 quantization, BPE pair counting.
  */
class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("gopherRules: exact integer metrics on a known doc") {
    val df = Seq((1L, "the cat sat on a mat!")).toDF("doc_id", "text")
    val r = QualityRules.gopherRules(df, "text", "doc_id").head()
    assert(r.getAs[Long]("n_words") == 6)
    // the(3) cat(3) sat(3) on(2) a(1) mat!(4) = 16 chars
    assert(r.getAs[Long]("n_word_chars") == 16)
    assert(r.getAs[Long]("mean_word_len_ppm") == 16L * 1000000 / 6)
    // stopwords: the, on? ("on" not in default list) → the, a = 2 of 6
    assert(r.getAs[Long]("stopword_ppm") == 2L * 1000000 / 6)
    assert(r.getAs[Long]("alpha_word_ppm") == 1000000L) // all contain a letter
    // text len 21, symbols: '!' → 1
    assert(r.getAs[Long]("symbol_ppm") == 1000000L / 21)
    assert(!r.getAs[Boolean]("pass_words")) // 6 < 50
    assert(!r.getAs[Boolean]("pass_all"))
  }

  test("gopherRules: thresholds split the synthetic corpus non-vacuously") {
    val docs = (0 until 100).map { i =>
      val n = 20 + i // word counts 20..119 straddle the min-50 rule
      (i.toLong, (Seq.fill(n / 2)("the") ++ Seq.fill(n - n / 2)("word")).mkString(" "))
    }.toDF("doc_id", "text")
    val r = QualityRules.gopherRules(docs, "text", "doc_id")
    val passes = r.where(col("pass_all")).count()
    assert(passes > 0 && passes < 100, s"passes=$passes should be strictly between")
  }

  test("bigramScore: hand-computed add-one ppm on a 2-doc corpus") {
    // corpus: "a b a" and "a b" → bigrams: (a,b)x2, (b,a)x1
    // c1: a→2, b→1; vocab {a,b} V=2
    val df = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val r = NgramLm.bigramScore(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    val pAB = (2L + 1) * 1000000 / (2 + 2) // 750000
    val pBA = (1L + 1) * 1000000 / (1 + 2) // 666666
    assert(r(0).getAs[Long]("n_bigrams") == 2)
    assert(r(0).getAs[Long]("lm_ppm") == (pAB + pBA) / 2)
    assert(r(1).getAs[Long]("n_bigrams") == 1)
    assert(r(1).getAs[Long]("lm_ppm") == pAB)
  }

  test("bigramScore: single-token doc gets NULL score, zero bigrams") {
    val df = Seq((1L, "lonely"), (2L, "two words")).toDF("doc_id", "text")
    val r = NgramLm.bigramScore(df, "text", "doc_id").orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_bigrams") == 0 && r(0).isNullAt(2))
    assert(r(1).getAs[Long]("n_bigrams") == 1)
  }

  test("backoffScore: every backoff level hand-computed on a known split") {
    // trainMod=2 → train = even ids. Train doc 2: "a b c a b c":
    // N=6; c1 a=2 b=2 c=2; c2 (a,b)=2 (b,c)=2 (c,a)=1;
    // c3 (a,b,c)=2 (b,c,a)=1 (c,a,b)=1.
    val df = Seq(
      (2L, "a b c a b c"), // train
      (1L, "a b c"),       // hit3: p = c3(a,b,c)*1e6/c2(a,b) = 1_000_000
      (3L, "a b x"),       // full miss: unseen unigram x → 0
      (5L, "x b c"),       // hit2: p = 0.4 * c2(b,c)*1e6/c1(b) = 400_000
      (7L, "x y c"),       // hit1: p = 0.16 * c1(c)*1e6/N (floored stages)
      (9L, "ab")           // < 3 tokens → nothing to score
    ).toDF("doc_id", "text")
    val r = NgramLm.backoffScore(df, "text", "doc_id", trainMod = 2)
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L, 7L, 9L))
    def row(i: Int) = (r(i).getAs[Long]("n_trigrams"),
      r(i).getAs[Long]("n_hit3"), r(i).getAs[Long]("n_hit2"),
      r(i).getAs[Long]("n_hit1"))
    assert(row(0) == ((1L, 1L, 0L, 0L)))
    assert(r(0).getAs[Long]("score_ppm") == 1000000L)
    assert(row(1) == ((1L, 0L, 0L, 0L)))
    assert(r(1).getAs[Long]("score_ppm") == 0L)
    assert(row(2) == ((1L, 0L, 1L, 0L)))
    assert(r(2).getAs[Long]("score_ppm") == 400000L)
    // p1 = 2*1e6/6 = 333333; p2 = 2*333333/5 = 133333; p3 = 2*133333/5
    assert(row(3) == ((1L, 0L, 0L, 1L)))
    assert(r(3).getAs[Long]("score_ppm") == 53333L)
    assert(row(4) == ((0L, 0L, 0L, 0L)))
    assert(r(4).isNullAt(r(4).fieldIndex("score_ppm")))
  }

  test("backoffScore: train docs are excluded from the scored output") {
    val df = Seq((0L, "a b c"), (1L, "a b c")).toDF("doc_id", "text")
    val r = NgramLm.backoffScore(df, "text", "doc_id", trainMod = 2)
    assert(r.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("winnowing guarantee: shared substring >= k+w-1 chars -> shared fingerprint") {
    val shared = "zqxjkvbwpfmghydclrtnzqxjkvbwpf" // 30 chars >= 8+4-1
    val df = Seq(
      (1L, s"aaaa bbbb $shared cccc dddd"),
      (2L, s"eeee ffff gggg $shared hhhh"),
      (3L, "totally different content with no overlap at all")
    ).toDF("doc_id", "text")
    val r = Winnow.fingerprints(df, "text", "doc_id", k = 8, w = 4)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_shared_fp") >= 1, "doc 1 must share with doc 2")
    assert(r(1).getAs[Long]("n_shared_fp") >= 1)
    assert(r(2).getAs[Long]("n_shared_fp") == 0)
  }

  test("winnowing: doc shorter than k has zero grams/fingerprints; short doc selects global min") {
    val df = Seq((1L, "short"), (2L, "exactly9!")).toDF("doc_id", "text")
    val r = Winnow.fingerprints(df, "text", "doc_id", k = 8, w = 4)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_grams") == 0 && r(0).getAs[Long]("n_fp") == 0)
    // 9 chars → 2 positions < w: degenerate single window → 1 fingerprint
    assert(r(1).getAs[Long]("n_grams") == 2 && r(1).getAs[Long]("n_fp") == 1)
  }

  test("quantizeInt8Stats: hand vector, zero vector, saturation") {
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 4.0f)),   // scale 127/4 → q = 32, -64, 127
      (2L, Seq(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = VectorOps.quantizeInt8Stats(df, "embedding", "vec_id")
      .orderBy("vec_id").collect()
    assert(r(0).getAs[Long]("n_dims") == 3)
    assert(r(0).getAs[Long]("qsum") == 32 - 64 + 127)
    assert(r(0).getAs[Long]("qmin") == -64 && r(0).getAs[Long]("qmax") == 127)
    assert(r(0).getAs[Long]("n_sat") == 1)
    assert(r(1).getAs[Long]("qsum") == 0 && r(1).getAs[Long]("n_sat") == 0)
  }

  test("containmentPairs: catches a near-subset that Jaccard misses") {
    val long = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 4
    val short = "alpha bravo charlie delta echo"
    val df = Seq((1L, long.trim), (2L, short),
      (3L, "zulu yankee xray whiskey victor uniform tango sierra"))
      .toDF("doc_id", "text")
    val r = Dedup.containmentPairs(df, "text", "doc_id",
      shingleN = 3, thresholdPpm = 900000L).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 1L && r(0).getLong(1) == 2L)
    assert(r(0).getAs[Long]("containment_ppm") == 1000000L) // full subset
    assert(r(0).getAs[Long]("jaccard_ppm") < 900000L) // jaccard would miss it
  }

  test("containmentPairs matches the quadratic definition on a random corpus") {
    val words = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val rnd = new scala.util.Random(7)
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(12))(words(rnd.nextInt(words.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val fast = Dedup.containmentPairs(docs, "text", "doc_id",
      shingleN = 3, thresholdPpm = 600000L)
    val sh = docs.select(col("doc_id"),
      TextAnalysis.charNgrams(col("text"), 3).as("s"))
    val brute = sh.as("a").crossJoin(sh.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        size(array_intersect(col("a.s"), col("b.s"))).cast("long").as("i"),
        size(col("a.s")).cast("long").as("la"), size(col("b.s")).cast("long").as("lb"))
      .where(col("la") > 0 && col("lb") > 0)
      .select(col("id_a"), col("id_b"),
        expr("i * 1000000 div least(la, lb)").as("containment_ppm"),
        expr("i * 1000000 div (la + lb - i)").as("jaccard_ppm"))
      .where(col("containment_ppm") >= 600000L)
    assert(rows(fast) == rows(brute))
  }

  test("incrementalDedup matches the quadratic definition on a random corpus") {
    // the containmentPairs quadratic cross-check, mirrored for the
    // batch-vs-store path: random texts from a tiny word pool produce
    // real near-dups AND near-misses, so the PPJoin positional filter's
    // pruning branch is exercised, not just hand-picked duplicates.
    // Batch ids 10..29 deliberately collide with store ids (the
    // documented id-collision contract).
    val words = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val rnd = new scala.util.Random(11)
    def corpus(n: Int, idOff: Long) = (0 until n).map { i =>
      ((i + idOff).toLong,
        Seq.fill(3 + rnd.nextInt(12))(words(rnd.nextInt(words.length)))
          .mkString(" "))
    }
    val storeRows = corpus(30, 0L)
    val store = storeRows.toDF("doc_id", "text")
    // half the batch: random (near-misses at t=0.6 over char 3-grams);
    // other half: store texts lightly mutated (one appended word) or
    // copied verbatim (the exact_dup leg) -- guaranteed near-dups
    val batch = (corpus(10, 10L) ++ storeRows.take(10).zipWithIndex.map {
      case ((sid, text), i) =>
        (20L + i, if (i % 3 == 0) text
                  else text + " " + words((sid % words.length).toInt))
    }).toDF("doc_id", "text")
    val fast = Dedup.incrementalDedup(batch, store, "text", "doc_id",
      shingleN = 3, threshold = 0.6)
    val shN = batch.select(col("doc_id").as("nid"),
      TextAnalysis.charNgrams(col("text"), 3).as("sn"))
    val shO = store.select(col("doc_id").as("oid"),
      TextAnalysis.charNgrams(col("text"), 3).as("so"))
    val pairs = shN.crossJoin(shO)
      .select(col("nid"), col("oid"),
        TextAnalysis.jaccard(col("sn"), col("so")).as("j"))
      .where(col("j") >= 0.6)
    val best = pairs.groupBy(col("nid"))
      .agg(max(struct(col("j"), (-col("oid")).as("no"))).as("b"))
      .select(col("nid").as("doc_id"), (-col("b.no")).as("best_old_id"),
        col("b.j").as("best_jaccard"))
    val brute = batch.select(col("doc_id"), md5(col("text")).as("k"))
      .join(store.select(md5(col("text")).as("k")).distinct()
        .withColumn("hit", lit(true)), Seq("k"), "left")
      .select(col("doc_id"), coalesce(col("hit"), lit(false)).as("exact_dup"))
      .join(best, Seq("doc_id"), "left")
    assert(rows(fast) == rows(brute))
    // the corpus must actually exercise both branches: some best
    // matches exist, some batch docs clear nothing
    val matched = fast.where(col("best_old_id").isNotNull).count()
    assert(matched > 0, "random corpus produced no near-dups - weaken nothing, reseed")
    assert(matched < 20, "every batch doc matched - the pruning branch never ran")
  }

  test("jlProject: deterministic, exact on unit basis vectors, zero maps to zero") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r1 = VectorOps.jlProject(df, "embedding", "vec_id", k = 8)
    val r2 = VectorOps.jlProject(df, "embedding", "vec_id", k = 8)
    assert(rows(r1) == rows(r2)) // md5 matrix → rerun-identical
    val basis = r1.where(col("vec_id") === 1).head()
    (1 to 8).foreach(i => assert(math.abs(basis.getLong(i)) == 1000000L,
      s"proj_${i - 1} = ${basis.getLong(i)}"))
    val zero = r1.where(col("vec_id") === 2).head()
    (1 to 8).foreach(i => assert(zero.getLong(i) == 0L))
  }

  test("aggState merge invariant: merge(state(A), state(B)) == state(A union B), nulls included") {
    val a = Seq(("x", Some(1.25)), ("x", None), ("y", Some(-3.5)))
      .toDF("k", "v").select(col("k"), col("v").as("v"))
    val b = Seq(("x", Some(2.75)), ("z", None), ("z", None))
      .toDF("k", "v").select(col("k"), col("v").as("v"))
    val merged = Aggs.finishAggState(
      Aggs.mergeAggState(Aggs.aggState(a, Seq("k"), "v"),
        Aggs.aggState(b, Seq("k"), "v"), Seq("k")), Seq("k"))
    val direct = Aggs.finishAggState(
      Aggs.aggState(a.unionByName(b), Seq("k"), "v"), Seq("k"))
    assert(rows(merged) == rows(direct))
    // all-null group carries null sum/avg/min/max but the right count
    val z = merged.where(col("k") === "z").head()
    assert(z.getAs[Long]("cnt") == 2 && z.isNullAt(2) && z.isNullAt(3))
  }

  test("pcaFit recovers a rank-2 subspace; projections match eigenvalues") {
    val d = 8
    val u = Array(1.0, 1, 1, 1, 0, 0, 0, 0).map(_ / 2.0)
    val w = Array(0.0, 0, 0, 0, 1, 1, 1, 1).map(_ / 2.0)
    val rnd = new scala.util.Random(11)
    val data = (0 until 300).map { i =>
      val (a, b) = (rnd.nextGaussian() * 3.0, rnd.nextGaussian())
      (i.toLong, (0 until d).map(j => (a * u(j) + b * w(j)).toFloat))
    }.toDF("vec_id", "embedding")
    val m = VectorOps.pcaFit(data, "embedding", k = 3, iters = 200)
    assert(m.n == 300)
    assert(m.eigenvalues(0) >= m.eigenvalues(1))
    assert(m.eigenvalues(2) < 1e-9, s"rank-2 data: lambda3 = ${m.eigenvalues(2)}")
    val dot01 = m.components(0).zip(m.components(1)).map { case (x, y) => x * y }.sum
    assert(math.abs(dot01) < 1e-6, s"components not orthogonal: $dot01")
    // projection variance onto pc_0 equals lambda1
    val proj = VectorOps.pcaProject(data, "embedding", "vec_id", m)
    val v = proj.agg(var_pop(col("pc_0"))).head().getDouble(0)
    assert(math.abs(v - m.eigenvalues(0)) < 1e-6 * math.max(1.0, m.eigenvalues(0)),
      s"var(pc_0)=$v vs lambda1=${m.eigenvalues(0)}")
    // deterministic: refit identical
    val m2 = VectorOps.pcaFit(data, "embedding", k = 3, iters = 200)
    assert(m.components(0).toSeq == m2.components(0).toSeq)
  }

  test("bpeTrain: hand-computed merges, greedy left-to-right semantics") {
    // words: aaab (wc 2), ab (wc 1)
    // r1 pairs: (a,a)=4, (a,b)=3 -> merge (a,a); GREEDY: aaab -> [aa,a,b]
    // r2 pairs: (aa,a)=2, (a,b)=3 -> merge (a,b); aaab -> [aa,ab], ab -> [ab]
    // r3 pairs: (aa,ab)=2 -> merge; aaab -> [aaab]
    val df = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val (merges, fin) = NgramLm.bpeTrain(df, "text", rounds = 3)
    assert(merges == Seq(
      NgramLm.BpeMerge(1, "a", "a", 4L),
      NgramLm.BpeMerge(2, "a", "b", 3L),
      NgramLm.BpeMerge(3, "aa", "ab", 2L)))
    val toks = fin.select(col("__wc"), col("__toks")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toSet
    assert(toks == Set((2L, List("aaab")), (1L, List("ab"))))
  }

  test("bpeTrain batched: valid merges with exact counts, far fewer jobs") {
    // 8 disjoint two-letter words with distinct frequencies: all 8 merges
    // are selectable from ONE pair-count snapshot
    val ws = Seq("ab" -> 9, "cd" -> 8, "ef" -> 7, "gh" -> 6,
      "ij" -> 5, "kl" -> 4, "mn" -> 3, "op" -> 2)
    val text = ws.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")

    def countJobs(tag: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(tag, tag)
      try body finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(tag).length
    }

    var seq: Seq[NgramLm.BpeMerge] = null
    var bat: Seq[NgramLm.BpeMerge] = null
    val seqJobs = countJobs("bpe-seq") {
      seq = NgramLm.bpeTrain(df, "text", rounds = 8)._1 }
    val batJobs = countJobs("bpe-bat") {
      bat = NgramLm.bpeTrain(df, "text", rounds = 8, batch = 8)._1 }
    // disjoint pairs -> the snapshot selection IS the greedy sequence
    assert(bat == seq)
    assert(bat.map(m => (m.x + m.y, m.cnt)) ==
      ws.map { case (w, n) => (w, n.toLong) })
    // 8 rounds of (count+collect+checkpoint) collapse into 1
    assert(batJobs * 4 <= seqJobs, s"batched=$batJobs sequential=$seqJobs")

    // conflicting candidates are deferred, not mis-counted: (a,b) shares
    // a member with the round-1 winner (a,a), so batch=2 selects it in
    // round 2 with a RECOUNTED cnt — identical to the sequential list
    val df2 = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val (m1, _) = NgramLm.bpeTrain(df2, "text", rounds = 2)
    val (m2, fin2) = NgramLm.bpeTrain(df2, "text", rounds = 2, batch = 2)
    assert(m2 == m1)
    val toks2 = fin2.collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toSet
    assert(toks2 == Set((2L, List("aa", "ab")), (1L, List("ab"))))
  }

  test("bpeTopTokens: vocabulary after training is the merged tokens") {
    val df = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val r = NgramLm.bpeTopTokens(df, "text", rounds = 3, topK = 10)
      .orderBy("rank").collect()
    assert(r.map(x => (x.getString(0), x.getAs[Long]("cnt"))).toSeq ==
      Seq(("aaab", 2L), ("ab", 1L)))
  }

  test("bpeApply: frozen merges tokenize new text in document order") {
    val train = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val (merges, _) = NgramLm.bpeTrain(train, "text", rounds = 3)
    // new batch, unseen words: merges (a,a), (a,b), (aa,ab) apply greedily
    val batch = Seq((10L, "ab aaab ba"), (11L, "")).toDF("doc_id", "text")
    val r = NgramLm.bpeApply(batch, "text", "doc_id", merges)
      .orderBy("doc_id").collect()
    assert(r(0).getSeq[String](r(0).fieldIndex("tokens")) ==
      Seq("ab", "aaab", "b", "a")) // ba: no (b,a) merge learned
    assert(r(0).getAs[Long]("n_tokens") == 4)
    assert(r(1).getAs[Long]("n_tokens") == 0) // empty doc -> empty tokens
  }

  test("bpePairCounts: exact pair counts, deterministic order") {
    // "abab abc" → pairs: ab,ba,ab | ab,bc → ab:3, ba:1, bc:1
    val df = Seq((1L, "abab abc")).toDF("doc_id", "text")
    val r = NgramLm.bpePairCounts(df, "text", topK = 20)
      .orderBy("rank").collect()
    assert(r(0).getString(0) == "ab" && r(0).getAs[Long]("cnt") == 3)
    assert(r(1).getString(0) == "ba" && r(1).getAs[Long]("cnt") == 1) // tie: asc
    assert(r(2).getString(0) == "bc" && r(2).getAs[Long]("cnt") == 1)
    assert(r.length == 3)
  }

  test("collocations: hand-computed lift, minCount guard, top-k order") {
    import spark.implicits._
    // bigrams: (a b) ×3, (b a) ×2, (b c) ×1, (c a) ×1
    // doc: "a b a b c a b" → pairs ab, ba, ab, bc, ca, ab
    val df = Seq((1L, "a b a b c a b"), (2L, "b a")).toDF("doc_id", "text")
    // N = 7 total pairs; marginals from the pair table:
    // c1(a)=3, c1(b)=3(ba×2,bc×1), c1(c)=1; c2(b)=3, c2(a)=3, c2(c)=1
    val got = NgramLm.collocations(df, "text", minCount = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // lift(ab) = 3·7·1e6 div (3·3) = 2333333; lift(ba) = 2·7·1e6 div (3·3)
    assert(got(("a", "b")) == ((3L, 2333333L)))
    assert(got(("b", "a")) == ((2L, 1555555L)))
    assert(got.size == 2) // bc, ca fall under minCount
  }

  test("copyClusters: copy chain collapses to one root, strangers stay singletons") {
    val core = "zqxjkvbwpfmghydclrtnzqxjkvbwpfaaabbbcccdddeee"
    val df = Seq(
      (10L, s"original $core tail one"),
      (11L, s"original $core tail two"),        // near-copy of 10
      (12L, s"prefix pasted $core"),            // shares the core chunk
      (20L, "completely unrelated text with its own words here"),
      (21L, "short")                            // too short to fingerprint
    ).toDF("doc_id", "text")
    val r = Winnow.copyClusters(df, "text", "doc_id",
        k = 8, w = 4, minSharePpm = 300000L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(10L) == 10L && r(11L) == 10L && r(12L) == 10L,
      s"copy chain must share root 10: $r")
    assert(r(20L) == 20L && r(21L) == 21L)
  }

  test("copyClusters: stop-fingerprint cap prunes boilerplate-only links") {
    // every doc shares ONE boilerplate sentence; with the cap below the
    // corpus size those fingerprints are dropped and nothing links
    val boiler = "standard footer text appears everywhere verbatim"
    val df = (1L to 6L).map(i => (i, s"doc $i unique-$i-content $boiler"))
      .toDF("doc_id", "text")
    val r = Winnow.copyClusters(df, "text", "doc_id",
        k = 8, w = 4, minSharePpm = 100000L, maxPostings = 3L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.forall { case (id, root) => id == root },
      s"boilerplate must not link docs under the postings cap: $r")
  }
  test("blocklistHits: token-aligned, never substrings, counts per phrase") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the assembly line"), // must NOT match banned "ass"
      (2L, "bad ass phrase bad ass"), // 2 hits of one phrase
      (3L, "totally clean text"),
      (4L, "Bad  Ass plus more bad content here")) // case+spacing, 2 phrases
      .toDF("doc_id", "text")
    val out = QualityRules.blocklistHits(docs, "text", "doc_id",
      Seq("bad ass", "ass", "bad content here"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!out.contains(1L) && !out.contains(3L))
    assert(out(2L) == (4L, 2L)) // "bad ass" x2 + "ass" x2
    assert(out(4L) == (3L, 3L)) // "bad ass", "ass", "bad content here"
    // a blank phrase would join against tokens of blank documents
    intercept[IllegalArgumentException] {
      QualityRules.blocklistHits(docs, "text", "doc_id", Seq("bad ass", "  "))
    }
  }
}
