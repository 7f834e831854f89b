package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupTextSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different text about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog")  // exact dup of 1
  ).toDF("doc_id", "text")

  test("exactGroups keeps min id and counts dups") {
    val out = Dedup.exactGroups(docs, "text", "doc_id")
      .select($"keep_id", $"n_dups")
    assert(rows(out) == Seq(Seq(1L, 2L), Seq(2L, 1L), Seq(3L, 1L)))
  }

  test("exactDedup keeps one (min-id) row per text") {
    val out = Dedup.exactDedup(docs, "text", "doc_id")
    assert(rows(out.select($"doc_id")) == Seq(Seq(1L), Seq(2L), Seq(3L)))
  }

  test("minhashNearDups finds exact+near dup pairs, not unrelated ones") {
    val out = Dedup.minhashNearDups(docs, "text", "doc_id", shingleN = 3,
      numHashes = 32, bands = 16, threshold = 0.5)
    val pairs = out.select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // identical docs always collide
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near-dup caught
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L }) // no false pair
    val j14 = out.where($"id_a" === 1 && $"id_b" === 4).select($"jaccard")
      .as[Double].head()
    assert(j14 == 1.0)
  }

  test("minhashNearDups bucket cap drops degenerate buckets whole and " +
    "the audit leg enumerates them") {
    // four identical docs + one stranger: the identical docs share every
    // band, so every one of their buckets has size 4
    val boiler = Seq.tabulate(4)(i => (i.toLong, "same boilerplate text here")) :+
      (9L, "completely unrelated content xyz")
    val b = boiler.toDF("doc_id", "text")
    val capped = Dedup.minhashNearDups(b, "text", "doc_id", shingleN = 3,
      numHashes = 32, bands = 16, threshold = 0.5, maxBucketSize = 3L)
    assert(capped.count() == 0) // every shared bucket exceeded the cap
    val audit = Dedup.minhashDroppedBuckets(b, "text", "doc_id", shingleN = 3,
      numHashes = 32, bands = 16, maxBucketSize = 3L)
    assert(audit.count() == 16) // all 16 bands of the boilerplate cluster
    assert(audit.select(max($"n_rows")).as[Long].head() == 4L)
    // generous cap: bit-identical to uncapped
    val generous = Dedup.minhashNearDups(b, "text", "doc_id", shingleN = 3,
      numHashes = 32, bands = 16, threshold = 0.5, maxBucketSize = 100L)
    val uncapped = Dedup.minhashNearDups(b, "text", "doc_id", shingleN = 3,
      numHashes = 32, bands = 16, threshold = 0.5)
    assert(rows(generous.orderBy($"id_a", $"id_b")) ==
      rows(uncapped.orderBy($"id_a", $"id_b")))
  }

  test("minhashNearDups portable family: cap + audit behave identically " +
    "(string band keys) and the generous cap is bit-identical to uncapped") {
    val boiler = Seq.tabulate(4)(i => (i.toLong, "same boilerplate text here")) :+
      (9L, "completely unrelated content xyz")
    val b = boiler.toDF("doc_id", "text")
    val capped = Dedup.minhashNearDups(b, "text", "doc_id", shingleN = 3,
      numHashes = 32, bands = 16, threshold = 0.5, maxBucketSize = 3L,
      portable = true)
    assert(capped.count() == 0)
    val audit = Dedup.minhashDroppedBuckets(b, "text", "doc_id", shingleN = 3,
      numHashes = 32, bands = 16, maxBucketSize = 3L, portable = true)
    assert(audit.count() == 16) // identical docs share all 16 band keys
    assert(audit.select(max($"n_rows")).as[Long].head() == 4L)
    assert(audit.schema("band").dataType ==
      org.apache.spark.sql.types.StringType) // literal-value band keys
    val generous = Dedup.minhashNearDups(b, "text", "doc_id", shingleN = 3,
      numHashes = 32, bands = 16, threshold = 0.5, maxBucketSize = 100L,
      portable = true)
    val uncapped = Dedup.minhashNearDups(b, "text", "doc_id", shingleN = 3,
      numHashes = 32, bands = 16, threshold = 0.5, portable = true)
    assert(rows(generous.orderBy($"id_a", $"id_b")) ==
      rows(uncapped.orderBy($"id_a", $"id_b")))
    // the verified pair set agrees with the native family on this corpus
    val native = Dedup.minhashNearDups(b, "text", "doc_id", shingleN = 3,
      numHashes = 32, bands = 16, threshold = 0.5)
    assert(rows(uncapped.orderBy($"id_a", $"id_b")) ==
      rows(native.orderBy($"id_a", $"id_b")))
  }

  test("minhashDedup assigns min-id representative; unrelated docs keep themselves") {
    val out = Dedup.minhashDedup(docs, "text", "doc_id", shingleN = 3,
      numHashes = 32, bands = 16, threshold = 0.5)
    val m = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(m.size == 4) // one decision per doc
    assert(m(1L) == (1L, false)) // min id of its cluster: kept
    assert(m(4L) == (1L, true))  // exact dup of 1 → folded into 1
    assert(m(3L) == (3L, false)) // unrelated: kept
  }

  test("portable minhash: expression slots equal the hex-digest derivation; " +
      "portable decisions match the native mode's on this corpus") {
    // PortableMinHashSigExpr's byte math must equal what an external
    // engine derives from the md5 HEX digest: h1 = chars 1-12, h2 =
    // chars 13-24 | 1, slot k = (h1 + k*h2) & (2^48-1)
    val shingles = Seq("abc", "bcd", "éx1")
    def refSlot(k: Int): Long = shingles.map { sh =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(sh.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h1 = java.lang.Long.parseLong(hex.substring(0, 12), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(12, 24), 16) | 1L
      (h1 + k * h2) & 0xFFFFFFFFFFFFL
    }.min
    val sig = spark.range(1)
      .select(graft.expressions.MinHashExprs.portableMinhashSig(
        typedLit(shingles), 8).as("s"))
      .head().getSeq[Long](0)
    (0 until 8).foreach(k => assert(sig(k) == refSlot(k), s"slot $k"))
    // different family, same decisions here: clusters are far apart
    val nat = Dedup.minhashDedup(docs, "text", "doc_id", shingleN = 3,
      numHashes = 32, bands = 16, threshold = 0.5)
    val por = Dedup.minhashDedup(docs, "text", "doc_id", shingleN = 3,
      numHashes = 32, bands = 16, threshold = 0.5, portable = true)
    assert(rows(nat) == rows(por))
  }

  test("similarityJoinPrefix is EXACT: equals the quadratic all-pairs answer " +
    "on a mutated-template corpus") {
    val rnd = new scala.util.Random(37)
    val vocab = Vector.fill(30)((1 to 7).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val base = Vector.fill(25)(vocab(rnd.nextInt(vocab.size)))
    val corpus = (0L until 40L).map { i =>
      // 20 mutated copies of a template + 20 random docs
      val words =
        if (i < 20) base.map(w => if (rnd.nextInt(8) == 0) vocab(rnd.nextInt(vocab.size)) else w)
        else Vector.fill(25)(vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a", $"id_b", $"jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fast = pairSet(Dedup.similarityJoinPrefix(corpus, "text", "doc_id",
      shingleN = 4, threshold = 0.6))
    // quadratic ground truth via the existing verified-jaccard path
    val sh = corpus.select($"doc_id", TextAnalysis.charNgrams($"text", 4).as("sh"))
    val brute = pairSet(sh.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
      .crossJoin(sh.select($"doc_id".as("id_b"), $"sh".as("sh_b")))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b", TextAnalysis.jaccard($"sh_a", $"sh_b").as("jaccard"))
      .where($"jaccard" >= 0.6))
    assert(fast == brute, s"fast=${fast.size} brute=${brute.size}")
    assert(brute.nonEmpty) // the corpus actually exercises the join
  }

  test("similarityJoinPrefix saturation guard fails fast on a saturated " +
    "vocabulary with the documented remedy; posting cap completes with audit") {
    // 60 docs over a 3-letter alphabet: the 3-gram universe is ≤ 27
    // tokens, so every posting list is huge relative to the corpus —
    // the measured round-8 cliff shape in miniature
    val rnd = new scala.util.Random(11)
    val sat = (0L until 60L).map { i =>
      (i, (1 to 40).map(_ => "abc" (rnd.nextInt(3))).mkString)
    }.toDF("doc_id", "text")
    // guard armed at a unit-test-sized budget: the job dies BEFORE the
    // candidate self-join with the remedy in the message
    val ex = intercept[Exception] {
      Dedup.similarityJoinPrefix(sat, "text", "doc_id", shingleN = 3,
        threshold = 0.5, maxCandidateVolume = 1000L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("SATURATED VOCABULARY")),
      s"guard error should carry the remedy, got: ${messages(ex).mkString(" | ")}")
    // the posting-list cap is the drop-and-report escape hatch: hot
    // tokens leave candidate generation, the job completes under the
    // same budget, and the audit leg names what was dropped
    val capped = Dedup.similarityJoinPrefix(sat, "text", "doc_id", shingleN = 3,
      threshold = 0.5, maxPostings = 5L, maxCandidateVolume = 1000L)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val audit = Dedup.similarityJoinDroppedTokens(sat, "text",
      shingleN = 3, maxPostings = 5L)
    assert(audit.count() > 0)
    assert(audit.select(min($"n_postings")).as[Long].head() > 5L)
    // capped never invents pairs: subset of the uncapped exact answer
    val uncapped = Dedup.similarityJoinPrefix(sat, "text", "doc_id", shingleN = 3,
      threshold = 0.5, maxCandidateVolume = Long.MaxValue)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
  }

  test("similarityJoinPrefix generous posting cap is bit-identical to uncapped " +
    "and its audit is empty; default guard passes a healthy corpus") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector.fill(40)((1 to 7).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val base = Vector.fill(25)(vocab(rnd.nextInt(vocab.size)))
    val corpus = (0L until 30L).map { i =>
      val words =
        if (i < 15) base.map(w => if (rnd.nextInt(8) == 0) vocab(rnd.nextInt(vocab.size)) else w)
        else Vector.fill(25)(vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    def pairs(mp: Long) =
      rows(Dedup.similarityJoinPrefix(corpus, "text", "doc_id", shingleN = 4,
        threshold = 0.6, maxPostings = mp).orderBy($"id_a", $"id_b"))
    val generous = pairs(1000L)   // no posting list comes near 1000
    val uncapped = pairs(Long.MaxValue) // default guard armed on both
    assert(generous == uncapped && generous.nonEmpty)
    assert(Dedup.similarityJoinDroppedTokens(corpus, "text", 4, 1000L).count() == 0)
  }

  test("similarityJoinPrefix boundary: pair with jaccard exactly == threshold " +
    "survives the float length filter and prefix ceil") {
    // 23 distinct chars -> 20 distinct 4-grams; the 14-char prefix -> 11,
    // a strict subset, so jaccard = 11/20 = 0.55 == t exactly. In doubles
    // 0.55*20 lands epsilon ABOVE 11, so an un-guarded `lb >= t*la` filter
    // (and ceil(t*len) prefix bound) silently drops this qualifying pair.
    val a = "abcdefghijklmnopqrstuvw"
    val b = a.substring(0, 14)
    val corpus = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val out = Dedup.similarityJoinPrefix(corpus, "text", "doc_id",
      shingleN = 4, threshold = 0.55).collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 0.55)
  }

  test("passageDupStats: shared 10-word windows counted per doc; " +
    "short docs report 0/0; window alignment is per-doc") {
    val shared = (1 to 10).map(i => s"w$i").mkString(" ")   // one full window
    val docs = Seq(
      (1L, shared + " " + (11 to 20).map(i => s"a$i").mkString(" ")), // shared + unique
      (2L, shared + " " + (11 to 20).map(i => s"b$i").mkString(" ")), // shared + unique
      (3L, (21 to 35).map(i => s"c$i").mkString(" ")),                // 1 window + tail
      (4L, "too short")).toDF("doc_id", "text")                       // no full window
    val out = Dedup.passageDupStats(docs, "text", "doc_id", words = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (2L, 1L)) // 2 windows, the shared one duplicated
    assert(out(2L) == (2L, 1L))
    assert(out(3L) == (1L, 0L)) // 15 words -> one window, unique
    assert(out(4L) == (0L, 0L)) // shorter than a window
  }

  test("simhash: identical texts get identical fingerprints; near-dups close") {
    val fp = Dedup.simhash(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(4L))
    val dfp = Seq((fp(1L), fp(2L), fp(3L))).toDF("a", "b", "c")
    val r = dfp.select(Dedup.hamming64($"a", $"b"), Dedup.hamming64($"a", $"c")).head()
    assert(r.getInt(0) < r.getInt(1)) // near-dup closer than unrelated
  }

  test("charNgrams distinct shingles; jaccard identical=1, disjoint=0") {
    val df = Seq(("abcab", "abc", "xyz")).toDF("a", "b", "c")
    val sh = df.select(
      TextAnalysis.charNgrams($"a", 3).as("sa"),
      TextAnalysis.charNgrams($"b", 3).as("sb"),
      TextAnalysis.charNgrams($"c", 3).as("sc"))
    val r = sh.select(size($"sa"),
      TextAnalysis.jaccard($"sb", $"sb"), TextAnalysis.jaccard($"sb", $"sc")).head()
    assert(r.getInt(0) == 3) // abc, bca, cab
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 0.0)
  }

  test("tokenCount, punctRatio, wordSetRatio, qualityScore bounds") {
    val df = Seq("the cat!! sat??").toDF("t")
    val r = df.select(
      TextAnalysis.tokenCount($"t"),
      TextAnalysis.punctRatio($"t"),
      TextAnalysis.wordSetRatio($"t", Seq("the")),
      TextAnalysis.qualityScore($"t")).head()
    assert(r.getInt(0) == 3)
    assert(math.abs(r.getDouble(1) - 4.0 / 15.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0 / 3.0) < 1e-12)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("bpeishCount: sub-word pieces = words + digit runs + punctuation") {
    val df = Seq("hello world2go!", "a-b").toDF("t")
    // "hello world2go!" → hello, world, 2, go, ! = 5 ; "a-b" → a, -, b = 3
    assert(df.select(TextAnalysis.bpeishCount($"t")).as[Int].collect().toSeq == Seq(5, 3))
  }

  test("langId picks marker-dominant language, und when no markers") {
    val df = Seq("the cat and the dog is here",
      "el perro y la casa de los gatos", "zzz qqq").toDF("t")
    assert(df.select(TextAnalysis.langId($"t")).as[String].collect().toSeq ==
      Seq("en", "es", "und"))
  }

  test("wordBigrams yields adjacent pairs; empty below two tokens") {
    val df = Seq("a b c d", "solo", "", "  x   y  ").toDF("t")
    val out = df.select(TextAnalysis.wordBigrams($"t")).as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("a b", "b c", "c d"), Seq(), Seq(), Seq("x y")))
  }

  test("fingerprint is order-sensitive") {
    val df = Seq(("a b c", "c b a")).toDF("x", "y")
    val r = df.select(TextAnalysis.fingerprint($"x"), TextAnalysis.fingerprint($"y")).head()
    assert(r.getLong(0) != r.getLong(1))
  }

  test("piiScrub redacts emails, IPv4s, and phone runs with typed placeholders") {
    val df = Seq(
      ("a", "reach me at jo.doe+x@mail.example.org today"),
      ("b", "server 10.0.255.7 and backup 192.168.1.1 up"),
      ("c", "call +1 555-014-0042 or 555 014 9999 now"),
      ("d", "clean text, no pii at all")).toDF("k", "t")
    val out = df.select($"k", TextAnalysis.piiScrub($"t").as("s"),
      TextAnalysis.piiCount($"t", TextAnalysis.emailRe).as("ne"),
      TextAnalysis.piiCount($"t", TextAnalysis.ipv4Re).as("ni"),
      TextAnalysis.piiCount($"t", TextAnalysis.phoneRe).as("np"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a")._1 == "reach me at <EMAIL> today" && out("a")._2 == 1)
    assert(out("b")._1 == "server <IP> and backup <IP> up" && out("b")._3 == 2)
    assert(out("c")._1 == "call +1 <PHONE> or <PHONE> now" && out("c")._4 == 2)
    assert(out("d")._1 == "clean text, no pii at all" &&
      out("d")._2 == 0 && out("d")._3 == 0 && out("d")._4 == 0)
  }

  test("contamination counts distinct shared shingles vs the benchmark only") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog tonight")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix the quick brown fox jumps over something"), // shares a long run
      (2L, "totally unrelated words about query engines only")) // shares nothing
      .toDF("doc_id", "text")
    val hits = TextAnalysis.contamination(corpus, bench, "text", "doc_id",
      n = 12, minHits = 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(1L) && hits(1L) >= 3L)
    assert(!hits.contains(2L))
  }

  test("chunks: stride windows with trailing partial; empty text gives one empty chunk") {
    val df = Seq(("abcdefghij", "")).toDF("t", "e")
    val r = df.select(TextAnalysis.chunks($"t", 4, 3), TextAnalysis.chunks($"e", 4, 3)).head()
    assert(r.getSeq[String](0) == Seq("abcd", "defg", "ghij", "j"))
    assert(r.getSeq[String](1) == Seq(""))
  }

  test("hashBucket: deterministic, in [0,100), salt decorrelates splits") {
    val df = (1 to 300).map(i => s"document number $i").toDF("t")
    val b = df.select(TextAnalysis.hashBucket($"t").as("b1"),
      TextAnalysis.hashBucket($"t", "other").as("b2")).collect()
    assert(b.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 100))
    val again = df.select(TextAnalysis.hashBucket($"t").as("b1")).collect().map(_.getLong(0))
    assert(b.map(_.getLong(0)).toSeq == again.toSeq) // stable across evaluations
    assert(b.count(r => r.getLong(0) != r.getLong(1)) > 250) // salts differ
    // roughly uniform: a 90/10 split lands near 90%
    val trainFrac = b.count(_.getLong(0) < 90).toDouble / b.length
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"trainFrac=$trainFrac")
  }

  test("repetition: templated text scores far above varied text; short text is 0") {
    val df = Seq((
      "spark spark spark spark spark spark spark spark",
      "the quick brown fox jumps over a lazy dog quietly",
      "ab")).toDF("rep", "varied", "short")
    val r = df.select(TextAnalysis.repetition($"rep", 8),
      TextAnalysis.repetition($"varied", 8),
      TextAnalysis.repetition($"short", 8)).head()
    assert(r.getDouble(0) > 0.7, s"rep=${r.getDouble(0)}")
    assert(r.getDouble(1) < 0.2, s"varied=${r.getDouble(1)}")
    assert(r.getDouble(2) == 0.0)
  }

  test("compressionRatio: repeated text compresses far below varied prose; bounds sane") {
    val df = Seq((
      "spark " * 200,
      "The committee reviewed seventeen distinct proposals covering zoning, " +
        "transit funding, watershed easements, and municipal broadband on Tuesday.",
      "")).toDF("rep", "varied", "empty")
    val r = df.select(TextAnalysis.compressionRatio($"rep"),
      TextAnalysis.compressionRatio($"varied"),
      TextAnalysis.compressionRatio($"empty")).head()
    assert(r.getDouble(0) < 0.1, s"rep=${r.getDouble(0)}")
    assert(r.getDouble(1) > 0.5, s"varied=${r.getDouble(1)}")
    assert(r.getDouble(0) > 0.0 && r.getDouble(2) == 1.0)
    // deterministic across evaluations
    val again = df.select(TextAnalysis.compressionRatio($"rep")).head().getDouble(0)
    assert(again == r.getDouble(0))
  }

  test("native fingerprint is bit-identical to the composable aggregate fold") {
    val texts = Seq("the quick brown fox", "a", "", "héllo wörld ünïcode",
      "x y z " * 40, "punct!! and?? digits123")
    val df = texts.toDF("t")
    val composable = df.select(aggregate(TextAnalysis.tokens($"t"), lit(0L),
      (acc, tok) => shiftleft(acc, 5).bitwiseXOR(shiftright(acc, 59))
        .bitwiseXOR(xxhash64(tok)))).as[Long].collect().toSeq
    val native = df.select(TextAnalysis.fingerprint($"t")).as[Long].collect().toSeq
    assert(native == composable)
  }

  test("minhashRecallAudit: exact dup always a candidate; count invariants") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup
      (3L, "completely unrelated text talking about spark executors"))
      .toDF("doc_id", "text")
    val r = Dedup.minhashRecallAudit(df, "text", "doc_id",
      shingleN = 3, numHashes = 32, bands = 8, threshold = 0.6,
      portable = true).head()
    val (nEx, nCand, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // pair (1,2) is the only exact pair; identical shingle sets give
    // identical signatures, so every band matches and it MUST be a
    // candidate — recall is exactly 1.0 regardless of the hash family
    assert(nEx == 1L && nHit == 1L && r.getLong(3) == 1000000L)
    assert(nHit <= nEx && nHit <= nCand)
    // precision = hits over candidates, in ppm
    assert(r.getLong(4) == 1000000L * nHit / nCand)
  }

  test("minhashDedup propagationRounds=-1 collapses an arbitrary-length chain " +
    "to one root (connected components to fixpoint)") {
    // chain construction: doc_i = block_i ++ block_{i+1}, blocks are
    // disjoint seeded-random words → adjacent docs share one block
    // (jaccard ≈ 1/3), non-adjacent docs share nothing. Each doc's only
    // verified edge is to its predecessor, so full collapse needs
    // pointer-chasing over the whole chain, not one hop.
    val rnd = new scala.util.Random(7)
    def word() = (1 to 8).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val blocks = Vector.fill(11)(Seq.fill(6)(word()))
    val chain = (1 to 10).map(i => (i.toLong, (blocks(i - 1) ++ blocks(i)).mkString(" ")))
      .toDF("doc_id", "text")
    // adjacent docs share half their words → char-3-gram jaccard lands
    // ~0.2-0.35 depending on cross-block shingle collisions; 0.15 keeps
    // every adjacent edge verified while unrelated pairs (j≈0) stay out
    def reps(rounds: Int): Map[Long, Long] =
      Dedup.minhashDedup(chain, "text", "doc_id", shingleN = 3,
        numHashes = 32, bands = 32, threshold = 0.15, propagationRounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fix = reps(-1)
    assert(fix.values.toSet == Set(1L), s"fixpoint should collapse to root 1: $fix")
    // the bounded default cannot reach the root across a 10-chain —
    // this is exactly what -1 adds
    val bounded = reps(2)
    assert(bounded.values.toSet != Set(1L))
  }

  test("decontaminate excises exactly the benchmark span, keeps the rest") {
    import spark.implicits._
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val docs = Seq(
      // benchmark 8-gram embedded mid-document
      (100L, "start alpha beta gamma delta epsilon zeta eta theta end tail"),
      (101L, "no overlap with the benchmark suite here at all ok"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.decontaminate(docs, bench, "text", "doc_id", n = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 100: 11 tokens, one hit span at position 2 covering 2..9 →
    // kept = start, end, tail
    assert(got(100L)._1 == 1L && got(100L)._2 == 3L)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("start end tail".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(100L)._3 == md5)
    // doc 101: untouched, whitespace-normalized passthrough
    assert(got(101L)._1 == 0L && got(101L)._2 == 10L)
  }

  test("thresholdCalibration: exact-dup pair lands in bucket 9, " +
    "reverse cumulative sums up") {
    import spark.implicits._
    val df = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (20L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
      (40L, "zzz completely different content qqq xyzzy"),
      (7L, "sampled out (not ≡ 0 mod 20)"))
      .toDF("doc_id", "text")
    val got = Dedup.thresholdCalibration(df, "text", "doc_id",
      shingleN = 3, sampleMod = 20L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 3 sampled docs -> 3 pairs: one identical (bucket 9), two dissimilar
    assert(got(9L)._1 == 1L)
    assert(got(9L)._2 == 1L) // reverse cumulative at the top bucket
    assert(got.values.map(_._1).sum == 3L)
    val bottom = got.keys.min
    assert(got(bottom)._2 == 3L) // lowest bucket accumulates every pair
  }

  test("fuzzyMatchPairs equals the quadratic blocked definition; banded dist exact") {
    val rnd = new scala.util.Random(31)
    val words = Vector("anvil", "bolt", "crank", "amber", "azure")
    val docs = (1L to 80L).map { i =>
      val name = (0 until 3).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      (i, name, s"B${rnd.nextInt(3)}")
    }.toDF("id", "name", "blk")
    val got = Dedup.fuzzyMatchPairs(docs, "name", "id", Seq($"blk"), maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // driver-side quadratic reference with classic DP levenshtein
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rows2 = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = (for {
      (ia, na, ba) <- rows2; (ib, nb, bb) <- rows2
      if ia < ib && ba == bb && lev(na, nb) <= 4
    } yield (ia, ib) -> lev(na, nb).toLong).toMap
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce matches")
  }

  test("fuzzyMatchPairs maxBlockSize drops a degenerate block whole and reports it") {
    // block "HOT" is degenerate (40 rows of near-identical names — the
    // NULL-attribute block of a real ER run); "A" and "B" are healthy
    val hot = (1L to 40L).map(i => (i, s"widget $i", "HOT"))
    val ok = Seq((100L, "anvil works", "A"), (101L, "anvil worry", "A"),
      (200L, "bolt cutter", "B"), (201L, "bolt gutter", "B"))
    val docs = (hot ++ ok).toDF("id", "name", "blk")
    val capped = Dedup.fuzzyMatchPairs(docs, "name", "id", Seq($"blk"),
      maxDist = 4, maxBlockSize = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every surviving pair comes from the healthy blocks; nothing from HOT
    assert(capped == Set((100L, 101L), (200L, 201L)))
    // the audit leg names the dropped block with its size
    val dropped = Dedup.fuzzyMatchDroppedBlocks(docs, Seq($"blk"), 10L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dropped == Map("HOT" -> 40L))
    // uncapped default is unchanged: HOT pairs come back
    val full = Dedup.fuzzyMatchPairs(docs, "name", "id", Seq($"blk"), maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(full) && full.exists(p => p._1 <= 40L))
  }
}
