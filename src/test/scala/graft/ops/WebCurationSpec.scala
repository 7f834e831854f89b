package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebCurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- UrlOps.canonicalizeUrl ----

  private def canon(url: String): String =
    Seq(url).toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).head().getString(0)

  test("canonicalizeUrl: case, www, default port, fragment, tracking, slash") {
    assert(canon("HTTPS://WWW.Site.COM:443/Docs/1/?utm_source=x#frag")
      === "https://site.com/Docs/1")
    assert(canon("http://a.com:80/p") === "http://a.com/p")
    // non-default port survives
    assert(canon("http://a.com:8080/p/") === "http://a.com:8080/p")
    // kept params survive, tracking params die wherever they sit
    assert(canon("https://a.com/p?ref=1&utm_campaign=x&page=2")
      === "https://a.com/p?ref=1&page=2")
    assert(canon("https://a.com/p?utm_a=1&q=2") === "https://a.com/p?q=2")
    // path case is significant, host case is not
    assert(canon("https://A.com/Path") === "https://a.com/Path")
    // bare root: trailing slash stripped, host intact
    assert(canon("https://www.a.com/") === "https://a.com")
  }

  test("UrlOps.host extracts authority without port") {
    assert(Seq("https://a.b.com:8080/x").toDF("u")
      .select(UrlOps.host(col("u"))).head().getString(0) === "a.b.com")
  }

  // ---- Dedup.canonicalPick ----

  test("canonicalPick keeps the max-pref row per cluster with cluster size") {
    val df = Seq(
      (1L, "k1", 10L), (2L, "k1", 30L), (3L, "k1", 30L),
      (4L, "k2", 5L)).toDF("id", "k", "quality")
    val out = Dedup.canonicalPick(df, col("k"), col("id"),
        Seq(col("quality")))
      .select("id", "k", "quality", "n_in_cluster")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // k1: quality ties at 30 -> lowest id (2) wins; k2: singleton
    assert(out === Seq((2L, "k1", 30L, 3L), (4L, "k2", 5L, 1L)))
  }

  // ---- Dedup.passageScrub ----

  test("passageScrub removes corpus-repeated windows, keeps order") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")   // shared passage
    val a = s"$ten a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"       // shared + unique
    val b = s"$ten b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"       // shared + unique
    val c = "c1 c2 c3"                                   // shorter than a window
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "text")
    val out = Dedup.passageScrub(df, "text", "id", words = 10)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 1L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10")))
    assert(out(1) === ((2L, 1L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10")))
    assert(out(2) === ((3L, 0L, "")))
  }

  test("passageScrub keeps multi-window docs in document order") {
    val w1 = (1 to 10).map(i => s"x$i").mkString(" ")
    val w2 = (1 to 10).map(i => s"y$i").mkString(" ")
    val df = Seq((1L, s"$w1 $w2")).toDF("id", "text")
    val out = Dedup.passageScrub(df, "text", "id", words = 10)
      .as[(Long, Long, String)].head()
    assert(out === ((1L, 2L, s"$w1 $w2")))
  }

  // ---- TextAnalysis.bm25 ----

  test("bm25: more query-term mass ranks higher; no-hit docs score 0") {
    val df = Seq(
      (1L, "spark spark spark filler filler"),
      (2L, "spark filler filler filler filler"),
      (3L, "filler only no hits here at all")).toDF("id", "text")
    val out = TextAnalysis.bm25(df, "text", "id", Seq("spark"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0)._3 > out(1)._3 && out(1)._3 > 0.0)
    assert(out(2) === ((3L, 0L, 0.0)))
  }

  test("bm25 n_terms counts distinct matched query terms") {
    val df = Seq((1L, "spark table spark"), (2L, "table")).toDF("id", "text")
    val out = TextAnalysis.bm25(df, "text", "id", Seq("spark", "table", "zz"))
      .select("id", "n_terms").as[(Long, Long)].collect().sortBy(_._1)
    assert(out === Seq((1L, 2L), (2L, 1L)))
  }

  // ---- Sampling.weightedSample ----

  test("weightedSample: k per group, sharded phase matches naive window") {
    val df = (1L to 200L).map(i => (i, s"g${i % 3}", i % 7 + 1)).toDF("id", "g", "w")
    val out = Sampling.weightedSample(df, col("g"), col("w"), col("id"),
      k = 4, salt = "t", shards = 8)
    // exactly k per group (groups are larger than k)
    val per = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(per === Map("g0" -> 4L, "g1" -> 4L, "g2" -> 4L))
    // the sharded two-phase selection is bit-identical to the naive
    // single window over the same deterministic keys
    val naive = Sampling.weightedSample(df, col("g"), col("w"), col("id"),
      k = 4, salt = "t", shards = 1)
    assert(rows(out.select("g", "rank", "id")) ===
      rows(naive.select("g", "rank", "id")))
    // stable under re-runs and salt-sensitive
    assert(rows(out) === rows(Sampling.weightedSample(df, col("g"), col("w"),
      col("id"), k = 4, salt = "t", shards = 8)))
    val other = Sampling.weightedSample(df, col("g"), col("w"), col("id"),
      k = 4, salt = "u", shards = 8)
    assert(rows(out.select("g", "rank", "id")) !==
      rows(other.select("g", "rank", "id")))
  }

  test("weightedSample favors heavy rows in aggregate") {
    // one heavy row (w=1000) among light rows (w=1): across 40
    // independent salts it must be selected far more often than a
    // fixed light row (binomial tail makes a flip astronomically rare)
    val df = (1L to 50L).map(i => (i, "g", if (i == 1L) 1000L else 1L))
      .toDF("id", "g", "w")
    val picks = (1 to 40).map { s =>
      Sampling.weightedSample(df, col("g"), col("w"), col("id"),
        k = 3, salt = s"s$s").select("id").as[Long].collect().toSet
    }
    val heavy = picks.count(_.contains(1L))
    val light = picks.count(_.contains(2L))
    assert(heavy > light + 10, s"heavy=$heavy light=$light")
  }

  // ---- sparse_dot through the SQL surface ----

  test("sparse_dot SQL function matches the manual dot product") {
    new graft.GraftExtensions().registerOn(spark)
    val r = spark.sql(
      "SELECT sparse_dot(array(0, 2), array(2.0d, 3.0d), array(1.0d, 9.0d, 4.0d))")
      .head().getDouble(0)
    assert(r === 2.0 * 1.0 + 3.0 * 4.0)
  }
}
