package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class IndexOpsSpec extends SparkSpec {
  import spark.implicits._

  test("champion index: df/cf exact, postings impact-ordered and capped") {
    val docs = Seq(
      (1L, "a a a b"),
      (2L, "a a b b c"),
      (3L, "a b"),
      (4L, "c")).toDF("doc_id", "text")
    val idx = InvertedIndex.champion(docs, col("text"), col("doc_id"),
        k = 2, minDf = 1L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // 'a': df 3, cf 6, top-2 by tf: doc1 (3), doc2 (2)
    assert(idx("a") == ((3L, 6L, "1:3,2:2")))
    // 'b': df 3, cf 4, top-2: doc2 (2), then tie tf=1 -> doc1 before doc3
    assert(idx("b") == ((3L, 4L, "2:2,1:1")))
    assert(idx("c") == ((2L, 2L, "2:1,4:1")))
  }

  test("champion index minDf drops rare terms") {
    val docs = Seq((1L, "x y"), (2L, "x")).toDF("doc_id", "text")
    val terms = InvertedIndex.champion(docs, col("text"), col("doc_id"),
      k = 3, minDf = 2L).select("term").as[String].collect().toSet
    assert(terms == Set("x"))
  }

  test("topKPerGroup is bit-identical to the naive single window") {
    val rng = new scala.util.Random(7)
    val df = (1 to 400).map { i =>
      (s"g${rng.nextInt(5)}", i.toLong, rng.nextInt(50))
    }.toDF("g", "id", "v")
    val ord = Seq(col("v").desc, col("id").asc)
    val fast = Sampling.topKPerGroup(df, col("g"), ord,
      shardOn = col("id"), k = 7, shards = 8)
    val naive = df.withColumn("rank",
        row_number().over(Window.partitionBy(col("g")).orderBy(ord: _*)))
      .where(col("rank") <= 7)
    assert(rows(fast.select("g", "id", "v", "rank")) ==
      rows(naive.select("g", "id", "v", "rank")))
  }

  test("bottomKOverlap: exact ppm and sketch counts on a known vocab") {
    // corpus a: t0..t7; corpus b: t4..t11 -> union 12, both 4
    val rows = (0 to 7).map(i => ("a", s"t$i")) ++
      (4 to 11).map(i => ("b", s"t$i"))
    val df = rows.toDF("corpus", "t")
    val out = CorpusOverlap.bottomKOverlap(df, col("corpus"), col("t"),
        ks = Seq(4, 100), shards = 4)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // exact: 4 / 12 = 333333 ppm regardless of k
    assert(out(4)._4 == 333333L)
    assert(out(100)._4 == 333333L)
    // k=100 saturates the vocab: the sketch IS the exact answer
    assert(out(100)._1 == 12L && out(100)._2 == 4L &&
      out(100)._3 == 333333L)
    // k=4 samples exactly 4, and est = n_both/4 in ppm
    assert(out(4)._1 == 4L)
    assert(out(4)._3 == out(4)._2 * 1000000L / 4L)
  }

  test("triangles: exact count, orientation-insensitive input") {
    // K4 on {1,2,3,4} (4 triangles) + pendant 5 + disconnected 6-7
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (6L, 7L))).toDF("s", "d")
    val out = Graph.triangles(edges, "s", "d").head()
    assert(out.getLong(0) == 7L) // nodes
    assert(out.getLong(1) == 8L) // edges
    assert(out.getLong(2) == 4L) // triangles in K4
    // reversed directions, duplicates, self-loops: same answer
    val messy = edges.select(col("d").as("s"), col("s").as("d"))
      .unionAll(edges).unionAll(Seq((3L, 3L)).toDF("s", "d"))
    assert(Graph.triangles(messy, "s", "d").head().getLong(2) == 4L)
  }

  test("champion index equals the naive window top-k on random corpora") {
    val rng = new scala.util.Random(23)
    val vocab = Vector("ab", "cd", "ef", "gh", "ij", "kl", "mn")
    val docs = (1 to 60).map { i =>
      (i.toLong, Seq.fill(1 + rng.nextInt(30))(vocab(rng.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val k = 3
    val fast = InvertedIndex.champion(docs, col("text"), col("doc_id"),
      k = k, minDf = 1L)
    val tf = docs.select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("t"))
      .groupBy("t", "doc_id").agg(count(lit(1)).as("tf"))
    val naive = tf
      .withColumn("rn", row_number().over(Window.partitionBy(col("t"))
        .orderBy(col("tf").desc, col("doc_id").asc)))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        array_join(transform(array_sort(collect_list(
          when(col("rn") <= k, struct(col("rn"),
            concat(col("doc_id"), lit(":"), col("tf")).as("p"))))),
          e => e.getField("p")), ",").as("postings"))
      .select(col("t").as("term"), col("df"), col("cf"), col("postings"))
    assert(rows(fast) == rows(naive))
  }

  test("triangles equals the cubic definition on random graphs") {
    val rng = new scala.util.Random(31)
    val n = 25
    val edgeSet = (for {
      a <- 1 to n; b <- 1 to n
      if a < b && rng.nextDouble() < 0.25
    } yield (a.toLong, b.toLong)).toVector
    val expected = (for {
      Seq((a, b), (c, d), (e, f)) <- edgeSet.combinations(3)
      nodes = Set(a, b, c, d, e, f)
      if nodes.size == 3
    } yield 1).size
    val out = Graph.triangles(edgeSet.toDF("s", "d"), "s", "d").head()
    assert(out.getLong(2) == expected.toLong)
    assert(out.getLong(1) == edgeSet.size.toLong)
  }

  test("bottomKOverlap sample is hash-deterministic, not insertion-ordered") {
    val df = (0 to 19).map(i => ("a", s"w$i")).toDF("corpus", "t")
    val a = CorpusOverlap.bottomKOverlap(df, col("corpus"), col("t"), Seq(8))
    val b = CorpusOverlap.bottomKOverlap(df.repartition(7), col("corpus"),
      col("t"), Seq(8))
    assert(rows(a) == rows(b))
  }
  test("phraseSearch: consecutive tokens only, counts + 0-based first position") {
    import spark.implicits._
    val docs = Seq(
      (1L, "stream table hash x stream table hash"),
      (2L, "table stream hash"), // right words, wrong order
      (3L, "stream table"), // incomplete
      (4L, "pre stream  table hash")) // multi-space still adjacent
      .toDF("doc_id", "text")
    val out = InvertedIndex.phraseSearch(docs, "text", "doc_id",
      Seq("stream", "table", "hash"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out == Map(1L -> (2L, 0), 4L -> (1L, 1)))
    // single-word phrase degenerates to term lookup
    val one = InvertedIndex.phraseSearch(docs, "text", "doc_id", Seq("hash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 2L, 2L -> 1L, 4L -> 1L))
  }
}
