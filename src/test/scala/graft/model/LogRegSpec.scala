package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogRegSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // linearly separable by vocabulary: English-ish vs German-ish docs
    val en = Seq("the and of to is that for with", "the cat is on the mat and happy",
      "that dog runs with the ball for fun", "is it the best of times and worst")
    val de = Seq("der die das und ist nicht ein mit", "der hund ist nicht mit dem ball",
      "die katze und der vogel mit futter", "das ist nicht der beste und letzte")
    (0 until 200).map { i =>
      val base = if (i % 2 == 0) en(i / 2 % en.length) else de(i / 2 % de.length)
      (i.toLong, s"$base tail$i", i % 2 == 0)
    }.toDF("doc_id", "text", "is_en")
  }

  test("separable weak labels: accuracy >= 0.95, scores in (0,1)") {
    val df = corpus
    val scored = LogReg.trainScore(df, "text", "doc_id", col("is_en"),
      dim = 64, iters = 15, lr = 5.0)
    val joined = scored.join(df.select(col("doc_id"), col("is_en")), Seq("doc_id"))
    val n = joined.count().toDouble
    val correct = joined
      .where((col("score") >= 0.5) === col("is_en")).count().toDouble
    assert(correct / n >= 0.95, s"accuracy ${correct / n}")
    val bounds = scored.agg(min(col("score")), max(col("score"))).head()
    assert(bounds.getDouble(0) > 0.0 && bounds.getDouble(1) < 1.0)
  }

  test("training moves scores in the right direction (vs the 0.5 prior)") {
    val df = corpus
    val scored = LogReg.trainScore(df, "text", "doc_id", col("is_en"),
      dim = 64, iters = 15, lr = 5.0)
    val avg = scored.join(df.select(col("doc_id"), col("is_en")), Seq("doc_id"))
      .groupBy(col("is_en")).agg(org.apache.spark.sql.functions.avg("score").as("s"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg(true) > 0.7 && avg(false) < 0.3,
      s"class means ${avg(true)} / ${avg(false)}")
  }

  test("hashed_bow expression matches the shuffle formulation exactly") {
    val df = corpus.unionByName(
      Seq((9001L, "", false), (9002L, "   ", true)).toDF("doc_id", "text", "is_en"))
    val dim = 64
    val old = {
      val f = LogReg.hashedFeatures(df, "text", "doc_id", dim)
      f.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("bucket"), col("x")))).as("bx"))
        .select(col("doc_id"), col("bx.bucket").as("b"), col("bx.x").as("x"))
    }
    val toks = coalesce(
      graft.ops.TextAnalysis.tokens(lower(col("text"))), lit(Array.empty[String]))
    val fused = df.select(col("doc_id"),
        graft.expressions.VectorExprs.hashedBow(toks, dim).as("bx"))
      .select(col("doc_id"), col("bx.b").as("b"), col("bx.x").as("x"))
    val a = old.collect().map(r => r.getLong(0) ->
      (r.getSeq[Int](1), r.getSeq[Double](2))).toMap
    val c = fused.collect().map(r => r.getLong(0) ->
      (r.getSeq[Int](1), r.getSeq[Double](2))).toMap
    assert(a.keySet == c.keySet)
    a.keySet.foreach { k => assert(a(k) == c(k), s"doc $k: ${a(k)} vs ${c(k)}") }
  }

  test("fused feature prep plans with ZERO exchanges (pure scan)") {
    val df = corpus
    val toks = coalesce(
      graft.ops.TextAnalysis.tokens(lower(col("text"))), lit(Array.empty[String]))
    val prep = df.select(col("doc_id"),
        graft.expressions.VectorExprs.hashedBow(toks, 64).as("__bx"),
        col("is_en").cast("int").cast("double").as("__y"))
      .select(col("doc_id"), col("__bx.b").as("__b"), col("__bx.x").as("__x"),
        col("__y"))
    val plan = prep.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"feature prep should be map-only:\n$plan")
  }

  test("hashedFeatures: bias row present, L1-normalized tokens") {
    val df = Seq((1L, "a b a")).toDF("doc_id", "text")
    val f = LogReg.hashedFeatures(df, "text", "doc_id", dim = 16)
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    assert(f.exists { case (b, x) => b == 16 && x == 1.0 }) // bias bucket
    val tokenRows = f.filter(_._1 != 16)
    assert(math.abs(tokenRows.map(_._2).sum - 1.0) < 1e-9)  // L1 norm
  }
}
