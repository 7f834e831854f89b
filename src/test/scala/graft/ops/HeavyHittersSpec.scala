package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("SpaceSaving sketch recovers true heavy hitters on skewed data") {
    // zipf-ish: "hot" 5000×, "warm" 1000×, 2000 distinct cold items 1× each
    val tokens = Seq.fill(5000)("hot") ++ Seq.fill(1000)("warm") ++
      (1 to 2000).map(i => s"cold_$i")
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(1))
      .shuffle(tokens).toDF("token").repartition(8)
    val out = df.agg(HeavyHitters.topK(64)(col("token")).as("top")).head()
      .getSeq[org.apache.spark.sql.Row](0)
    val top2 = out.take(2).map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // guaranteed: any item with count > N/64 = 125 survives; estimates
    // overestimate by ≤ error
    assert(top2.head._1 == "hot")
    assert(top2(1)._1 == "warm")
    assert(top2.head._2 >= 5000 && top2.head._2 - top2.head._3 <= 5000)
    assert(top2(1)._2 >= 1000 && top2(1)._2 - top2(1)._3 <= 1000)
  }

  // bounded-error gate vs the exact twin q46 on the driver's
  // correctness-scale fixture (the AggsSpec q58/q74 discipline): every
  // estimate must bracket the exact count per SpaceSaving's guarantee
  // (exact ≤ est ≤ exact + max_err), and the summary must contain
  // every item above the N/capacity support threshold. Deterministic
  // for fixed input and partitioning-insensitive (the guarantee holds
  // under any merge order), so these are hard gates.
  test("q47 SpaceSaving estimates bracket exact counts; support threshold complete (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    val approx = graft.queries.Registry
      .queries("q47_heavy_hitters")(spark, dir)
    val exact = graft.core.Tables.load(spark, dir, "documents")
      .select($"lang", explode(TextAnalysis.tokens(lower($"text"))).as("token"))
      .groupBy($"lang", $"token").agg(count(lit(1)).as("exact"))
      .localCheckpoint(false) // feeds the bracket join AND the support scan
    val joined = approx.join(exact, Seq("lang", "token"), "left").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (est, err) = (r.getLong(r.fieldIndex("est_count")),
        r.getLong(r.fieldIndex("max_err")))
      assert(!r.isNullAt(r.fieldIndex("exact")),
        s"${r.getString(0)}/${r.getString(1)}: reported token never occurs")
      val ex = r.getLong(r.fieldIndex("exact"))
      assert(est >= ex && est - err <= ex,
        s"${r.getString(0)}/${r.getString(1)}: est=$est err=$err outside bracket for exact=$ex")
    }
    // completeness: every (lang, token) with exact count > N_lang/capacity
    // must appear in the summary (capacity = 32 in q47)
    val totals = exact.groupBy($"lang").agg(sum($"exact").as("n_lang"))
    val missing = exact.join(totals, Seq("lang"))
      .where($"exact" > $"n_lang" / 32)
      .join(approx.select($"lang", $"token"), Seq("lang", "token"), "left_anti")
      .count()
    assert(missing == 0, s"$missing above-threshold heavy hitters absent from the sketch")
  }

  test("sketch merges across groups (grouped aggregation)") {
    val df = (Seq.fill(100)(("a", "x")) ++ Seq.fill(50)(("a", "y")) ++
      Seq.fill(70)(("b", "z"))).toDF("g", "token").repartition(4)
    val out = df.groupBy($"g").agg(HeavyHitters.topK(8)(col("token")).as("top"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).head.getString(0)).toMap
    assert(out == Map("a" -> "x", "b" -> "z"))
  }
}
