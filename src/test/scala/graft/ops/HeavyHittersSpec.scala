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

  test("sketch merges across groups (grouped aggregation)") {
    val df = (Seq.fill(100)(("a", "x")) ++ Seq.fill(50)(("a", "y")) ++
      Seq.fill(70)(("b", "z"))).toDF("g", "token").repartition(4)
    val out = df.groupBy($"g").agg(HeavyHitters.topK(8)(col("token")).as("top"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).head.getString(0)).toMap
    assert(out == Map("a" -> "x", "b" -> "z"))
  }
}
