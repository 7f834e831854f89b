package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(scores: Seq[(Int, Boolean)]): (Long, Long, Long, Double) = {
    val df = scores.toDF("score", "label")
    val r = Eval.aucExact(df, col("score"), col("label")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
  }

  test("perfect separation gives AUC 1, inverted gives 0") {
    val (p, n, _, a) = auc(Seq((1, false), (2, false), (3, true), (4, true)))
    assert((p, n, a) == ((2L, 2L, 1.0)))
    val (_, _, num2, inv) = auc(Seq((4, false), (3, false), (2, true), (1, true)))
    assert(num2 == 0L && inv == 0.0)
  }

  test("ties get midrank credit") {
    // pos scores {2, 1}, neg scores {2, 1}: AUC = 0.5 exactly
    val (_, _, num2, a) = auc(Seq((2, true), (2, false), (1, true), (1, false)))
    // num2 = Σ np·(2·negBelow + nn): score 1 → 1·(0+1)=1; score 2 → 1·(2+1)=3
    assert(num2 == 4L && a == 0.5)
  }

  test("null labels and scores are excluded") {
    val df = Seq[(java.lang.Integer, java.lang.Boolean)](
      (1, false), (2, true), (null, true), (3, null))
      .toDF("score", "label")
    val r = Eval.aucExact(df, col("score"), col("label")).head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(3)) == ((1L, 1L, 1.0)))
  }

  test("matches the O(P·N) pairwise definition on a mixed sample") {
    val scores = (1 to 40).map(i => ((i * 7) % 13, (i * 3) % 4 != 0))
    val pos = scores.filter(_._2).map(_._1)
    val neg = scores.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expected = wins / (pos.size * neg.size)
    val (_, _, _, a) = auc(scores)
    assert(math.abs(a - expected) < 1e-6) // aucExact rounds to 6 decimals
  }

  test("prCurve: exact confusion counts, NULL precision when nothing predicted") {
    import org.apache.spark.sql.functions._
    val df = Seq((100L, true), (200L, true), (300L, false), (400L, true))
      .toDF("s", "lab")
    val got = Eval.prCurve(df, col("s"), col("lab"), Seq(250L, 1000L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4),
          if (r.isNullAt(5)) null else r.getLong(5)))).toMap
    // t=250: predicted {300,400} → tp=1 fp=1 fn=2; P=500000, R=333333
    assert(got(250L) == ((1L, 1L, 2L, 500000L, 333333L)))
    // t=1000: nothing predicted → precision NULL, recall 0
    assert(got(1000L) == ((0L, 0L, 3L, null, 0L)))
  }

  test("cohenKappa: hand-computed 2x2, perfect and chance agreement") {
    import org.apache.spark.sql.functions._
    // both_pos=2, both_neg=1, only_a=1, only_b=0 -> n=4, po=0.75
    // paPos=3/4, pbPos=2/4 -> pe = .75*.5 + .25*.5 = 0.5 -> kappa = 0.5
    val df = Seq((true, true), (true, true), (false, false), (true, false))
      .toDF("a", "b")
    val r = Eval.cohenKappa(df, col("a"), col("b")).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getLong(2) == 1L)
    assert(r.getLong(5) == 750000L)
    assert(r.getDouble(6) == 0.5)
    // perfect agreement -> kappa 1
    val perfect = Seq((true, true), (false, false)).toDF("a", "b")
    assert(Eval.cohenKappa(perfect, col("a"), col("b")).head().getDouble(6) == 1.0)
  }

  test("calibration: exact integer bins, means, and positive rates") {
    import org.apache.spark.sql.functions._
    // bucket 0 (scores < 100k): 2 rows, 1 positive; bucket 9 clamps 1e6
    val df = Seq(
      (50000L, true), (90000L, false),          // bucket 0
      (550000L, true), (550000L, true),         // bucket 5
      (1000000L, true))                         // clamped into bucket 9
      .toDF("s", "lab")
    val got = Eval.calibration(df, col("s"), col("lab"), buckets = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == ((2L, 1L, 70000L, 500000L)))
    assert(got(5L) == ((2L, 2L, 550000L, 1000000L)))
    assert(got(9L) == ((1L, 1L, 1000000L, 1000000L)))
    // NULL labels/scores are excluded
    val withNulls = Seq[(java.lang.Long, java.lang.Boolean)](
      (50000L, true), (null, true), (70000L, null))
      .toDF("s", "lab")
    assert(Eval.calibration(withNulls, col("s"), col("lab"), 10)
      .agg(sum(col("n"))).head().getLong(0) == 1L)
  }

  test("ndcgAtK: hand-computed ranking, ideal order gives 1, ties by id") {
    // query 1: system order (score desc, id asc) = ids 1,2,3 with
    // rel 0,2,1 → dcg = 0 + 3/log2(3) + 1/2; ideal rel order 2,1,0 →
    // idcg = 3 + 1/log2(3) + 0
    val df = Seq(
      (1, 1L, 30, 0), (1, 2L, 20, 2), (1, 3L, 10, 1),
      // query 2: already ideal (rel descending in score order) → ndcg 1
      (2, 1L, 9, 3), (2, 2L, 8, 1),
      // query 3: score tie broken by id asc — id 5 outranks id 6
      (3, 5L, 7, 0), (3, 6L, 7, 2)).toDF("q", "id", "score", "rel")
    val got = Eval.ndcgAtK(df, col("q"), col("id"), col("score"),
      col("rel"), k = 10).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    def l2(x: Double) = math.log(x) / math.log(2.0)
    def rnd(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dcg1 = 3.0 / l2(3.0) + 1.0 / 2.0
    val idcg1 = 3.0 + 1.0 / l2(3.0)
    assert(got(1) == ((3L, rnd(dcg1), rnd(idcg1), rnd(dcg1 / idcg1))))
    assert(got(2)._4 == 1.0)
    // q3: pos1 = id5 (rel 0), pos2 = id6 (rel 2, gain 3)
    val dcg3 = 0.0 + 3.0 / l2(3.0)
    val idcg3 = 3.0 + 0.0
    assert(got(3) == ((2L, rnd(dcg3), rnd(idcg3), rnd(dcg3 / idcg3))))
  }

  test("ndcgAtK: only top-k counted; all-zero relevance yields ndcg 0") {
    // k=1: only the top-scored doc's gain counts
    val df = Seq((1, 1L, 5, 1), (1, 2L, 4, 3)).toDF("q", "id", "score", "rel")
    val r = Eval.ndcgAtK(df, col("q"), col("id"), col("score"),
      col("rel"), k = 1).head()
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 7.0) // dcg=2^1-1, idcg=2^3-1
    val zeros = Seq((1, 1L, 5, 0), (1, 2L, 4, 0)).toDF("q", "id", "score", "rel")
    assert(Eval.ndcgAtK(zeros, col("q"), col("id"), col("score"),
      col("rel"), k = 10).head().getDouble(4) == 0.0)
  }
}
