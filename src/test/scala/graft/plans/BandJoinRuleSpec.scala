package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The band-join optimizer rule: |a−b| ≤ ε inner joins must stop
  * planning BroadcastNestedLoopJoin, results must be unchanged
  * (including negatives, strict <, and either literal side), and the
  * guards must leave non-eligible joins alone.
  */
class BandJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  new graft.GraftExtensions().registerOn(spark)

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val left =
    Seq((1L, -7L), (2L, -2L), (3L, 0L), (4L, 5L), (5L, 13L), (6L, 41L))
      .toDF("lid", "lv")
  private val right =
    Seq((10L, -9L), (11L, -1L), (12L, 3L), (13L, 12L), (14L, 40L), (15L, 100L))
      .toDF("rid", "rv")

  private def expected(eps: Long, strict: Boolean): Set[(Long, Long)] = {
    val l = Seq((1L, -7L), (2L, -2L), (3L, 0L), (4L, 5L), (5L, 13L), (6L, 41L))
    val r = Seq((10L, -9L), (11L, -1L), (12L, 3L), (13L, 12L), (14L, 40L), (15L, 100L))
    (for {
      (lid, lv) <- l
      (rid, rv) <- r
      d = math.abs(lv - rv)
      if (strict && d < eps) || (!strict && d <= eps)
    } yield (lid, rid)).toSet
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("lid", "rid").as[(Long, Long)].collect().toSet

  test("abs(l-r) <= eps join plans as equi-join with unchanged results") {
    val j = left.join(right, abs($"lv" - $"rv") <= lit(3L))
    val p = plan(j)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Generate explode"), p)
    assert(pairs(j) == expected(3L, strict = false))
  }

  test("strict <, reversed literal side, and negative values all hold") {
    val strict = left.join(right, abs($"lv" - $"rv") < lit(3L))
    assert(!plan(strict).contains("BroadcastNestedLoopJoin"))
    assert(pairs(strict) == expected(3L, strict = true))

    val reversed = left.join(right, lit(5L) >= abs($"rv" - $"lv"))
    assert(!plan(reversed).contains("BroadcastNestedLoopJoin"))
    assert(pairs(reversed) == expected(5L, strict = false))
  }

  test("guards: double eps, existing equi key, outer join stay untouched") {
    val dl = Seq((1L, 1.0), (2L, 2.5)).toDF("lid", "lv")
    val dr = Seq((10L, 1.4), (11L, 9.0)).toDF("rid", "rv")
    val doubles = dl.join(dr, abs($"lv" - $"rv") <= lit(0.5))
    assert(plan(doubles).contains("BroadcastNestedLoopJoin"))
    assert(pairs(doubles) == Set((1L, 10L)))

    val withKey = left.join(right,
      $"lid" === $"rid" - 9L && abs($"lv" - $"rv") <= lit(3L))
    assert(!plan(withKey).contains("Generate explode"), plan(withKey))

    val outer = left.join(right, abs($"lv" - $"rv") <= lit(3L), "left_outer")
    assert(outer.count() == 6 + 1) // lid=3 matches two rvs (-1 and 3)
  }

  test("rule composes with extra residual conjuncts") {
    val j = left.join(right,
      abs($"lv" - $"rv") <= lit(3L) && $"rid" =!= 12L)
    assert(!plan(j).contains("BroadcastNestedLoopJoin"))
    assert(pairs(j) == expected(3L, strict = false).filterNot(_._2 == 12L))
  }
}
