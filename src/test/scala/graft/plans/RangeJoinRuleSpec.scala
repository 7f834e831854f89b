package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The range-join optimizer rule: BETWEEN-style containment joins must
  * plan as banded equi-joins when the bin size is configured, results
  * must be unchanged (both orientations, strict bounds, empty
  * intervals), and the rule must stay dormant without the conf.
  */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  new graft.GraftExtensions().registerOn(spark)

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def withBin[A](n: Long)(f: => A): A = {
    spark.conf.set(RangeJoinRule.BinSizeKey, n.toString)
    try f finally spark.conf.unset(RangeJoinRule.BinSizeKey)
  }

  private val points =
    Seq((1L, 3L), (2L, 10L), (3L, 17L), (4L, 25L), (5L, -4L))
      .toDF("pid", "v")
  private val intervals =
    Seq((10L, 0L, 5L), (11L, 8L, 18L), (12L, 30L, 40L), (13L, 6L, 2L),
      (14L, -10L, -1L)).toDF("iid", "lo", "hi")

  private val expected = Set( // v in [lo, hi]; interval 13 is empty
    (1L, 10L), (2L, 11L), (3L, 11L), (5L, 14L))

  test("containment join plans as banded equi-join with unchanged results") {
    withBin(5L) {
      val j = points.join(intervals, $"v" >= $"lo" && $"v" <= $"hi")
      val p = plan(j)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(p.contains("Generate explode"), p)
      assert(j.select($"pid", $"iid").as[(Long, Long)].collect().toSet
        == expected)
    }
  }

  test("mirror orientation and strict bounds hold") {
    withBin(4L) {
      // point side on the RIGHT of the join
      val m = intervals.join(points, $"v" >= $"lo" && $"v" <= $"hi")
      assert(!plan(m).contains("BroadcastNestedLoopJoin"))
      assert(m.select($"pid", $"iid").as[(Long, Long)].collect().toSet
        == expected)
      // strict bounds exclude the boundary match (1,10): v=3 < hi=5 ok,
      // but (2,11): lo=8 < 10 < 18 ok; drop pairs where v == lo or hi
      val s = points.join(intervals, $"v" > $"lo" && $"v" < $"hi")
      assert(!plan(s).contains("BroadcastNestedLoopJoin"))
      assert(s.select($"pid", $"iid").as[(Long, Long)].collect().toSet
        == expected) // no point sits exactly on a boundary in the fixture
    }
  }

  test("timestamp proximity join: within one hour after, banded on seconds") {
    withBin(3600L) {
      val errors = Seq((1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 13:30:00"))).toDF("err_id", "ets")
      val clicks = Seq(
        (101L, ts("2024-01-01 10:20:00")), // after err 1
        (102L, ts("2024-01-01 10:59:59")), // after err 1 (inside window)
        (103L, ts("2024-01-01 12:00:00")), // matches nothing
        (104L, ts("2024-01-01 14:00:00"))) // after err 2
        .toDF("click_id", "cts")
      val j = clicks.join(errors,
        $"cts" >= $"ets" && $"cts" <= $"ets" + expr("INTERVAL 1 HOUR"))
      assert(!plan(j).contains("BroadcastNestedLoopJoin"), plan(j))
      assert(j.select($"click_id", $"err_id").as[(Long, Long)].collect().toSet
        == Set((101L, 1L), (102L, 1L), (104L, 2L)))
    }
  }

  test("auto mode: literal-width interval rewrites with no conf set") {
    // same proximity join as above but NO binSize conf — the
    // `+ INTERVAL 1 HOUR` literal manifests the width, so the rule
    // self-selects binSize 3600
    val errors = Seq((1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 13:30:00"))).toDF("err_id", "ets")
    val clicks = Seq(
      (101L, ts("2024-01-01 10:20:00")),
      (102L, ts("2024-01-01 10:59:59")),
      (103L, ts("2024-01-01 12:00:00")),
      (104L, ts("2024-01-01 14:00:00"))).toDF("click_id", "cts")
    val j = clicks.join(errors,
      $"cts" >= $"ets" && $"cts" <= $"ets" + expr("INTERVAL 1 HOUR"))
    assert(!plan(j).contains("BroadcastNestedLoopJoin"), plan(j))
    assert(plan(j).contains("Generate explode"), plan(j))
    assert(j.select($"click_id", $"err_id").as[(Long, Long)].collect().toSet
      == Set((101L, 1L), (102L, 1L), (104L, 2L)))
    // integral flavor: the width literal sits in the condition itself
    // (a width computed in a Project below the join hides behind an
    // attribute and correctly stays dormant — manifest means manifest)
    val a = points.join(intervals, $"v" >= $"lo" && $"v" <= $"lo" + 5L)
    assert(!plan(a).contains("BroadcastNestedLoopJoin"), plan(a))
    assert(a.select($"pid", $"iid").as[(Long, Long)].collect().toSet
      == Set((1L, 10L), (2L, 11L), (2L, 13L))) // v in [lo, lo+5]
  }

  test("dormant without conf when width is not manifest; equi-keyed joins untouched") {
    // lo and hi are independent columns — no manifest width, no conf:
    // the rule must leave the BNLJ alone
    val j = points.join(intervals, $"v" >= $"lo" && $"v" <= $"hi")
    assert(plan(j).contains("BroadcastNestedLoopJoin"))
    assert(j.select($"pid", $"iid").as[(Long, Long)].collect().toSet
      == expected)
    withBin(5L) {
      val keyed = points.join(intervals,
        $"pid" === $"iid" - 9L && $"v" >= $"lo" && $"v" <= $"hi")
      assert(!plan(keyed).contains("Generate explode"), plan(keyed))
    }
  }
}
