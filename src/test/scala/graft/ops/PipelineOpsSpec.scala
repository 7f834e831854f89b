package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber equals the single-window row_number") {
    val df = (1L to 97L).map(i => (i, s"k${(i * 37) % 100}")).toDF("id", "key")
    val got = Windows.globalRowNumber(df, Seq($"key", $"id"), "pos", partitions = 5)
    val want = df.withColumn("pos",
      row_number().over(Window.orderBy($"key", $"id")).cast("long"))
    assert(rows(got.select($"id", $"pos")) == rows(want.select($"id", $"pos")))
  }

  test("profile counts rows/nulls/distincts/min/max per column in one pass") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (2L, null), (2L, "a"), (null, "a"), (3L, "c"))
      .toDF("num", "str")
    val got = Profiling.profile(df, Seq("num", "str"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("num") == ((5L, 1L, 3L, "1", "3")))
    assert(got("str") == ((5L, 1L, 3L, "a", "c")))
  }

  test("pageRank matches a driver-side integer simulation") {
    // star: a<->b, a<->c (a has outdeg 2; b, c feed a)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
      .toDF("src", "dst")
    val scale = 1000000000000L
    // independent reference: same integer recurrence, plain Scala
    def simulate(iters: Int): Map[String, Long] = {
      val out = Map("a" -> 2L, "b" -> 1L, "c" -> 1L)
      val es = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
      var r = Map("a" -> scale, "b" -> scale, "c" -> scale)
      (1 to iters).foreach { _ =>
        val in = es.groupBy(_._2).map { case (dst, g) =>
          dst -> g.map { case (src, _) => r(src) / out(src) }.sum
        }
        r = r.keys.map(n => n -> (15L * scale + 85L * in.getOrElse(n, 0L)) / 100L).toMap
      }
      r
    }
    val got = Graph.pageRank(edges, "src", "dst", iterations = 3, scale = scale)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == simulate(3))
    // cycle invariant: on a→b→c→a every rank stays exactly at scale
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val cyc = Graph.pageRank(cycle, "src", "dst", iterations = 2, scale = scale)
      .collect().map(_.getLong(1)).toSet
    assert(cyc == Set(scale))
  }
}
