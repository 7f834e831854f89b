package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("intervalJoin: equi key + point-in-range, inner (J10)") {
    val fact = Seq(("n1", d("2020-01-05"), 10), ("n1", d("2020-02-05"), 20),
      ("n2", d("2020-01-05"), 30)).toDF("node", "dt", "v")
    val dim = Seq(("n1", d("2020-01-01"), d("2020-01-31"), 5))
      .toDF("node", "lo", "hi", "lanes")
    val out = Joins.intervalJoin(fact, dim, Seq("node"),
      point = fact("dt"), lo = dim("lo"), hi = dim("hi"))
    assert(rows(out.select("node", "v", "lanes")) == Seq(Seq("n1", 10, 5)))
  }

  test("intervalJoin with overlapping versions yields one row per match (J10)") {
    val fact = Seq(("n1", d("2020-01-05"), 1)).toDF("node", "dt", "v")
    val dim = Seq(("n1", d("2020-01-01"), d("2020-01-10"), 1),
      ("n1", d("2020-01-04"), d("2020-01-06"), 2)).toDF("node", "lo", "hi", "ver")
    val out = Joins.intervalJoin(fact, dim, Seq("node"),
      fact("dt"), dim("lo"), dim("hi"))
    assert(out.count() == 2)
  }

  test("lagJoin attaches value from lagSec earlier; missing → NULL (J9)") {
    val df = Seq(
      ("s1", ts("2020-01-08 00:00:00"), 10.0),
      ("s1", ts("2020-01-01 00:00:00"), 7.0),
      ("s1", ts("2020-01-09 00:00:00"), 99.0)).toDF("s", "t", "v")
    val out = Joins.lagJoin(df, Seq("s"), "t", 7L * 86400, Seq("v"), "_prev")
    val got = out.select($"t", $"v_prev").collect()
      .map(r => (r.getTimestamp(0), Option(r.get(1)))).toMap
    assert(got(ts("2020-01-08 00:00:00")) == Some(7.0))
    assert(got(ts("2020-01-09 00:00:00")).isEmpty) // no -7d history
    assert(got(ts("2020-01-01 00:00:00")).isEmpty)
  }

  test("expandValidDates filters grid to validity window (J4)") {
    val dates = TimeOps.dateGrid(spark, "2020-01-01", "2020-01-10")
    val dim = Seq(("x", d("2020-01-03"), d("2020-01-05"))).toDF("k", "from", "to")
    val out = Joins.expandValidDates(dates, dim, "data_date", "from", "to")
    assert(out.count() == 3)
  }

  test("asofJoin: latest right row at-or-before each left ts, per key; " +
    "unmatched left keeps NULLs; ties match") {
    val left = Seq(
      ("u1", ts("2020-01-01 10:00:00"), "p1"),
      ("u1", ts("2020-01-01 12:00:00"), "p2"),
      ("u1", ts("2020-01-01 09:00:00"), "p0"), // before any right row
      ("u2", ts("2020-01-01 10:30:00"), "p3")) // tie with right ts
      .toDF("k", "t", "tag")
    val right = Seq(
      ("u1", ts("2020-01-01 09:30:00"), 100L),
      ("u1", ts("2020-01-01 11:59:00"), 101L),
      ("u2", ts("2020-01-01 10:30:00"), 200L))
      .toDF("k", "t", "rid")
    val out = Joins.asofJoin(left, right, Seq("k"), "t", "t", Seq("rid"))
      .select($"tag", $"asof_rid").collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out("p0").isEmpty)        // nothing at-or-before
    assert(out("p1").contains(100L)) // 09:30 is latest ≤ 10:00
    assert(out("p2").contains(101L)) // 11:59 beats 09:30
    assert(out("p3").contains(200L)) // equal ts matches
  }

  test("asofJoin NULL semantics: NULL keys and NULL right ts never match " +
    "(SQL ASOF equality parity)") {
    val left = Seq(
      (Option("u1"), Option(ts("2020-01-01 10:00:00")), "ok"),
      (Option.empty[String], Option(ts("2020-01-01 10:00:00")), "nullkey"),
      (Option("u1"), Option.empty[java.sql.Timestamp], "nullts"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (Option("u1"), Option(ts("2020-01-01 09:00:00")), 1L),
      (Option.empty[String], Option(ts("2020-01-01 09:00:00")), 2L), // NULL key: inert
      (Option("u1"), Option.empty[java.sql.Timestamp], 3L))          // NULL ts: inert
      .toDF("k", "t", "rid")
    val out = Joins.asofJoin(left, right, Seq("k"), "t", "t", Seq("rid"))
      .select($"tag", $"asof_rid").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("ok").contains(1L))  // matches the real row, not the NULL-ts one
    assert(out("nullkey").isEmpty)  // NULL key joins nothing
    assert(out("nullts").isEmpty)   // NULL left ts is before everything
  }

  test("newKeys = anti join (J5); semiFilter = semi join (J12)") {
    val newDf = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val oldDf = Seq(("a", 9)).toDF("k", "v")
    assert(rows(Joins.newKeys(newDf, oldDf, "k")) == Seq(Seq("b", 2)))
    assert(rows(Joins.semiFilter(newDf, oldDf.select("k"), Seq("k"))) ==
      Seq(Seq("a", 1)))
  }

  test("bandJoin equals the naive |a-b| <= eps filter, incl. boundaries " +
    "and negatives") {
    val l = Seq((1L, -3.0), (2L, 0.0), (3L, 2.5), (4L, 10.0))
      .toDF("id_l", "va")
    val r = Seq((10L, -3.5), (11L, -0.49), (12L, 0.5), (13L, 3.0), (14L, 9.4))
      .toDF("id_r", "vb")
    val eps = 0.5
    val got = rows(Joins.bandJoin(l, r, "va", "vb", eps)
      .select($"id_l", $"id_r"))
    val want = rows(l.crossJoin(r)
      .where(abs($"va" - $"vb") <= eps)
      .select($"id_l", $"id_r"))
    assert(want.nonEmpty && got == want)
    // boundary pairs ARE present: |-3.0 - -3.5| == eps, |2.5 - 3.0| == eps
    assert(got.contains(Seq(1L, 10L)) && got.contains(Seq(3L, 13L)))
  }

  test("datePruneFromDim: prunes to the dim's dates; over-guard is identity") {
    val fact = Seq((d("2020-01-01"), 1), (d("2020-01-02"), 2),
      (d("2020-01-03"), 3), (d("2020-02-01"), 4)).toDF("dt", "v")
    val dim = Seq((d("2020-01-02"), "x"), (d("2020-01-03"), "y"),
      (d("2020-01-03"), "z")).toDF("dt", "tag")
    val pruned = Joins.datePruneFromDim(fact, "dt", dim, $"dt")
    assert(rows(pruned.select($"v")) == rows(fact.where(
      $"dt".isin(d("2020-01-02"), d("2020-01-03"))).select($"v")))
    // pruning is an optimization: past the guard the fact is UNFILTERED
    val huge = Joins.datePruneFromDim(fact, "dt", dim, $"dt", maxDates = 1)
    assert(rows(huge.select($"v")) == rows(fact.select($"v")))
    // null dim dates never poison the IN list
    val withNull = dim.union(Seq((null.asInstanceOf[java.sql.Date], "n"))
      .toDF("dt", "tag"))
    assert(Joins.datePruneFromDim(fact, "dt", withNull, $"dt").count() == 2)
  }

  test("datePruneFromIntervals: covers interior dates; guards degrade to unpruned") {
    val fact = Seq((d("2020-01-01"), 1), (d("2020-01-02"), 2),
      (d("2020-01-03"), 3), (d("2020-02-01"), 4)).toDF("dt", "v")
    // the round-10 advice scenario: 01-02 appears in NO dim column,
    // only INSIDE the interval — enumeration-based pruning would drop
    // that fact row; interval expansion must keep it
    val dim = Seq((d("2020-01-01"), d("2020-01-03"))).toDF("lo", "hi")
    val pruned = Joins.datePruneFromIntervals(fact, "dt", dim, $"lo", $"hi")
    assert(rows(pruned.select($"v")) == Seq(Seq(1), Seq(2), Seq(3)))
    // span pre-guard: an open-ended validity sentinel degrades to the
    // unpruned fact BEFORE any explode materializes megarows
    val open = Seq((d("2020-01-01"), d("9999-12-31"))).toDF("lo", "hi")
    assert(rows(Joins.datePruneFromIntervals(fact, "dt", open, $"lo", $"hi")
      .select($"v")) == rows(fact.select($"v")))
    // malformed/NULL intervals can't match under BETWEEN and are
    // excluded; a dim with NO valid interval degrades to unpruned
    val bad = Seq((d("2020-01-02"), d("2020-01-01")),
      (null.asInstanceOf[java.sql.Date], d("2020-01-05"))).toDF("lo", "hi")
    assert(Joins.datePruneFromIntervals(fact, "dt", bad, $"lo", $"hi")
      .count() == 4)
    // overlap dedups: two overlapping intervals still prune exactly
    val overlap = Seq((d("2020-01-01"), d("2020-01-02")),
      (d("2020-01-02"), d("2020-01-03"))).toDF("lo", "hi")
    assert(rows(Joins.datePruneFromIntervals(fact, "dt", overlap, $"lo", $"hi")
      .select($"v")) == Seq(Seq(1), Seq(2), Seq(3)))
  }
}
