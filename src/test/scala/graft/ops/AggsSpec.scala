package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggsSpec extends SparkSpec {
  import spark.implicits._

  test("pctNull is percentage of NULLs, 1 dp (A1)") {
    val df = Seq[Option[Double]](Some(1), None, None).toDF("v")
    val out = df.agg(Aggs.pctNull($"v").as("p")).as[Double].head()
    assert(out == 66.7)
  }

  test("sumNaRm returns 0 for all-NULL group — R sum(na.rm=T) parity") {
    val df = Seq[Option[Double]](None, None).toDF("v")
    assert(df.agg(Aggs.sumNaRm($"v")).head().getDouble(0) == 0.0)
  }

  test("timeBucketAgg floors to width and aggregates (A1/D2)") {
    val df = Seq(
      ("s1", ts("2020-01-01 00:07:30"), 2),
      ("s1", ts("2020-01-01 00:14:59"), 3),
      ("s1", ts("2020-01-01 00:15:00"), 5)).toDF("sensor", "t", "v")
    val out = Aggs.timeBucketAgg(df, "t", 900, Seq("sensor"),
      Seq(sum($"v").as("v")))
    assert(rows(out.select($"bucket_start", $"v")) == Seq(
      Seq(ts("2020-01-01 00:00:00"), 5L),
      Seq(ts("2020-01-01 00:15:00"), 5L)))
  }

  test("twoLevelRollup chains fine→coarse aggregation (A3/A5)") {
    val df = Seq(("d1", "n1", 1), ("d1", "n1", 2), ("d2", "n1", 10)).toDF("det", "node", "v")
    val out = Aggs.twoLevelRollup(df,
      Seq("det", "node"), Seq(sum($"v").as("v")),
      Seq("node"), Seq(sum($"v").as("v_sum"), count($"v").as("n_det")))
    assert(rows(out) == Seq(Seq("n1", 13L, 2L)))
  }

  test("withGroupCountMedian appends n and exact median (A6/A7)") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("a", 100.0), ("b", 7.0)).toDF("g", "v")
    val out = Aggs.withGroupCountMedian(df, Seq("g"), "v")
    // rows() sorts lexicographically on the row string → "100.0" < "3.0"
    assert(rows(out) == Seq(
      Seq("a", 1.0, 3L, 3.0), Seq("a", 100.0, 3L, 3.0), Seq("a", 3.0, 3L, 3.0),
      Seq("b", 7.0, 1L, 7.0)))
  }

  test("completeKeys keeps keys complete in EVERY period (A8)") {
    // expected 2/period, min ratio 0.75: u1 has (2,2) → min 1.0 keep;
    // u2 has (2,1) → min 0.5 drop.
    val df = Seq(
      ("u1", "p1"), ("u1", "p1"), ("u1", "p2"), ("u1", "p2"),
      ("u2", "p1"), ("u2", "p1"), ("u2", "p2")).toDF("u", "p")
    val out = Aggs.completeKeys(df, Seq("u"), "p", lit(2.0), 0.75)
    assert(rows(out) == Seq(Seq("u1")))
  }

  test("watermark returns max date; None on empty (A9)") {
    val df = Seq(d("2020-01-03"), d("2020-01-07")).toDF("dt")
    assert(Aggs.watermark(df, "dt").contains(d("2020-01-07")))
    assert(Aggs.watermark(df.where(lit(false)), "dt").isEmpty)
  }

  test("approx_percentile sketch tracks the exact percentile (q58's scale path)") {
    val df = (1 to 20000).map(i => ("g", (i % 1000).toDouble)).toDF("g", "v")
    val r = df.groupBy($"g").agg(
      expr("percentile(v, 0.5)").as("exact"),
      expr("approx_percentile(v, 0.5, 10000)").as("approx")).head()
    val (exact, approx) = (r.getDouble(1), r.getDouble(2))
    assert(math.abs(approx - exact) <= 1.0 + exact * 0.01,
      s"exact=$exact approx=$approx")
  }

  // The two rows-only sketch queries, pinned against their exact twins
  // on the driver's correctness-scale fixture: q58's sketch values must
  // sit inside exact percentile brackets at ±0.001 rank (documented
  // rank error for accuracy=10000 is 1e-4 — 10× slack), and q74's HLL
  // counts within 5× the requested 2% relative standard deviation.
  // Both sketches are deterministic for fixed input, so these are hard
  // gates, not flaky statistical ones.

  test("q58 approx percentiles sit inside exact rank brackets (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    val approx = graft.queries.Registry
      .queries("q58_approx_quantiles")(spark, dir)
    val brackets = graft.core.Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(expr("percentile(value, array(0.249, 0.251, 0.499, 0.501, " +
        "0.989, 0.991))").as("br"))
    val joined = approx.join(brackets, Seq("event_type")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val br = r.getSeq[Double](r.fieldIndex("br"))
      def in(v: Double, lo: Double, hi: Double, tag: String): Unit =
        assert(v >= lo - 1e-6 && v <= hi + 1e-6,
          s"${r.getString(0)} $tag=$v outside [$lo, $hi]")
      in(r.getDouble(r.fieldIndex("p25")), br(0), br(1), "p25")
      in(r.getDouble(r.fieldIndex("p50")), br(2), br(3), "p50")
      in(r.getDouble(r.fieldIndex("p99")), br(4), br(5), "p99")
    }
  }

  test("q74 HLL distinct counts within 5x rsd of exact q73 (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    val exact = graft.queries.Registry
      .queries("q73_distinct_exact")(spark, dir)
      .select($"event_type", $"n_users".as("exact"))
    val approx = graft.queries.Registry
      .queries("q74_approx_distinct")(spark, dir)
      .select($"event_type", $"n_users_approx".as("approx"))
    val joined = exact.join(approx, Seq("event_type")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (ex, ap) = (r.getLong(1), r.getLong(2))
      assert(math.abs(ap - ex) <= math.max(1.0, 0.10 * ex),
        s"${r.getString(0)}: exact=$ex approx=$ap exceeds 10% bound")
    }
  }
}
