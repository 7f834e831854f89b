package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowsTimeSpec extends SparkSpec {
  import spark.implicits._

  test("centeredRollingMean: edge slots NULL, interior NULLs skipped (W1)") {
    // width 5 (k=2) over 7 slots; slot 3 is NULL.
    val df = (1 to 7).map(i =>
      ("s", i, if (i == 3) None else Some(i.toDouble))).toDF("s", "i", "v")
    val out = Windows.centeredRollingMean(df, Seq("s"), "i", "v", 2, "roll")
      .orderBy("i").select($"roll").as[Option[Double]].collect().toSeq
    // slots 1,2,6,7 → incomplete window → NULL (frollapply edge semantics)
    assert(out(0).isEmpty && out(1).isEmpty && out(5).isEmpty && out(6).isEmpty)
    // slot 3: mean(1,2,4,5) = 3.0 (its own NULL skipped)
    assert(out(2).contains(3.0))
    // slot 4: mean(2,4,5,6) = 4.25
    assert(out(3).contains(4.25))
    // slot 5: mean(4,5,6,7)... window rows 3..7, NULL at 3 → mean(4,5,6,7)=5.5
    assert(out(4).contains(5.5))
  }

  test("fillFrom fills NULLs only (W2)") {
    val df = Seq((Some(9.0), 1.4), (None, 1.4)).toDF("v", "fill")
    val out = Windows.fillFrom(df, "v", "fill", "v2", roundTo = Some(0))
    assert(out.select($"v2").as[Double].collect().toSeq == Seq(9.0, 1.0))
  }

  test("fillFrom rounding follows the explicit engine parity (W2 + Numeric policy)") {
    val df = Seq((Option.empty[Double], 2.5), (None, 3.5), (None, -2.5)).toDF("v", "fill")
    def got(p: Numeric.Parity): Seq[Double] =
      Windows.fillFrom(df, "v", "fill", "v2", roundTo = Some(0), parity = p)
        .select($"v2").as[Double].collect().toSeq
    assert(got(Numeric.RParity) == Seq(2.0, 4.0, -2.0))      // banker's (R round)
    assert(got(Numeric.OracleParity) == Seq(3.0, 4.0, -3.0)) // half-away (DuckDB)
    assert(got(Numeric.SparkParity) == Seq(3.0, 4.0, -3.0))  // HALF_UP on 2.5 exact
  }

  test("interpolateLinear: interior gaps interpolate by row position; " +
    "edges stay NULL; keys isolated") {
    val df = Seq(
      ("a", 1, Some(10.0)), ("a", 2, None), ("a", 3, None), ("a", 4, Some(40.0)),
      ("a", 5, None), // trailing → NULL
      ("b", 1, None), // leading → NULL
      ("b", 2, Some(7.0))).toDF("k", "i", "v")
    val out = Windows.interpolateLinear(df, Seq("k"), Seq("i"), "v", "vi")
      .select($"k", $"i", $"vi").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> Option(r.get(2))).toMap
    assert(out(("a", 2)).contains(20.0) && out(("a", 3)).contains(30.0))
    assert(out(("a", 1)).contains(10.0) && out(("a", 4)).contains(40.0))
    assert(out(("a", 5)).isEmpty && out(("b", 1)).isEmpty)
    assert(out(("b", 2)).contains(7.0))
  }

  test("composeTimestamp handles fractional minutes (D1)") {
    val df = Seq((d("2020-01-01"), 13, 59.5)).toDF("dt", "h", "m")
    val out = df.select(TimeOps.composeTimestamp($"dt", $"h", $"m").as("t"))
    assert(out.head().getTimestamp(0) == ts("2020-01-01 13:59:30"))
  }

  test("floorTs floors to bucket width (D2)") {
    val df = Seq(ts("2020-01-01 00:14:59")).toDF("t")
    assert(df.select(TimeOps.floorTs($"t", 900)).head().getTimestamp(0) ==
      ts("2020-01-01 00:00:00"))
  }

  test("secondsOfDay (D6) and weekdaySunFirst (D5)") {
    val df = Seq(ts("2020-01-01 01:02:03")).toDF("t") // 2020-01-01 = Wednesday
    val r = df.select(TimeOps.secondsOfDay($"t"), TimeOps.weekdaySunFirst($"t")).head()
    assert(r.getInt(0) == 3723)
    assert(r.getInt(1) == 4) // Sun=1 … Wed=4
  }

  test("dateGrid and tsGrid produce inclusive sequences (D7/D8)") {
    assert(TimeOps.dateGrid(spark, "2020-01-01", "2020-01-31").count() == 31)
    assert(TimeOps.tsGrid(spark, "2020-01-01 00:00:00", "2020-01-02 00:00:00",
      "1 hour").count() == 25)
  }

  test("roundAway: half-away-from-zero on scaled double") {
    val df = Seq(2.5, -2.5, 2.44999, 38.75125).toDF("v")
    val out = df.select(Numeric.roundAway($"v", 0).as("r0"),
      Numeric.roundAway($"v", 1).as("r1")).collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(3.0, -3.0, 2.0, 39.0))
    assert(out.map(_.getDouble(1)).toSeq == Seq(2.5, -2.5, 2.4, 38.8))
  }
}
