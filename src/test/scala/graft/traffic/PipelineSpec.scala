package graft.traffic

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** End-to-end pull-pipeline test on a generated 30-sec fixture
  * (FIXTURES.md A1 edge cases: complete day, partially-missing day,
  * all-null day, missing history) with hand-computed golden values.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  // 2 sensors × 16 days of 30-sec readings (2,880 rows per sensor-day).
  // sensor 100: always complete: volume 5, occupancy 300 per 30-s slot.
  // sensor 200: like 100 except
  //   - day 3 (Jan 3): ENTIRE day NULL → P16 drops it;
  //   - day 12 (Jan 12) 10:00–11:15 (5 buckets): all slots NULL → the
  //     middle bucket (10:30) has an all-NULL ±2 window → history fill
  //     from day−7 = Jan 5 (complete; day−14 predates the fixture —
  //     P14's NULL-skipping mean uses the one side that exists);
  //   - day 12 12:00 bucket: every other slot NULL → scale-up impute.
  private lazy val raw: DataFrame = {
    val rows = for {
      sensor <- Seq("100", "200")
      day <- 1 to 16
      slot <- 0 until 2880
    } yield {
      val hour = slot / 120
      val min = (slot % 120) / 2.0
      val inNullDay = sensor == "200" && day == 3
      val inNullRun = sensor == "200" && day == 12 && {
        val m = hour * 60 + min; m >= 600 && m < 675 // 10:00–11:15
      }
      val inHalfBucket = sensor == "200" && day == 12 && hour == 12 &&
        min < 15 && (slot % 2 == 0) // every other slot of 12:00 bucket
      val v: Option[Int] =
        if (inNullDay || inNullRun || inHalfBucket) None else Some(5)
      val o: Option[Int] =
        if (inNullDay || inNullRun || inHalfBucket) None else Some(300)
      (sensor, java.sql.Date.valueOf(f"2020-01-$day%02d"), hour, min, v, o)
    }
    rows.toDF("sensor", "date", "hour", "min", "volume", "occupancy")
  }

  private lazy val config = Seq(
    ("100", 500.0, "N1", "I-94", d("2019-01-01"), d("2100-01-01")),
    ("200", 500.0, "N1", "I-94", d("2019-01-01"), d("2100-01-01")))
    .toDF("DETECTOR_NAME", "DETECTOR_FIELD", "NODE_NAME", "CORRIDOR_ROUTE",
      "START_DATE", "END_DATE")

  private lazy val fact = SensorIngest.build(raw, config).cache()

  test("complete bucket: golden sums, pct_null, speed (A1/A2/P12)") {
    val r = fact.where($"DETECTOR_NAME" === "100" &&
      $"START_DATETIME" === ts("2020-01-05 08:00:00")).head()
    assert(r.getAs[Int]("VOLUME_SUM") == 150)           // 30 slots × 5
    assert(r.getAs[Double]("VOLUME_PCT_NULL") == 0.0)
    assert(r.getAs[Int]("VOLUME_SUM_IMPUTE") == 150)
    assert(r.getAs[Int]("OCCUPANCY_SUM") == 9000)       // 30 × 300
    // speed = 150*2*500/(5280 * 9000/54000) = 150000/880 = 170.45 → 170.5
    assert(r.getAs[Double]("SPEED") == 170.5)
    assert(r.getAs[String]("NODE_NAME") == "N1")
  }

  test("all-null day dropped entirely (P16/S4 path)") {
    assert(fact.where($"DETECTOR_NAME" === "200" &&
      $"START_DATE" === d("2020-01-03")).count() == 0)
    // complete sensor keeps all 96 buckets that day
    assert(fact.where($"DETECTOR_NAME" === "100" &&
      $"START_DATE" === d("2020-01-03")).count() == 96)
  }

  test("half-null bucket scale-up imputes (P13)") {
    val r = fact.where($"DETECTOR_NAME" === "200" &&
      $"START_DATETIME" === ts("2020-01-12 12:00:00")).head()
    assert(r.getAs[Double]("VOLUME_PCT_NULL") == 50.0)
    assert(r.getAs[Int]("VOLUME_SUM") == 75)       // 15 non-null × 5
    assert(r.getAs[Int]("VOLUME_SUM_IMPUTE") == 150) // 75/(1-0.5)
  }

  test("all-null bucket at run edge filled by rolling mean (W1/W2)") {
    // 10:00 bucket: window = 09:30,09:45,(null),10:15,10:30 → mean of
    // 150,150 (neighbors null too → only 09:30/09:45 non-null) = 150
    val r = fact.where($"DETECTOR_NAME" === "200" &&
      $"START_DATETIME" === ts("2020-01-12 10:00:00")).head()
    assert(r.getAs[Double]("VOLUME_PCT_NULL") == 100.0)
    assert(r.getAs[Int]("VOLUME_SUM_IMPUTE") == 150)
  }

  test("mid-run bucket (±2 window all null) filled from day−7/day−14 (J9/P14)") {
    val r = fact.where($"DETECTOR_NAME" === "200" &&
      $"START_DATETIME" === ts("2020-01-12 10:30:00")).head()
    // day−7 = Jan 5 10:30 = 150; day−14 = 2019-12-29 absent → P14's
    // NULL-skipping mean takes the one existing side: 150
    assert(r.getAs[Int]("VOLUME_SUM_IMPUTE") == 150)
  }

  test("node rollup + DETECTOR_NUM + QAQC test 1 (A3/A4/J10/A5)") {
    val nodeHour = Rollup.withDetectorNum(
      Rollup.nodeAggregate(fact, "hour"), Rollup.configNode(config))
    val r = nodeHour.where($"START_DATETIME" === ts("2020-01-05 08:00:00")).head()
    assert(r.getAs[Long]("VOLUME_SUM_IMPUTE") == 2 * 4 * 150) // 2 det × 4 buckets
    assert(r.getAs[Long]("VOLUME_NUM") == 2)
    assert(r.getAs[Long]("DETECTOR_NUM") == 2)
    // Jan 3: only sensor 100 reports → VOLUME_NUM=1 ≠ DETECTOR_NUM=2 →
    // QAQC test 1 drops those hours
    val q = Rollup.qaqc(nodeHour, scale = 1)
    assert(q.where(to_date($"START_DATETIME") === d("2020-01-03")).count() == 0)
    assert(q.where(to_date($"START_DATETIME") === d("2020-01-05")).count() == 24)
  }

  test("daily rollup + QAQC completeness gate (A3 day grain, test 3)") {
    val nodeDay = Rollup.withDetectorNum(
      Rollup.nodeAggregate(fact, "day"), Rollup.configNode(config))
    // day grain: one row per node-day; complete days sum 2 det × 96 × 150
    val r = nodeDay.where($"START_DATETIME" === ts("2020-01-05 00:00:00")).head()
    assert(r.getAs[Long]("VOLUME_SUM_IMPUTE") == 2L * 96 * 150)
    // full gauntlet on the 16-day fixture: test 2's >100-row floor and
    // test 3's 75%-of-365 completeness both reject → empty
    val strict = Rollup.qaqc(nodeDay, scale = 24, years = Seq(2020))
    assert(strict.count() == 0)
    // test 3 in isolation (A8): at 75% the 16-day year is incomplete;
    // just under the fixture's own ratio it admits the node
    def complete(minPct: Double) = graft.ops.Aggs.completeKeys(
      nodeDay.withColumn("__y", year($"START_DATETIME")),
      Seq("NODE_NAME"), "__y", lit(365.0), minPct)
    assert(complete(0.75).count() == 0)
    assert(rows(complete(16.0 / 365 - 0.01)) == Seq(Seq("N1")))
  }

  test("compare: actual vs predicted with VOLUME_DIFF (J11/P15 + M2/M4)") {
    val nodeHour = Rollup.withDetectorNum(
      Rollup.nodeAggregate(fact, "hour"), Rollup.configNode(config))
    val preds = Compare.predictions(nodeHour, hourly = true,
      "2020-01-15 00:00:00", "2020-01-16 23:00:00",
      graft.model.Gam.Config(hourly = true, negBin = false, minRows = 50))
    val diff = Compare.volumeDiff(nodeHour, preds)
    assert(diff.count() == 48)
    // constant signal 1200/hour: a sane fit predicts within 10%
    val worst = diff.select(max(abs($"VOLUME_DIFF"))).head().getLong(0)
    assert(worst <= 120, s"worst diff $worst")
    assert(diff.columns.contains("VOLUMN_PREDICTION")) // contract spelling
  }
}
