package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date/time combinators (SURVEY.md §2.3, D1–D9). */
object TimeOps {

  /** D1 — compose a timestamp from date + hour + (possibly fractional)
    * minute (R/_pull_data.R:334: `date + hours(hour) + seconds(60*min)`).
    */
  def composeTimestamp(date: Column, hour: Column, minute: Column): Column =
    to_timestamp(date) + make_interval(lit(0), lit(0), lit(0), lit(0), lit(0),
      lit(0), hour * 3600 + minute * 60)

  /** D2 — floor a timestamp to a bucket width in seconds
    * (lubridate::floor_date(ts, "15 minutes"), R/_pull_data.R:346).
    * Pure arithmetic — stays in codegen, no window-struct detour.
    */
  def floorTs(ts: Column, widthSec: Long): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / widthSec) * widthSec)

  /** D3 — hour/day truncation (T-SQL DATEADD/DATEDIFF idiom,
    * R/_analyze_data.R:135-147).
    */
  def truncTs(ts: Column, unit: String): Column = date_trunc(unit, ts)

  /** D6 — time-of-day in seconds (data.table IDateTime itime,
    * R/_analyze_data.R:39-40) — the GAM's intra-day covariate.
    */
  def secondsOfDay(ts: Column): Column =
    (unix_timestamp(ts) - unix_timestamp(date_trunc("day", ts))).cast("int")

  /** D5 — weekday index with Sunday=1 (R weekdays() factor levels
    * Sun..Sat, R/_analyze_data.R:41-44).
    */
  def weekdaySunFirst(ts: Column): Column = dayofweek(ts)

  /** D7 — materialize a daily calendar as a single-column DataFrame
    * (`data_date`), the driver of backfill loops
    * (R/2) Write-Historical-SensorData-RunOnce.R:31-35). Uses
    * sequence+explode: one Generator, no driver-side loop.
    */
  def dateGrid(spark: SparkSession, lo: String, hi: String,
               colName: String = "data_date"): DataFrame =
    spark.range(1).select(
      explode(sequence(to_date(lit(lo)), to_date(lit(hi)),
        expr("interval 1 day"))).as(colName))

  /** D8 — hourly/daily timestamp scaffold between two timestamps
    * (prediction grid 2020→2030, R/_analyze_data.R:227-245).
    */
  def tsGrid(spark: SparkSession, lo: String, hi: String, step: String,
             colName: String = "ts"): DataFrame =
    spark.range(1).select(
      explode(sequence(to_timestamp(lit(lo)), to_timestamp(lit(hi)),
        expr(s"interval $step"))).as(colName))
}
