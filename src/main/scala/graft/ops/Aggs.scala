package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation combinators (SURVEY.md §2.4, A1–A9).
  *
  * All use hash aggregation with map-side partial aggregation — the only
  * shuffle is on the grouping keys, which is the minimum possible. At
  * 100 TB the fact table should be date-partitioned so the time-bucketed
  * variants scan only the needed partitions.
  */
object Aggs {

  /** Fraction of NULLs as a percentage, one decimal — the reference's
    * `*_PCT_NULL` columns (R/_pull_data.R:341-342).
    */
  def pctNull(c: Column): Column =
    Numeric.roundAway(avg(when(c.isNull, 1.0).otherwise(0.0)) * 100, 1)

  /** NA-skipping sum that returns 0 (not NULL) for all-NULL groups —
    * R's `sum(x, na.rm=TRUE)` is 0 on empty input while SQL SUM is NULL
    * (SURVEY.md §7 hazard 2). Kept as an explicit, tested decision.
    */
  def sumNaRm(c: Column): Column = coalesce(sum(c), lit(0))

  /** A1 — time-bucketed aggregation: group by `keys` + ts floored to
    * `widthSec`, apply `aggs`. The 15-minute sensor rollup
    * (R/_pull_data.R:336-348) is `timeBucketAgg(df, "ts", 900, ...)`.
    */
  def timeBucketAgg(df: DataFrame, tsCol: String, widthSec: Long,
                    keys: Seq[String], aggs: Seq[Column],
                    bucketName: String = "bucket_start"): DataFrame =
    df.withColumn(bucketName, TimeOps.floorTs(col(tsCol), widthSec))
      .groupBy((keys :+ bucketName).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** A3 — two-level rollup: inner groupBy at fine grain, outer groupBy at
    * coarse grain (detector→node, R/_analyze_data.R:121-154). Chained
    * hash aggregations; the second shuffle is on strictly fewer keys.
    */
  def twoLevelRollup(df: DataFrame,
                     innerKeys: Seq[String], innerAggs: Seq[Column],
                     outerKeys: Seq[String], outerAggs: Seq[Column]): DataFrame =
    df.groupBy(innerKeys.map(col): _*)
      .agg(innerAggs.head, innerAggs.tail: _*)
      .groupBy(outerKeys.map(col): _*)
      .agg(outerAggs.head, outerAggs.tail: _*)

  /** A6/A7 — append per-group count and exact median as columns (the
    * QAQC gauntlet appends, not collapses: R/_analyze_data.R:54-60).
    * Exact percentile, not approx — the oracle diff must be 0.
    */
  def withGroupCountMedian(df: DataFrame, keys: Seq[String], valueCol: String,
                           nCol: String = "n", medianCol: String = "med"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn(nCol, count(lit(1)).over(w))
      .withColumn(medianCol, expr(s"percentile($valueCol, 0.5)").over(w))
  }

  /** A8 — completeness admission filter (R/_analyze_data.R:62-73): keep
    * groups whose per-period row-completeness is >= `minPct` in EVERY
    * period. Returns the admitted key set (semi-join it back).
    */
  def completeKeys(df: DataFrame, keys: Seq[String], periodCol: String,
                   expectedPerPeriod: Column, minPct: Double): DataFrame =
    df.groupBy((keys :+ periodCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__pct", col("__n") / expectedPerPeriod)
      .groupBy(keys.map(col): _*)
      .agg(min(col("__pct")).as("__minpct"))
      .where(col("__minpct") >= minPct)
      .select(keys.map(col): _*)

  /** A9 — scalar max watermark (incremental driver,
    * R/4) Update-SensorData-Nightly.R:7).
    */
  def watermark(df: DataFrame, c: String): Option[java.sql.Date] = {
    val r = df.agg(max(col(c)).cast("date")).head()
    if (r.isNullAt(0)) None else Some(r.getDate(0))
  }

  /** Mergeable per-key aggregate STATE — incremental view maintenance,
    * the 100 TB generalization of the reference's watermark-incremental
    * nightly (re-aggregate only the new partition, fold it into the
    * stored rollup instead of recomputing history): cnt/sum/min/max are
    * all mergeable, so `mergeAggState(state(A), state(B)) ≡ state(A∪B)`
    * exactly — the invariant the spec and the q93 oracle assert.
    *
    * The sum is carried as DECIMAL(18,2)-exact (the input is 2-dp data;
    * decimal addition is associative, so merge order — and engine —
    * cannot change the result, unlike double sums). Expose the final
    * state with [[finishAggState]], which emits the portable double
    * view (sum/avg) of the exact decimal.
    */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Fold one state into another (either side may be a fresh batch's
    * state). One shuffle over the KEY SPACE (not the event volume) —
    * that asymmetry is the entire point at scale.
    */
  def mergeAggState(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b).groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Portable final view of an aggregate state: the exact decimal sum
    * cast once to double, and avg = sum/cnt as one IEEE division —
    * identical in any engine.
    */
  def finishAggState(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select((keys.map(col) :+ col("cnt") :+
      col("sum_v").cast("double").as("sum_v") :+
      (col("sum_v").cast("double") / col("cnt").cast("double")).as("avg_v") :+
      col("min_v") :+ col("max_v")): _*)

  /** EXACT W-day rolling distinct count — "7-day active users" — with
    * bounded fan-out instead of the quadratic day×activity range join.
    *
    * `count(DISTINCT key)` over a sliding date window is not
    * decomposable (daily distinct counts don't sum), and the naive
    * form joins every day of the grid against every activity row in
    * its window: O(days × activity) shuffled rows, a scale-killer the
    * moment the grid is long. The exact identity that fixes it: key k
    * is active on day d iff k has an activity day in (d−W, d], i.e.
    * iff d falls in [a, a+W−1] for some activity day a of k. Between
    * consecutive distinct activity days a_i < a_{i+1} those intervals
    * overlap exactly when a_{i+1} − a_i < W, so clipping each interval
    * at the NEXT activity day — [a_i, min(a_i+W−1, a_{i+1}−1)] — makes
    * the per-key cover disjoint while preserving its union. Each
    * activity day then explodes into ≤ W contribution days, and a plain
    * `count(*)` per day IS the distinct count: disjointness guarantees
    * every key contributes at most one row per day.
    *
    * Scale shape: one shuffle to distinct (key, day), one key-partition
    * window for `lead`, a ≤ W-row explode, and a partial-agg count by
    * day. The day grid (min..max activity day, zero-active days kept)
    * is a 1-row-agg broadcast — nothing corpus-sized crosses it.
    */
  def rollingDistinct(df: DataFrame, dateCol: Column, keyCol: Column,
                      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val ud = df.select(dateCol.as("__d"), keyCol.as("__k"))
      .where(col("__d").isNotNull && col("__k").isNotNull)
      .distinct()
    val nxt = lead(col("__d"), 1).over(
      Window.partitionBy(col("__k")).orderBy(col("__d")))
    val contrib = ud
      .withColumn("__end", least(date_add(col("__d"), windowDays - 1),
        coalesce(date_sub(nxt, 1), date_add(col("__d"), windowDays - 1))))
      .select(explode(sequence(col("__d"), col("__end"))).as("day"))
    val counts = contrib.groupBy(col("day")).agg(count(lit(1)).as("active"))
    val grid = ud.agg(min(col("__d")).as("__lo"), max(col("__d")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("day"))
    grid.join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("active"), lit(0L)).as("active"))
  }
}
