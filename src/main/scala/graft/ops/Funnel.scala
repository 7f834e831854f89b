package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how many users performed step 1, then step
  * 2 STRICTLY AFTER their first step 1, then step 3 after that, … —
  * the conversion query behind every product/ads dashboard, and (for a
  * training-data pipeline) the event-sequence integrity check on
  * interaction logs.
  *
  * Semantics: per user, t₁ = min ts of step 1; tᵢ = min ts of step i
  * with ts > tᵢ₋₁. A user converts through step i iff tᵢ exists.
  * Same-instant events do NOT advance the funnel (strict >) — ties are
  * decided the same way in every engine, no ordering ambiguity.
  *
  * Scale shape: one filtered groupBy per step, every shuffle keyed on
  * the user column (the step-i join and its aggregation co-partition);
  * the per-step frames are narrow (user, ts). No windows over the raw
  * event stream, no per-user event arrays. The summary is
  * `steps.length` one-row aggregates unioned, with conversion ratios
  * computed over that ≤ steps-row frame.
  */
object Funnel {

  /** Returns one row per step: (step 1-based, step_name, n_users,
    * conv_from_first_ppm, conv_from_prev_ppm) with exact integer-ppm
    * ratios (step 1 reports 1e6 for both).
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val evs = events.select(col(userCol).as("__u"), col(typeCol).as("__ty"),
      col(tsCol).as("__ts"))
      .where(col("__u").isNotNull && col("__ts").isNotNull)
    // fold: per-user first-reach time of each step, gated on the prior step
    val stageTimes: Seq[DataFrame] = steps.zipWithIndex
      .foldLeft(Seq.empty[DataFrame]) { case (acc, (step, i)) =>
        val mine = evs.where(col("__ty") === step)
        val gated =
          if (i == 0) mine
          else mine.join(acc.last.select(col("__u"), col("__t").as("__tprev")),
              Seq("__u"))
            .where(col("__ts") > col("__tprev"))
        acc :+ gated.groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
          .transform(graft.core.Checkpoints.sessionCk) // each stage feeds the next AND its count
      }
    val counts = stageTimes.zip(steps).zipWithIndex.map {
      case ((st, name), i) =>
        st.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"), lit(name).as("step_name"),
            col("n_users"))
    }.reduce(_ unionByName _)
    // <= steps rows: single-task windows are fine by construction
    val w = Window.orderBy(col("step"))
    counts
      .withColumn("__first", first(col("n_users")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__prev", lag(col("n_users"), 1).over(w))
      .select(col("step"), col("step_name"), col("n_users"),
        when(col("__first") === 0L, lit(0L))
          .otherwise(expr("n_users * 1000000 div __first"))
          .as("conv_from_first_ppm"),
        when(coalesce(col("__prev"), col("n_users")) === 0L, lit(0L))
          .otherwise(expr("n_users * 1000000 div coalesce(__prev, n_users)"))
          .as("conv_from_prev_ppm"))
  }

  /** Time-to-convert distribution: among users who completed the
    * two-step funnel (first `fromEvent`, then first `toEvent` strictly
    * after it — the [[funnel]] gating), the per-quantile latency in
    * seconds. The "how long does view→purchase take" table behind
    * attribution windows and abandonment alarms.
    *
    * Exact interpolated percentiles over exact integer second deltas —
    * engine-reproducible end to end. Scale shape: two user-keyed
    * aggregations (co-partitioned), one bounded percentile rollup.
    */
  def timeToConvert(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, fromEvent: String, toEvent: String,
                    quantiles: Seq[Double]): DataFrame = {
    require(quantiles.nonEmpty, "timeToConvert needs quantiles")
    val evs = events.select(col(userCol).as("__u"), col(typeCol).as("__ty"),
        col(tsCol).as("__ts"))
      .where(col("__u").isNotNull && col("__ts").isNotNull)
    val entered = evs.where(col("__ty") === fromEvent)
      .groupBy(col("__u")).agg(min(col("__ts")).as("__t0"))
    val converted = evs.where(col("__ty") === toEvent)
      .join(entered, Seq("__u"))
      .where(col("__ts") > col("__t0"))
      .groupBy(col("__u")).agg(min(col("__ts")).as("__t1"),
        first(col("__t0")).as("__t0"))
      .select(col("__u"),
        (unix_timestamp(col("__t1")) - unix_timestamp(col("__t0")))
          .as("__delta_s"))
    converted
      .agg(count(lit(1)).as("n_converters"),
        percentile(col("__delta_s"),
          typedLit(quantiles.toArray)).as("__ls"))
      .select(col("n_converters"),
        posexplode(col("__ls")).as(Seq("__i", "latency_seconds")))
      .select(element_at(typedLit(quantiles.toArray), col("__i") + 1)
          .as("quantile"),
        col("n_converters"), col("latency_seconds"))
  }

  /** Cohort retention matrix: users are cohorted by the week of their
    * FIRST `cohortEvent`; a cohort member counts as retained in week k
    * if they have ANY event in the k-th week at or after their cohort
    * week. Returns (cohort_week, week_k, n_active, n_cohort,
    * retention_ppm) — the standard retention triangle, in exact
    * date/integer arithmetic (week = Monday-start `date_trunc`, the
    * same rule in Spark and the C-family engines).
    *
    * Scale shape: cohort assignment is one user-keyed aggregation; the
    * activity join is user-keyed and co-partitions with it; the
    * (user, k) distinct and the (cohort, k) rollup reduce behind
    * partial aggregations. Nothing ever shuffles wider than
    * (user, week) pairs.
    */
  def retention(events: DataFrame, userCol: String, typeCol: String,
                tsCol: String, cohortEvent: String): DataFrame = {
    val evs = events.select(col(userCol).as("__u"), col(typeCol).as("__ty"),
        col(tsCol).as("__ts"))
      .where(col("__u").isNotNull && col("__ts").isNotNull)
    val cohorts = evs.where(col("__ty") === cohortEvent)
      .groupBy(col("__u"))
      .agg(date_trunc("week", min(col("__ts"))).cast("date").as("__cw"))
      .transform(graft.core.Checkpoints.sessionCk) // feeds the activity join AND cohort sizes
    val act = evs
      .select(col("__u"), date_trunc("week", col("__ts")).cast("date").as("__aw"))
      .join(cohorts, Seq("__u"))
      .where(col("__aw") >= col("__cw"))
      .select(col("__u"), col("__cw"),
        expr("datediff(__aw, __cw) div 7").cast("int").as("week_k"))
      .distinct()
    val sizes = cohorts.groupBy(col("__cw")).agg(count(lit(1)).as("n_cohort"))
    act.groupBy(col("__cw"), col("week_k"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("__cw"))
      .select(col("__cw").as("cohort_week"), col("week_k"),
        col("n_active"), col("n_cohort"),
        expr("n_active * 1000000 div n_cohort").as("retention_ppm"))
  }
}
