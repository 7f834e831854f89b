package graft.core

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Same-pass pipeline telemetry via `Dataset.observe` — the Spark-native
  * answer to "how many rows / how many nulls / what range did the
  * nightly load actually write?" WITHOUT a second scan. At 100 TB a
  * post-hoc `count()` or QA query re-reads the world; an observation
  * rides the job that already ran, for free (metrics are accumulated by
  * the running tasks and surfaced after the action completes).
  *
  * Shape: attach before the sink, read after the action:
  * {{{
  *   val (out, obs) = Observe.withMetrics(df, "nightly",
  *     count(lit(1)).as("rows"), Observe.nullCount("VOLUME"))
  *   out.write.parquet(...)
  *   val rows = obs.get("rows")
  * }}}
  */
object Observe {

  /** Attach named metrics (each column MUST be aliased — the alias is
    * the lookup key in `Observation.get`). Aggregates only, computed in
    * the same pass as whatever action consumes the returned frame.
    */
  def withMetrics(df: DataFrame, name: String,
                  metrics: Column*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "at least one metric column required")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** NULL count for a column, keyed `null_<col>`. */
  def nullCount(c: String): Column =
    sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c")

  /** Min/max range as a struct, keyed `range_<col>` (watermark audit:
    * what period did this batch actually cover?).
    */
  def range(c: String): Column =
    struct(min(col(c)).as("lo"), max(col(c)).as("hi")).as(s"range_$c")
}
