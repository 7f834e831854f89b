package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the "describe my 100 TB table" operator every
  * curation pipeline runs before (and after) each transform to catch
  * schema drift, null explosions, and key-cardinality surprises.
  *
  * Plan shape matters here: the obvious `agg(count_distinct(a),
  * count_distinct(b), …)` plans as Expand (rows × columns) into a
  * SortAggregate keyed on EVERY profiled column at once — a full sort
  * of the multiplied data (measured 6× slower at sf0.1). Instead:
  *
  *  - counts/min/max: one plain aggregation pass — no distincts, so
  *    partial aggregation collapses each partition to a single buffer
  *    row and nothing but 1×(5·k) values cross the wire;
  *  - exact distincts: one stack-unpivot pass into (column, value)
  *    pairs, then two hash aggregations — groupBy(column, value)
  *    count, groupBy(column) count — both partial-aggregated, never
  *    sorted, shuffling only the per-column distinct value sets;
  *  - `exact = false` drops the second pass entirely:
  *    approx_count_distinct (HLL++, fixed-width buffer) rides in the
  *    plain agg pass — the true single-scan shape for 100 TB.
  */
object Profiling {

  /** Per-column profile of `cols`: row count, null count, distinct
    * count (exact by default, HLL approx with `exact = false`), min
    * and max (as strings, so heterogeneous column types stack into one
    * frame — min/max are computed in the column's native type BEFORE
    * the cast, so numeric columns don't get lexicographic bounds).
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c")) ++
        (if (exact) Nil
         else Seq(approx_count_distinct(col(c)).as(s"__dist_$c")))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val base = {
      // stack(k, label1, rows1, nulls1, min1, max1, …): unpivot the row
      val stackArgs = cols.map { c =>
        s"'$c', __rows_$c, __nulls_$c, __min_$c, __max_$c" +
          (if (exact) "" else s", __dist_$c")
      }.mkString(", ")
      val outCols = "column_name, n_rows, n_nulls, min_value, max_value" +
        (if (exact) "" else ", n_distinct")
      one.select(expr(s"stack(${cols.size}, $stackArgs) AS ($outCols)"))
    }
    if (!exact)
      return base.select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
    // exact distincts: (column, value) pairs → two hash aggregations
    val pairArgs = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
    val dist = df
      .select(expr(s"stack(${cols.size}, $pairArgs) AS (column_name, __v)"))
      .groupBy(col("column_name"), col("__v")).agg(count(lit(1)).as("__n"))
      .groupBy(col("column_name"))
      .agg(count(col("__v")).as("n_distinct")) // count skips the null group
    base.join(broadcast(dist), Seq("column_name"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** Distribution drift between two slices of a dataset (old vs new
    * snapshot, control vs treatment, yesterday vs today): per-bucket
    * counts and shares for each slice, the absolute share gap, and the
    * per-bucket PSI term (p−q)·ln(p/q) — the population-stability index
    * summand monitoring stacks alarm on.
    *
    * Shares are exact integer ppm so the drift columns are
    * engine-reproducible; the PSI term is the one IEEE double (both
    * engines call the same libm log; NULL when either share is zero —
    * the standard "new/vanished bucket" case a monitor flags anyway).
    *
    * Scale shape: one partial-agg shuffle of (bucket, slice) pairs —
    * the grouped frame is bounded by #buckets × 2, tiny by
    * construction, and everything downstream is driver-scale.
    */
  def drift(df: DataFrame, sliceCol: Column, bucketCol: Column): DataFrame = {
    val counts = df
      .select(sliceCol.cast("boolean").as("__new"), bucketCol.as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(!col("__new"), 1L).otherwise(0L)).as("n_old"),
        sum(when(col("__new"), 1L).otherwise(0L)).as("n_new"))
      .transform(graft.core.Checkpoints.sessionCk) // tiny (one row per bucket); feeds the
                              // totals scalar AND the output — scan once
    val totals = counts.agg(sum(col("n_old")).as("__to"),
      sum(col("n_new")).as("__tn"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_old"), col("n_new"),
        expr("n_old * 1000000 div __to").as("share_old_ppm"),
        expr("n_new * 1000000 div __tn").as("share_new_ppm"),
        abs(expr("n_old * 1000000 div __to") - expr("n_new * 1000000 div __tn"))
          .as("gap_ppm"),
        when(col("n_old") > 0 && col("n_new") > 0,
          (col("n_new").cast("double") / col("__tn") -
            col("n_old").cast("double") / col("__to")) *
            log((col("n_new").cast("double") / col("__tn")) /
              (col("n_old").cast("double") / col("__to"))))
          .as("psi_term"))
  }
}
