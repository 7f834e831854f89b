package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the "describe my 100 TB table" operator every
  * curation pipeline runs before (and after) each transform to catch
  * schema drift, null explosions, and key-cardinality surprises.
  *
  * One job over the data: all per-column aggregates evaluate in a
  * single `agg(...)` pass (Spark plans the multi-distinct via Expand +
  * partial aggregation — still one scan of the table), then the single
  * result row is unpivoted driver-side into one row per column. Nothing
  * but the 1×(5·k) aggregate row ever leaves the executors.
  */
object Profiling {

  /** Per-column profile of `cols`: row count, null count, exact
    * distinct count, min and max (as strings, so heterogeneous column
    * types stack into one frame). Exact distincts make the result
    * oracle-checkable; at 100 TB swap `count_distinct` for
    * `approx_count_distinct` via `exact = false` — same single-scan
    * shape without the Expand multiplier.
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // stack(k, label1, v1a..v1e, label2, ...): unpivot the single row
    val stackArgs = cols.map { c =>
      s"'$c', __rows_$c, __nulls_$c, __dist_$c, __min_$c, __max_$c"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"))
  }
}
