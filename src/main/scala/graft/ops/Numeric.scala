package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric parity helpers.
  *
  * Spark's `round(double)` converts through BigDecimal of the shortest
  * decimal representation (so 38.751249999999996 may print as
  * "38.75125" and round HALF_UP to 38.7513), while C-family engines
  * (DuckDB, Postgres) compute `std::round(x * 10^s) / 10^s` on the raw
  * double (→ 38.7512). For cross-engine hash parity every rounded double
  * the oracle sees must use the same arithmetic, so `roundAway`
  * reproduces the C semantics exactly: half-away-from-zero evaluated on
  * the scaled double. (For values whose scaled form is exactly
  * representable, the two agree; the divergence is only in the
  * sub-ULP-boundary cases.)
  *
  * `bround` remains the R-parity choice (banker's rounding — R `round()`,
  * SURVEY.md §7 hazard 2); Spark's `round` the SQL-Server-parity choice.
  */
object Numeric {
  def roundAway(c: Column, scale: Int = 0): Column = {
    val s = math.pow(10, scale.toDouble)
    val scaled = c * s
    when(scaled >= 0, floor(scaled + 0.5))
      .otherwise(-floor(-scaled + 0.5))
      .cast("double") / s
  }
}
