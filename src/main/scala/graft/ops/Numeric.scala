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

  /** The parity policy as a value, so operators that round take WHICH
    * engine they must agree with as an explicit parameter instead of
    * silently picking Spark's default.
    */
  sealed trait Parity { def round(c: Column, scale: Int): Column }
  /** R parity — banker's rounding (R `round()`, data.table). */
  case object RParity extends Parity {
    def round(c: Column, scale: Int): Column = bround(c, scale)
  }
  /** DuckDB/Postgres (oracle) parity — half-away-from-zero on the raw
    * scaled double.
    */
  case object OracleParity extends Parity {
    def round(c: Column, scale: Int): Column = roundAway(c, scale)
  }
  /** SQL-Server / Spark-default parity — HALF_UP via BigDecimal of the
    * shortest decimal representation.
    */
  case object SparkParity extends Parity {
    def round(c: Column, scale: Int): Column =
      org.apache.spark.sql.functions.round(c, scale)
  }
}
