package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection / scalar-expression combinators (SURVEY.md §2.2, P1–P15).
  *
  * All are pure `DataFrame => DataFrame` (or `Column => Column`) and
  * compile to built-in Catalyst expressions — fully codegen'd, no UDFs —
  * so they stay inside WholeStageCodegen at any scale.
  */
object Tidy {

  /** P1 — split a delimited path/string into fixed named columns
    * (reference: tidyr::separate at R/_pull_data.R:21-28).
    */
  def pathSplit(df: DataFrame, src: String, sep: String, names: Seq[String],
                keepSrc: Boolean = true): DataFrame = {
    val parts = split(col(src), java.util.regex.Pattern.quote(sep))
    val out = names.zipWithIndex.foldLeft(df) { case (d, (n, i)) =>
      // get() (not getItem) → NULL past the end, ANSI-safe
      d.withColumn(n, get(parts, lit(i)))
    }
    if (keepSrc) out else out.drop(src)
  }

  /** P2 — re-concatenate columns with a separator
    * (tidyr::unite at R/_pull_data.R:29-33).
    */
  def pathJoin(df: DataFrame, out: String, sep: String, cols: Seq[String]): DataFrame =
    df.withColumn(out, concat_ws(sep, cols.map(col): _*))

  /** P3 — trim whitespace on the named (default: all string) columns. */
  def trimAll(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val targets =
      if (cols.nonEmpty) cols
      else df.schema.fields.collect { case f if f.dataType.typeName == "string" => f.name }.toSeq
    targets.foldLeft(df)((d, c) => d.withColumn(c, trim(col(c))))
  }

  /** P7 — empty-string → NULL across (string) columns
    * (R/_pull_data.R:142: `x[x == ""] <- NA`).
    */
  def emptyToNull(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val targets =
      if (cols.nonEmpty) cols
      else df.schema.fields.collect { case f if f.dataType.typeName == "string" => f.name }.toSeq
    targets.foldLeft(df)((d, c) =>
      d.withColumn(c, when(col(c) === lit(""), lit(null)).otherwise(col(c))))
  }

  /** P5 — bulk rename (rename_all(toupper) etc., R/_pull_data.R:374). */
  def renameAll(df: DataFrame)(f: String => String): DataFrame =
    df.toDF(df.columns.map(f).toIndexedSeq: _*)

  /** P13 — scale-up imputation: `sum / (1 - pctNull/100)` when any data
    * present (R/_pull_data.R:466-482). `pctNull` in [0,100].
    */
  def scaleUpImpute(sum: Column, pctNull: Column): Column =
    when(pctNull < 100, Numeric.roundAway(sum / (lit(1) - pctNull / 100)))

  /** P14 — NULL-skipping row-wise mean of two columns
    * (data.table rowMeans(na.rm=TRUE) at R/_pull_data.R:577-591):
    * both null → null; one null → the other; else the mean.
    */
  def rowMean2(a: Column, b: Column): Column =
    (coalesce(a, b) + coalesce(b, a)) / 2

  /** P12 — speed derivation, gated (R/_pull_data.R:349-364):
    * speed = (volume * perHourFactor * fieldLengthFt) / (5280 * occPct),
    * only when volume != 0 and occPct >= minOcc; else NULL.
    */
  def speed(volume: Column, occPct: Column, fieldLengthFt: Column,
            perHourFactor: Double = 60.0 / 30.0, minOcc: Double = 0.002): Column =
    when(volume =!= 0 && occPct >= minOcc,
      Numeric.roundAway((volume * perHourFactor * fieldLengthFt) / (lit(5280) * occPct), 1))

  /** P10 — impossible-value scrub: NULL out readings above a physical
    * max (tc.sensors::replace_impossible, R/_pull_data.R:329-332).
    */
  def replaceImpossible(df: DataFrame, bounds: Map[String, (Double, Double)]): DataFrame =
    bounds.foldLeft(df) { case (d, (c, (lo, hi))) =>
      d.withColumn(c, when(col(c) < lo || col(c) > hi, lit(null)).otherwise(col(c)))
    }

  /** P4 — extract a yyyyMMdd date embedded in a string/URL
    * (R/_pull_data.R:114-120).
    */
  def dateFromString(src: Column, pattern: String = "(\\d{8})"): Column =
    to_date(regexp_extract(src, pattern, 1), "yyyyMMdd")

  /** P10's dynamic sibling — winsorization: clamp a value column to its
    * per-group [pLo, pHi] exact percentiles instead of fixed physical
    * bounds. The standard outlier treatment when the valid range is
    * data-dependent (per-sensor, per-event-type) rather than physical.
    *
    * Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`: h = (n−1)p linear interpolation), so the clamp
    * bounds are engine-reproducible. NULL values stay NULL (guarded —
    * `least`/`greatest` skip NULLs and would otherwise fabricate a
    * bound for them).
    *
    * Scale shape: one partial-agg percentile pass bounded by group
    * cardinality, broadcast back; the clamp is a map-side projection.
    */
  def winsorize(df: DataFrame, groupCol: Column, valueCol: Column,
                pLo: Double, pHi: Double,
                outCol: String = "winsorized"): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo <= pHi,
      s"need 0 <= pLo <= pHi <= 1, got ($pLo, $pHi)")
    val q = df.where(valueCol.isNotNull)
      .groupBy(groupCol.as("__g"))
      .agg(percentile(valueCol, lit(pLo)).as("__plo"),
        percentile(valueCol, lit(pHi)).as("__phi"))
    df.join(broadcast(q), groupCol === col("__g"), "left")
      .withColumn(outCol,
        when(valueCol.isNull, lit(null))
          .otherwise(greatest(least(valueCol, col("__phi")), col("__plo"))))
      .drop("__g", "__plo", "__phi")
  }
}
