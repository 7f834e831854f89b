package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Scd2

/** Deterministic SCD-2 merge scenario derived from the `part` table so
  * the DuckDB oracle can replay the exact same merge in SQL.
  *
  * Old snapshot = parts with pk%10 != 0; new snapshot = parts with
  * pk%10 != 1 — so pk%10==0 rows are inserts and pk%10==1 rows are
  * deletes. Attribute churn: brand suffix when pk%5==2, p_type nulled
  * when pk%17==6 (exercises the null-safe diff the reference lacks,
  * R/_pull_data.R:233-237), p_size+1 when pk%9==3, and the ABANDONED
  * special-cases (f→t close, t→f legacy close, R/_pull_data.R:250-284)
  * via pk%11==4 and pk%13==0 & even.
  */
object Scd2Fixture {
  private val asOf = "2024-06-01"
  private val attrs = Seq("p_name", "p_brand", "p_type", "p_size", "ABANDONED")

  private def oldSnap(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part").where(col("p_partkey") % 10 =!= 0)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        when(col("p_partkey") % 13 === 0, "t").otherwise("f").as("ABANDONED"),
        to_date(lit("2020-01-01")).as("START_DATE"),
        to_date(lit("2100-01-01")).as("END_DATE"),
        lit(false).as("DEACTIVATE"))

  private def newSnap(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part").where(col("p_partkey") % 10 =!= 1)
      .select(col("p_partkey"), col("p_name"),
        when(col("p_partkey") % 5 === 2, concat(col("p_brand"), lit("-X")))
          .otherwise(col("p_brand")).as("p_brand"),
        when(col("p_partkey") % 17 === 6, lit(null)).otherwise(col("p_type")).as("p_type"),
        when(col("p_partkey") % 9 === 3, col("p_size") + 1).otherwise(col("p_size")).as("p_size"),
        when(col("p_partkey") % 13 === 0,
          when(col("p_partkey") % 2 === 0, "f").otherwise("t"))
          .otherwise(when(col("p_partkey") % 11 === 4, "t").otherwise("f")).as("ABANDONED"))

  def merged(s: SparkSession, dir: String): Scd2.Result =
    Scd2.merge(oldSnap(s, dir), newSnap(s, dir), asOf,
      Scd2.Options(key = "p_partkey", attrCols = attrs,
        abandonedCol = Some("ABANDONED")))

  // ---- DuckDB oracle ----

  private val snapsCte =
    s"""WITH old AS (
       |  SELECT p_partkey, p_name, p_brand, p_type, p_size,
       |    CASE WHEN p_partkey % 13 = 0 THEN 't' ELSE 'f' END AS ABANDONED,
       |    DATE '2020-01-01' AS START_DATE, DATE '2100-01-01' AS END_DATE,
       |    FALSE AS DEACTIVATE
       |  FROM part WHERE p_partkey % 10 <> 0),
       |new AS (
       |  SELECT p_partkey, p_name,
       |    CASE WHEN p_partkey % 5 = 2 THEN p_brand || '-X' ELSE p_brand END AS p_brand,
       |    CASE WHEN p_partkey % 17 = 6 THEN NULL ELSE p_type END AS p_type,
       |    CASE WHEN p_partkey % 9 = 3 THEN p_size + 1 ELSE p_size END AS p_size,
       |    CASE WHEN p_partkey % 13 = 0
       |         THEN CASE WHEN p_partkey % 2 = 0 THEN 'f' ELSE 't' END
       |         ELSE CASE WHEN p_partkey % 11 = 4 THEN 't' ELSE 'f' END
       |    END AS ABANDONED
       |  FROM part WHERE p_partkey % 10 <> 1),
       |j AS (
       |  SELECT o.p_partkey AS ok, n.p_partkey AS nk,
       |    o.p_name AS o_p_name, n.p_name AS n_p_name,
       |    o.p_brand AS o_p_brand, n.p_brand AS n_p_brand,
       |    o.p_type AS o_p_type, n.p_type AS n_p_type,
       |    o.p_size AS o_p_size, n.p_size AS n_p_size,
       |    o.ABANDONED AS o_ab, n.ABANDONED AS n_ab,
       |    o.START_DATE AS o_start, o.END_DATE AS o_end, o.DEACTIVATE AS o_deact
       |  FROM old o FULL OUTER JOIN new n ON o.p_partkey = n.p_partkey)""".stripMargin

  private def pick(c: String): String =
    s"CASE WHEN ok IS NULL THEN n_$c WHEN nk IS NOT NULL AND o_$c IS DISTINCT FROM n_$c THEN n_$c ELSE o_$c END"

  val dimOracle: String =
    s"""$snapsCte
       |SELECT coalesce(ok, nk) AS p_partkey,
       |  ${pick("p_name")} AS p_name,
       |  ${pick("p_brand")} AS p_brand,
       |  ${pick("p_type")} AS p_type,
       |  ${pick("p_size")} AS p_size,
       |  ${pick("ab")} AS ABANDONED,
       |  CASE WHEN ok IS NULL THEN DATE '2024-06-01' ELSE o_start END AS START_DATE,
       |  CASE WHEN ok IS NULL THEN DATE '2100-01-01'
       |       WHEN nk IS NULL AND NOT coalesce(o_deact, FALSE) THEN DATE '2024-06-01'
       |       WHEN ok IS NOT NULL AND nk IS NOT NULL AND o_ab = 'f' AND n_ab = 't' THEN DATE '2024-06-01'
       |       WHEN ok IS NOT NULL AND nk IS NOT NULL AND o_ab = 't' AND n_ab = 'f' THEN DATE '2019-07-31'
       |       ELSE o_end END AS END_DATE,
       |  CASE WHEN ok IS NULL THEN FALSE
       |       WHEN nk IS NULL AND NOT coalesce(o_deact, FALSE) THEN TRUE
       |       WHEN ok IS NOT NULL AND nk IS NOT NULL
       |            AND ((o_ab = 'f' AND n_ab = 't') OR (o_ab = 't' AND n_ab = 'f')) THEN TRUE
       |       ELSE o_deact END AS DEACTIVATE
       |FROM j""".stripMargin

  private def cellChange(c: String, label: String): String =
    s"""SELECT DATE '2024-06-01' AS Update_Date,
       |  'Attribute Changed: $label' AS Change, ok AS p_partkey,
       |  CAST(o_$c AS VARCHAR) AS Old_Value, CAST(n_$c AS VARCHAR) AS New_Value,
       |  DATE '2024-06-01' AS Last_Update_Date
       |FROM j WHERE ok IS NOT NULL AND nk IS NOT NULL AND o_$c IS DISTINCT FROM n_$c""".stripMargin

  val changelogOracle: String =
    s"""$snapsCte
       |SELECT DATE '2024-06-01' AS Update_Date, 'New Detector Added' AS Change,
       |  nk AS p_partkey, CAST(NULL AS VARCHAR) AS Old_Value,
       |  CAST(NULL AS VARCHAR) AS New_Value, DATE '2024-06-01' AS Last_Update_Date
       |FROM j WHERE ok IS NULL
       |UNION ALL
       |SELECT DATE '2024-06-01', 'Detector Removed', ok, NULL, NULL, DATE '2024-06-01'
       |FROM j WHERE nk IS NULL AND NOT coalesce(o_deact, FALSE)
       |UNION ALL
       |${cellChange("p_name", "p_name")}
       |UNION ALL
       |${cellChange("p_brand", "p_brand")}
       |UNION ALL
       |${cellChange("p_type", "p_type")}
       |UNION ALL
       |${cellChange("p_size", "p_size")}
       |UNION ALL
       |${cellChange("ab", "ABANDONED")}""".stripMargin
}
