package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.model.Gam

/** GAM model queries (SURVEY.md §2.9 M1–M4) over the events table:
  * per-group count series → spline GLM fit → counterfactual grid
  * prediction. Non-SQL-expressible (iterative IRLS) → rows-only checks.
  */
object ModelQueries {

  val qs: Seq[Q] = Seq(

    // ---- M2/M4: hourly count model per event_type, scored 1 week out ----
    Q("q50_gam_hourly",
      (s, dir) => {
        val hourly = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
          .agg(count(lit(1)).cast("double").as("n"))
          .withColumn("carry", lit("events"))
        Gam.fitPredict(hourly, "event_type", "carry", "hour_ts", "n",
          "2024-02-01 00:00:00", "2024-02-07 23:00:00", 3600,
          // GCV-selected λ per group (mgcv parity path)
          Gam.Config(hourly = true, negBin = true,
            lambdaGrid = Seq(0.01, 1.0, 100.0, 1e4)))
          .select(col("event_type"), col("PREDICT_TIME"),
            col("PREDICTION").as("VOLUMN_PREDICTION"))
      },
      None),

    // ---- §3.3 compare: actual vs predicted with VOLUME_DIFF (J11/P15)
    //      over an in-sample week (rows-only: prediction is iterative) ----
    Q("q52_volume_diff",
      (s, dir) => {
        val hourly = Tables.load(s, dir, "events")
          .groupBy(col("event_type").as("NODE_NAME"),
            date_trunc("hour", col("ts")).as("START_DATETIME"))
          .agg(count(lit(1)).cast("long").as("VOLUME_SUM_IMPUTE"))
          .withColumn("CORRIDOR_ROUTE", lit("events"))
        val preds = graft.traffic.Compare.predictions(hourly, hourly = true,
          "2024-01-24 00:00:00", "2024-01-30 23:00:00",
          graft.model.Gam.Config(hourly = true, negBin = true))
        graft.traffic.Compare.volumeDiff(hourly, preds)
      },
      None),

    // ---- M3/M4: daily model per event_type ----
    Q("q51_gam_daily",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day_ts"))
          .agg(count(lit(1)).cast("double").as("n"))
          .withColumn("carry", lit("events"))
        Gam.fitPredict(daily, "event_type", "carry", "day_ts", "n",
          "2024-02-01 00:00:00", "2024-02-28 00:00:00", 86400,
          Gam.Config(hourly = false, negBin = true, minRows = 14,
            lambdaGrid = Seq(0.01, 1.0, 100.0, 1e4)))
          .select(col("event_type"), col("PREDICT_TIME"),
            col("PREDICTION").as("VOLUMN_PREDICTION"))
      },
      None),

    // ---- distributed exact ROC AUC (Mann-Whitney with midrank ties):
    //      group-by-score + two-phase prefix sum — no global window.
    //      Integer numerator end-to-end, so the oracle matches exactly;
    //      the ranked score here is doc length against the lang='en'
    //      weak label (same label family the LogReg classifier trains on) ----
    Q("q106_auc",
      (s, dir) => {
        graft.model.Eval.aucExact(Tables.load(s, dir, "documents"),
          col("n_chars"), col("lang") === "en")
      },
      Some("""WITH b AS (
                SELECT n_chars AS score, (lang = 'en') AS lab
                FROM documents
                WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
              g AS (
                SELECT score,
                       CAST(sum(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS np,
                       CAST(sum(CASE WHEN lab THEN 0 ELSE 1 END) AS BIGINT) AS nn
                FROM b GROUP BY 1),
              c AS (
                SELECT score, np, nn,
                       CAST(sum(nn) OVER (ORDER BY score) AS BIGINT) AS cum_nn
                FROM g)
              SELECT CAST(sum(np) AS BIGINT) AS n_pos,
                     CAST(sum(nn) AS BIGINT) AS n_neg,
                     CAST(sum(np * (2 * (cum_nn - nn) + nn)) AS BIGINT) AS auc_num2,
                     round(CAST(sum(np * (2 * (cum_nn - nn) + nn)) AS DOUBLE)
                           / (2.0 * sum(np) * sum(nn)), 6) AS auc
              FROM c"""))
  )
}
