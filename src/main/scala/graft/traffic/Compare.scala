package graft.traffic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** §3.3 — actual vs counterfactual-predicted volumes
  * (reference `data_comparison`, /root/reference/R/_analyze_data.R:308-387).
  */
object Compare {

  /** J11 + P15: inner equi join node-hour actuals to predictions on
    * (NODE_NAME, timestamp), difference on the response scale. Both
    * sides shuffle on the same composite key — one sort-merge join, no
    * driver round-trips.
    */
  def volumeDiff(actual: DataFrame, predicted: DataFrame): DataFrame =
    actual.join(predicted
        .withColumnRenamed("PREDICT_TIME", "START_DATETIME")
        .drop("CORRIDOR_ROUTE"),
      Seq("NODE_NAME", "START_DATETIME"), "inner")
      .select(col("NODE_NAME"), col("START_DATETIME"),
        col("VOLUME_SUM_IMPUTE"), col("VOLUMN_PREDICTION"),
        col("CORRIDOR_ROUTE"),
        (col("VOLUME_SUM_IMPUTE") - col("VOLUMN_PREDICTION")).as("VOLUME_DIFF"))

  /** Modeling wrapper: QAQC'd node aggregate → GAM → predictions in the
    * RTMC_PREDICT_{HOUR,DAY} contract (VOLUMN_PREDICTION spelling per
    * R/_analyze_data.R:247).
    */
  def predictions(nodeAgg: DataFrame, hourly: Boolean,
                  gridStart: String, gridEnd: String,
                  cfg: graft.model.Gam.Config): DataFrame =
    graft.model.Gam.fitPredict(nodeAgg,
      "NODE_NAME", "CORRIDOR_ROUTE", "START_DATETIME", "VOLUME_SUM_IMPUTE",
      gridStart, gridEnd, if (hourly) 3600L else 86400L, cfg)
      .withColumnRenamed("PREDICTION", "VOLUMN_PREDICTION")
}
