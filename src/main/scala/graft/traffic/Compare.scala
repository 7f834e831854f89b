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

  /** Deterministic counterfactual baseline in the RTMC_PREDICT_HOUR
    * contract: predict each (node, grid hour) as the hour-of-week mean
    * (integer floor) of the node's actuals BEFORE `gridStart` — the
    * seasonal-naive forecast every counterfactual model is benchmarked
    * against. Unlike the iterative GAM ([[predictions]]) this is pure
    * relational algebra, so [[volumeDiff]] fed from it is exactly
    * reproducible in any SQL engine — it exists to put the §3.3
    * compare join itself under the hash oracle, decoupled from
    * model-fit nondeterminism. Scale shape: profile and grid are
    * node×168-bounded (dimension-sized); the only fact-scale pass is
    * the train aggregation, which shuffles once on (node, hour-of-week).
    */
  def seasonalNaive(actual: DataFrame, gridStart: String,
                    gridEnd: String): DataFrame = {
    val how = (c: org.apache.spark.sql.Column) =>
      dayofweek(c) * 24 + hour(c)
    val train = actual
      .where(col("START_DATETIME") < to_timestamp(lit(gridStart)))
    val prof = train
      .groupBy(col("NODE_NAME"), how(col("START_DATETIME")).as("__how"))
      .agg(expr("cast(sum(VOLUME_SUM_IMPUTE) as bigint) div count(*)")
        .as("VOLUMN_PREDICTION")) // cast first: `div` needs integral
        // operands, and VOLUME_SUM_IMPUTE is double-typed on the
        // fractional-impute legs of the RTMC contract
    val grid = graft.ops.TimeOps.tsGrid(actual.sparkSession,
      gridStart, gridEnd, "1 hour", "PREDICT_TIME")
    train.select(col("NODE_NAME"), col("CORRIDOR_ROUTE")).distinct()
      .crossJoin(broadcast(grid))
      .withColumn("__how", how(col("PREDICT_TIME")))
      .join(prof, Seq("NODE_NAME", "__how"))
      .select(col("NODE_NAME"), col("PREDICT_TIME"),
        col("VOLUMN_PREDICTION"), col("CORRIDOR_ROUTE"))
  }

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
