package graft.traffic

import org.apache.spark.sql.types._

/** Declared schemas for the five persistent tables (SURVEY.md §1.1;
  * DDLs at /root/reference/R/2) Write-Historical-SensorData-RunOnce.R:8-25
  * and the modeling run-once scripts). `DECIMAL(4,1)` columns are kept
  * as DoubleType rounded to 1 dp at write time — the engine's arithmetic
  * type — with the declared decimal preserved here for sink casting.
  */
object Schemas {

  val raw30s: StructType = StructType(Seq(
    StructField("sensor", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("hour", IntegerType, nullable = false),
    StructField("min", DoubleType, nullable = false),
    StructField("volume", IntegerType, nullable = true),
    StructField("occupancy", IntegerType, nullable = true)))

  val rtmc15Min: StructType = StructType(Seq(
    StructField("DETECTOR_NAME", StringType, nullable = false),
    StructField("START_DATETIME", TimestampType, nullable = false),
    StructField("START_DATE", DateType, nullable = true),
    StructField("VOLUME_PCT_NULL", DoubleType, nullable = true),
    StructField("VOLUME_SUM", IntegerType, nullable = true),
    StructField("VOLUME_SUM_IMPUTE", IntegerType, nullable = true),
    StructField("OCCUPANCY_PCT_NULL", DoubleType, nullable = true),
    StructField("OCCUPANCY_SUM", IntegerType, nullable = true),
    StructField("OCCUPANCY_SUM_IMPUTE", IntegerType, nullable = true),
    StructField("SPEED", DoubleType, nullable = true),
    StructField("NODE_NAME", StringType, nullable = true),
    StructField("CORRIDOR_ROUTE", StringType, nullable = true)))

  val predict: StructType = StructType(Seq(
    StructField("NODE_NAME", StringType, nullable = true),
    StructField("PREDICT_TIME", TimestampType, nullable = true),
    // the reference's load-bearing typo — it is the physical column name
    // (R/_analyze_data.R:247)
    StructField("VOLUMN_PREDICTION", IntegerType, nullable = true),
    StructField("CORRIDOR_ROUTE", StringType, nullable = true)))

  val changelog: StructType = StructType(Seq(
    StructField("Update_Date", DateType, nullable = true),
    StructField("Change", StringType, nullable = true),
    StructField("DETECTOR_NAME", StringType, nullable = true),
    StructField("Old_Value", StringType, nullable = true),
    StructField("New_Value", StringType, nullable = true),
    StructField("Last_Update_Date", DateType, nullable = true)))

  /** §1.1 SINK schema for RTMC_15MIN — the declared DDL types
    * (R/2) Write-Historical-SensorData-RunOnce.R:8-18): NUMERIC(4,1)
    * columns are DecimalType(4,1) AT THE SINK, while in-flight
    * arithmetic stays DoubleType ([[rtmc15Min]]). [[conform]] casts at
    * the warehouse write boundary; the values are already rounded to
    * 1 dp by the pipeline, so the cast is exact.
    */
  val rtmc15MinSink: StructType = StructType(rtmc15Min.map {
    case f @ StructField("VOLUME_PCT_NULL" | "OCCUPANCY_PCT_NULL" | "SPEED",
        _, _, _) => f.copy(dataType = DecimalType(4, 1))
    case f => f
  })

  /** Cast-and-select to a declared sink schema: columns in DDL order,
    * each cast to its DDL type. The single write-boundary chokepoint
    * that keeps warehouse tables on their §1.1 contract regardless of
    * what types in-flight arithmetic widened to (bigint `div`, double
    * ratios); WarehouseContractSpec pins the read-back types.
    */
  def conform(df: org.apache.spark.sql.DataFrame,
              schema: StructType): org.apache.spark.sql.DataFrame =
    df.select(schema.fields.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name))
      .toIndexedSeq: _*)

  /** 60 scans/sec ⇒ 54,000 scans per 15-min interval
    * (R/_pull_data.R:326: interval_scans = 0.25 h × 216,000/h).
    */
  val scansPer15Min: Int = 54000

  /** Physical 30-sec maxima used by the impossible-value scrub (P10):
    * ~1 vehicle/sec upper bound and the scan count per 30-s interval.
    */
  val maxVolumePer30s: Double = 40.0
  val maxOccupancyPer30s: Double = 1800.0
}
