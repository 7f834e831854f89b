package graft.core

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** JDBC leg against embedded Derby (on the Spark classpath) — the
  * reference's SQL Server contract (R/_db_connect.R:16-36,
  * dbWriteTable at R/_pull_data.R:158-163) with url/driver as data.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val conn = Jdbc.derbyMemory("graft_test")

  private def sensorDf = Seq(
    ("100", ts("2020-01-01 00:00:00"), 12, 3.5),
    ("100", ts("2020-01-01 00:15:00"), 15, 4.0),
    ("101", ts("2020-01-01 00:00:00"), 7, 1.25),
    ("900", ts("2020-01-01 00:15:00"), 0, 0.0))
    .toDF("DETECTOR_NAME", "DATA_TIME", "VOLUME", "OCCUPANCY")

  test("overwrite write then read round-trips RTMC_15MIN-shaped data (S9/S5)") {
    Jdbc.write(sensorDf, conn, "RTMC_15MIN", SaveMode.Overwrite)
    val back = Jdbc.read(spark, conn, "RTMC_15MIN")
    assert(back.schema.fieldNames.toSet ==
      Set("DETECTOR_NAME", "DATA_TIME", "VOLUME", "OCCUPANCY"))
    assert(rows(back.select($"DETECTOR_NAME", $"DATA_TIME", $"VOLUME", $"OCCUPANCY"))
      == rows(sensorDf))
  }

  test("append accumulates like dbWriteTable(append=TRUE) (S8)") {
    Jdbc.write(sensorDf, conn, "APPEND_T", SaveMode.Overwrite)
    Jdbc.write(sensorDf, conn, "APPEND_T", SaveMode.Append)
    assert(Jdbc.read(spark, conn, "APPEND_T").count() == 8)
  }

  test("filters on a JDBC read push down into the remote scan") {
    Jdbc.write(sensorDf, conn, "PUSH_T", SaveMode.Overwrite)
    val q = Jdbc.read(spark, conn, "PUSH_T").where($"VOLUME" > 5)
    assert(q.count() == 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("VOLUME"), plan)
  }

  test("readQuery executes remote SQL (dbGetQuery shape)") {
    // GROUP BY on a string key needs a comparable type — Derby maps
    // StringType to CLOB unless told otherwise (same for SQL Server's
    // NVARCHAR(MAX)), so give the key a real width
    Jdbc.write(sensorDf, conn, "Q_T", SaveMode.Overwrite,
      columnTypes = Some("DETECTOR_NAME VARCHAR(32)"))
    val agg = Jdbc.readQuery(spark, conn,
      "SELECT DETECTOR_NAME, CAST(SUM(VOLUME) AS BIGINT) AS V FROM Q_T GROUP BY DETECTOR_NAME")
    assert(agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("100" -> 27L, "101" -> 7L, "900" -> 0L))
  }

  test("readPartitioned splits the scan into parallel range tasks") {
    val big = (1L to 100L).map(i => (i, s"d$i")).toDF("ID", "NAME")
    Jdbc.write(big, conn, "PART_T", SaveMode.Overwrite)
    val r = Jdbc.readPartitioned(spark, conn, "PART_T", "ID", 1, 100, 4)
    assert(r.rdd.getNumPartitions == 4)
    assert(r.count() == 100)
    assert(r.agg(sum($"ID")).head().getLong(0) == 5050L)
  }

  test("nightly 15-min rollup round-trips through the JDBC sink unchanged") {
    // the RTMC_15MIN write path with a computed frame, not a literal one
    val agg = sensorDf.groupBy($"DETECTOR_NAME")
      .agg(sum($"VOLUME").cast("int").as("VOLUME_SUM"),
        avg($"OCCUPANCY").as("OCC_AVG"))
    Jdbc.write(agg, conn, "ROLLUP_T", SaveMode.Overwrite)
    assert(rows(Jdbc.read(spark, conn, "ROLLUP_T")) == rows(agg))
  }
}
