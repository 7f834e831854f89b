package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** JDBC sink/source leg against embedded Derby (on the Spark jars
  * classpath) — stands in for the reference's SQL Server contract
  * (`R/_db_connect.R:16-36`): write the 15-min fact frame out over
  * JDBC, read it back plain and range-partitioned, and confirm filter
  * pushdown reaches the remote scan.
  */
class JdbcWarehouseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url = {
    val dir = Files.createTempDirectory("derby").toString
    s"jdbc:derby:$dir/wh;create=true"
  }
  private lazy val wh = new Warehouse(spark, Files.createTempDirectory("whroot").toString)

  // 15-min fact shape: (node, ts, volume, occupancy, speed-with-nulls)
  private def fact = (0 until 96).map { i =>
    (100L + i % 4, ts(f"2023-06-01 ${i / 4}%02d:${(i % 4) * 15}%02d:00"),
      (i * 7 % 50).toLong, i * 13 % 1000,
      if (i % 5 == 0) None else Some(40.0 + i % 20))
  }.toDF("node_id", "ts15", "volume", "scans", "speed")

  test("writeJdbc overwrite + readJdbc round-trips data and schema") {
    wh.writeJdbc(fact, url, "RTMC_15MIN")
    val back = wh.readJdbc(url, "RTMC_15MIN")
    assert(back.schema.fieldNames.toSet ==
      Set("node_id", "ts15", "volume", "scans", "speed"))
    assert(rows(back.select($"node_id", $"ts15", $"volume", $"scans", $"speed"))
      == rows(fact))
  }

  test("writeJdbc append adds rows; truncate-overwrite resets them") {
    wh.writeJdbc(fact, url, "RTMC_APPEND")
    wh.writeJdbc(fact.where($"node_id" === 100L), url, "RTMC_APPEND",
      mode = "append")
    val n = wh.readJdbc(url, "RTMC_APPEND").count()
    assert(n == 96 + 24)
    wh.writeJdbc(fact, url, "RTMC_APPEND") // truncate-overwrite
    assert(wh.readJdbc(url, "RTMC_APPEND").count() == 96)
  }

  test("range-partitioned read slices into numPartitions concurrent scans") {
    wh.writeJdbc(fact, url, "RTMC_PART")
    val part = wh.readJdbcPartitioned(url, "RTMC_PART", "node_id",
      lower = 100L, upper = 104L, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(rows(part.select($"node_id", $"ts15", $"volume", $"scans", $"speed"))
      == rows(fact))
  }

  test("filters push into the remote WHERE clause") {
    wh.writeJdbc(fact, url, "RTMC_PUSH")
    val q = wh.readJdbc(url, "RTMC_PUSH")
      .where($"node_id" === 101L && $"volume" > 10L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), s"no JDBC pushdown:\n$plan")
    assert(plan.contains("node_id"), s"node_id filter not pushed:\n$plan")
    assert(q.count() == fact.where($"node_id" === 101L && $"volume" > 10L).count())
  }
}
