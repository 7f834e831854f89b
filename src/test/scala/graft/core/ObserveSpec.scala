package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("withMetrics: rows, null count, and range in ONE pass with the action") {
    val df = Seq((1L, Some(10.0)), (2L, None), (3L, Some(30.0)))
      .toDF("id", "v")
    val (out, obs) = Observe.withMetrics(df, "load",
      count(lit(1)).as("rows"), Observe.nullCount("v"), Observe.range("id"))
    out.write.mode("overwrite").parquet("tmp/observe_spec")
    val m = obs.get
    assert(m("rows") == 3L)
    assert(m("null_v") == 1L)
    val r = m("range_id").asInstanceOf[org.apache.spark.sql.Row]
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L)
  }
}
