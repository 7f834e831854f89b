package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class WarehouseLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("forget removes exactly the requested keys and reports the count") {
    val root = Files.createTempDirectory("wh_forget").toString
    val wh = new Warehouse(spark, root)
    val data = Seq((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"))
      .toDF("user_id", "payload")
    wh.overwrite(data, "events")
    val removed = wh.forget("events", "user_id",
      Seq(2L, 99L).toDF("user_id")) // 99 absent: no-op for it
    assert(removed == 2)
    val left = wh.read("events").collect().map(_.getLong(0)).sorted
    assert(left.toSeq == Seq(1L, 3L))
    // idempotent: forgetting again removes nothing
    assert(wh.forget("events", "user_id", Seq(2L).toDF("user_id")) == 0)
  }

  test("expirePartitions drops old date dirs without touching the rest") {
    val root = Files.createTempDirectory("wh_expire").toString
    val wh = new Warehouse(spark, root)
    val data = Seq(
      (1L, d("2024-01-01")), (2L, d("2024-01-02")), (3L, d("2024-01-03")))
      .toDF("id", "day")
    wh.overwriteDatePartitions(data, "fact", "day")
    val dropped = wh.expirePartitions("fact", "day", d("2024-01-03"))
    assert(dropped.toSet == Set("day=2024-01-01", "day=2024-01-02"))
    val left = wh.read("fact").select($"id").collect().map(_.getLong(0))
    assert(left.toSeq == Seq(3L))
    // nothing else to expire
    assert(wh.expirePartitions("fact", "day", d("2024-01-03")).isEmpty)
    // missing table is a clean no-op
    assert(wh.expirePartitions("nope", "day", d("2024-01-03")).isEmpty)
  }
}
