package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class WarehouseBucketSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables sort-merge join with zero shuffle") {
    val wh = new Warehouse(spark, Files.createTempDirectory("bwh").toString)
    val facts = (1L to 10000L).map(i => (i % 500, i, i * 2.0)).toDF("k", "id", "v")
    val dims = (0L until 500L).map(i => (i, s"name_$i")).toDF("k", "name")
    wh.writeBucketed(facts, "b_facts", Seq("k"), 8)
    wh.writeBucketed(dims, "b_dims", Seq("k"), 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.enabled", "false") // stable plan string
      val joined = wh.readBucketed("b_facts")
        .join(wh.readBucketed("b_dims"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() == 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("bucketed aggregation on the bucket key avoids the shuffle") {
    val wh = new Warehouse(spark, Files.createTempDirectory("bwh2").toString)
    wh.writeBucketed((1L to 1000L).map(i => (i % 50, i)).toDF("k", "v"),
      "b_agg", Seq("k"), 4)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val agg = wh.readBucketed("b_agg").groupBy($"k").agg(sum($"v").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(agg.count() == 50)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
