package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.SparkSpec

class ExportSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("shard", LongType)))

  test("jsonl round trip preserves hostile text byte-exactly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("exp1").toString
    val ex = new Export(spark, tmp)
    val hostile = Seq(
      (1L, "plain"),
      (2L, "line\nbreak\ttab"),
      (3L, "quote\" back\\slash"),
      (4L, "unicode é中😀"),
      (5L, " leading and trailing "),
      (6L, "{\"json\":\"looking\"}"))
    val df = hostile.toDF("id", "text")
      .withColumn("shard", col("id") % 2)
    ex.writeJsonlShards(df, "t", "shard")
    val back = ex.readJsonlShards("t", schema)
      .select("id", "text", "shard")
    assert(rows(back) == rows(df.select("id", "text", "shard")))
  }

  test("shard directories follow the column, not task layout") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("exp2").toString
    val ex = new Export(spark, tmp)
    val df = (0L until 40L).toDF("id")
      .withColumn("text", concat(lit("doc "), col("id")))
      .withColumn("shard", col("id") % 4)
    ex.writeJsonlShards(df, "t", "shard")
    val m = ex.shardManifest("t", "shard")
    assert(m.map(_.getString(0)) == Seq("0", "1", "2", "3"))
    // repartition(col) before partitionBy -> one file per shard
    assert(m.forall(_.getLong(1) == 1L))
    assert(m.forall(_.getLong(2) > 0L))
    // membership is content-derived: every row in shard k has id%4==k
    val back = ex.readJsonlShards("t", schema)
    assert(back.where(col("id") % 4 =!= col("shard")).count() == 0)
  }

  test("maxRecordsPerFile splits oversized shards, manifest sees it") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("exp3").toString
    val ex = new Export(spark, tmp)
    val df = (0L until 30L).toDF("id")
      .withColumn("text", lit("x"))
      .withColumn("shard", lit(0L))
    ex.writeJsonlShards(df, "t", "shard", maxRecordsPerFile = 10L)
    val m = ex.shardManifest("t", "shard")
    assert(m.size == 1 && m.head.getLong(1) == 3L)
    assert(ex.readJsonlShards("t", schema).count() == 30L)
  }
  test("schema evolution: old shards lacking a new column read as nulls") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("exp4").toString
    val ex = new Export(spark, tmp)
    // generation 1: no quality column
    ex.writeJsonlShards(
      Seq((1L, "old")).toDF("id", "text").withColumn("shard", lit(0L)),
      "t", "shard")
    // generation 2 appends shards WITH the new column
    Seq((2L, "new", 0.9)).toDF("id", "text", "quality")
      .withColumn("shard", lit(1L))
      .repartition(col("shard"))
      .write.partitionBy("shard").mode("append").json(tmp + "/t")
    val evolved = StructType(schema.fields.patch(2,
      Seq(StructField("quality", org.apache.spark.sql.types.DoubleType)), 0))
    val back = ex.readJsonlShards("t", evolved).orderBy("id").collect()
    assert(back.length == 2)
    assert(back(0).getLong(0) == 1L && back(0).isNullAt(2)) // old row: null
    assert(back(1).getLong(0) == 2L && back(1).getDouble(2) == 0.9)
  }
}
