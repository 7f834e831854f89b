package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.SparkSpec
import graft.core.Warehouse

class PublishStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("publishStream: one immutable version per batch, keyed idempotent fold") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("pub_src").toString
    val ckDir = Files.createTempDirectory("pub_ck").toString
    val whRoot = Files.createTempDirectory("pub_wh").toString
    val w = new Warehouse(spark, whRoot)

    def stream() = Streams.publishStream(
      spark.readStream.schema(schema).json(srcDir),
      "id", "corpus", whRoot, ckDir)

    // wave 1: ids 0-9
    (0L until 10L).map(i => (i, s"doc $i")).toDF("id", "text")
      .coalesce(1).write.mode("append").json(srcDir)
    stream()
    assert(w.versions("corpus") == Seq(1))
    assert(w.readCurrent("corpus").count() == 10)

    // wave 2 overlaps wave 1: only the 5 new keys may fold in
    (5L until 15L).map(i => (i, s"doc $i")).toDF("id", "text")
      .coalesce(1).write.mode("append").json(srcDir)
    stream()
    assert(w.versions("corpus") == Seq(1, 2))
    assert(w.readCurrent("corpus").count() == 15)
    assert(w.readVersion("corpus", 1).count() == 10) // immutable history
    assert(w.readCurrent("corpus").select("id").distinct().count() == 15)

    // no new arrivals -> no new version
    stream()
    assert(w.versions("corpus") == Seq(1, 2))

    // wave 3 duplicates a key WITHIN one batch: insert-only must hold
    // intra-batch too — exactly one survivor for id 20 (r9 advice)
    Seq((20L, "first"), (20L, "second"), (21L, "doc 21"))
      .toDF("id", "text").coalesce(1).write.mode("append").json(srcDir)
    stream()
    assert(w.versions("corpus") == Seq(1, 2, 3))
    assert(w.readCurrent("corpus").count() == 17)
    assert(w.readCurrent("corpus").where($"id" === 20L).count() == 1)

    // the published history is diffable
    val diff = graft.ops.Versioning.datasetDiff(
      w.readVersion("corpus", 1), w.readVersion("corpus", 2),
      "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == (10L until 15L).map(_ -> "added").toMap)
  }
}
