package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.SparkSpec
import graft.core.Export
import graft.ops.WebText

/** Streaming leg for the JSONL interchange path: an Export-written
  * sharded corpus streamed back through `jsonlIngestStream`, scored
  * with the same batch Column chains, drained, and pinned hash-equal
  * to the batch computation — including across a second producer wave
  * against the same checkpoint (file-source exactly-once per file).
  */
class JsonlStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("shard", LongType)))

  private def score(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
      WebText.mojibakeCount(col("text")).as("moji_n"),
      WebText.nonAsciiCount(col("text")).as("non_ascii"))

  test("streamed scoring of a sharded JSONL export equals batch, across two producer waves") {
    import spark.implicits._
    val exDir = Files.createTempDirectory("jstream_src").toString
    val outDir = Files.createTempDirectory("jstream_out").toString + "/scored"
    val ckDir = Files.createTempDirectory("jstream_ck").toString

    def corpus(ids: Range) = ids.map { i =>
      val t = if (i % 3 == 0) s"doc $i cafÃ© text" else s"doc $i plain."
      (i.toLong, t)
    }.toDF("doc_id", "text").withColumn("shard", col("doc_id") % 4)

    val ex = new Export(spark, exDir)
    // wave 1: shards 0-3 from the first id block
    ex.writeJsonlShards(corpus(0 until 40), "docs", "shard")
    val stream1 = Streams.jsonlIngestStream(spark, s"$exDir/docs", schema)
    Streams.drainPlain(score(stream1), outDir, ckDir)

    // wave 2: a SECOND export run appends a new id block. Export
    // overwrite replaces shard dirs, so the producer side of a
    // continuous feed writes fresh subdirs instead:
    corpus(100 until 140).repartition(col("shard"))
      .write.partitionBy("shard").mode("append").json(s"$exDir/docs")
    val stream2 = Streams.jsonlIngestStream(spark, s"$exDir/docs", schema)
    Streams.drainPlain(score(stream2), outDir, ckDir)

    val streamed = spark.read.parquet(outDir)
    val batch = score(ex.readJsonlShards("docs", schema))
    assert(streamed.count() == 80)
    assert(rows(streamed) == rows(batch))
    // wave-1 files must not be re-emitted by the wave-2 drain
    assert(streamed.select("doc_id").distinct().count() == 80)
  }
}
