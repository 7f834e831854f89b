package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch profiling harness — delete before round end
object ProfScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new graft.GraftExtensions().registerOn(spark)
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    val d = graft.core.Tables.load(spark, dir, "documents")
    t("warmup count")(d.count())
    // feature frame + checkpoint
    val toks = coalesce(graft.ops.TextAnalysis.tokens(lower(col("text"))), lit(Array.empty[String]))
    val f = d.select(col("doc_id"),
        graft.expressions.VectorExprs.hashedBow(toks, 128).as("__bx"),
        (col("lang") === "en").cast("int").cast("double").as("__y"))
      .select(col("doc_id"), col("__bx.b").as("__b"), col("__bx.x").as("__x"), col("__y"))
      .localCheckpoint(false)
    val n = t("checkpoint+count")(f.count())
    System.err.println(s"[prof] nDocs=$n, partitions=${f.rdd.getNumPartitions}")
    // one full trainScore for comparison
    t("trainScore full")(graft.model.LogReg.trainScore(d, "text", "doc_id",
      col("lang") === "en", dim = 128, iters = 12).count())
    t("trainScore iters=1")(graft.model.LogReg.trainScore(d, "text", "doc_id",
      col("lang") === "en", dim = 128, iters = 1).count())
    t("trainScore iters=0")(graft.model.LogReg.trainScore(d, "text", "doc_id",
      col("lang") === "en", dim = 128, iters = 0).count())
    spark.stop()
  }
}
