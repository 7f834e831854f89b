package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new GraftExtensions().registerOn(spark)
    // absorb JVM/codegen/scan warm-up so per-query timings are
    // steady-state; q139 additionally loads the custom-operator path
    // (AsOfJoinExec + its projections) whose first-use class loading
    // would otherwise be billed to one query
    Seq("q01_pricing_summary", "q139_asof_native").foreach(q =>
      SparkEntry.queries.get(q)
        .foreach(fn => try fn(spark, sfDir).count() catch { case _: Throwable => }))
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // 3-decimal times + qNN-prefix keys keep the whole line under the
    // harness's 2000-byte output tail even as the query count grows
    def f3(v: Double): String = "%.3f".format(v)
    def short(k: String): String = k.takeWhile(_ != '_')
    val qs = results.map { case (k, v, _) => s"\"" + short(k) + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // "value" placed last: the harness keeps only the final bytes of
    // output, so the headline total must survive front-truncation
    println(s"""{"metric":"total","unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","value":${f3(total)}}""")
    spark.stop()
  }
}
