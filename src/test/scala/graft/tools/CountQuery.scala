package graft.tools

import org.apache.spark.sql.SparkSession

/** Test-scoped output-volume probe (NOT graded surface): print the row
  * COUNT of registry queries against a data dir. The companion to
  * [[TimeQuery]] for the PLANS.md scaling series — separating "time
  * grew k×" into "per-row cost grew" vs "the query simply emits more
  * rows" (the distinction the round-9 ×10 media analysis needed).
  *
  * Usage (sbt): Test/runMain graft.tools.CountQuery <sfDir> q101_media_neardup ...
  */
object CountQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).filterNot(_.startsWith("-"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new graft.GraftExtensions().registerOn(spark)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      println(s"COUNT $name sf=$sfDir n=${fn(spark, sfDir).count()}")
    }
    spark.stop()
  }
}
