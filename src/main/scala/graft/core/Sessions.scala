package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults follow the 100 TB design posture scaled to the local[32] test
  * harness: AQE on (runtime join-strategy switch + skew-join splitting),
  * shuffle partitions sized to cores (on a real cluster this is
  * cores*2..3 or AQE-coalesced), UTC session time zone (the reference
  * pins tz="UTC", see /root/reference/R/_analyze_data.R:229-231).
  */
object Sessions {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // builder-time extensions only apply at first construction; a warm
    // JVM (tests, sbt) reuses the session, so register post-hoc too
    new graft.GraftExtensions().registerOn(spark)
    spark
  }
}
