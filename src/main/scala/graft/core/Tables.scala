package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-table access for a scale-factor directory (TESTDATA.md layout:
  * `{dir}/{name}.parquet`). The same helper doubles as the warehouse
  * reader for the traffic tables (RTMC_15MIN etc.) — a table is always
  * "directory of parquet", which at cluster scale becomes a
  * date-partitioned directory tree; Catalyst prunes partitions from
  * pushed-down date predicates automatically.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark's vectorized reader rejects. Read nanos as long (legacy conf)
    * and truncate to microsecond timestamps (matching DuckDB's ns→µs
    * comparison behavior; sub-µs precision is irrelevant downstream).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** Warehouse-style read (directory, possibly hive-partitioned). */
  def loadDir(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name")

  def exists(dir: String, name: String): Boolean =
    new java.io.File(s"$dir/$name.parquet").exists() ||
      new java.io.File(s"$dir/$name").exists()
}
