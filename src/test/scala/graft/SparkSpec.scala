package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (Spark startup is
  * ~5 s; per-suite sessions would dominate test time).
  */
object TestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  def sqlCtx = spark.sqlContext
  import org.apache.spark.sql.{DataFrame, Row}

  /** Rows as sorted seq-of-seqs for order-insensitive comparison. */
  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
  def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)
}
