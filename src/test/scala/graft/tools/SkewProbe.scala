package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-scoped probe (NOT graded surface): JOIN-SKEW evidence — the
  * third runtime-filter/replan instrument after DppProbe (partition
  * pruning) and BloomProbe (runtime bloom filters). At 100 TB a single
  * hot join key (a null/default sensor id, a boilerplate doc hash)
  * lands one reducer with a partition thousands of times the median;
  * the engine's two answers are AQE's runtime skew-join split
  * (`spark.sql.adaptive.skewJoin`) and the explicit salted join for
  * keys known to be pathological (`Skew.saltedJoin`).
  *
  * The fixture makes ~1/3 of the fact rows share ONE key (the rest
  * uniform over 100k keys), joined against a 100k-row dim, sort-merge
  * forced (broadcast off — a broadcastable dim has no skew problem).
  * Skew thresholds are lowered so the local fixture crosses them (the
  * defaults are sized for 256 MB partitions on real clusters).
  *
  * Prints per variant: wall (min of 2 warm), number of AQE partial
  * splits of the hot partition, and the row count (must match across
  * variants — the split/salt must never change the result).
  *
  * Usage: Test/runMain graft.tools.SkewProbe <sfDir>
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // local fixture is far under the cluster-sized skew thresholds
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      // keep AQE from hiding the skew by merging small partitions away
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        when(col("l_orderkey") % 3 === 0, lit(7L))
          .otherwise(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
            lit(100000L))).as("k"),
        // incompressible payload the aggregate must consume — without it
        // the hot partition (one constant key) snappy-compresses to KBs
        // and never crosses the skew threshold
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity")), lit(1000000L)).as("p"))
      // the AQE skew splitter cuts a hot reduce partition along MAP-task
      // boundaries. The sf0.1 fixture is ONE parquet file with ONE row
      // group = one mapper — unsplittable however skewed. Real corpora
      // (and any upstream shuffle stage) have many map tasks; model that
      // with a round-robin exchange so the skewed stage has 24 mappers.
      .repartition(24)
    val dim = spark.range(0L, 100000L)
      .select(col("id").as("k"), (col("id") % 97).as("w"))

    def plainJoin(): DataFrame =
      fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), (sum("w") + sum("p")).as("sw"))
    def saltedJoin(): DataFrame =
      graft.ops.Skew.saltedJoin(fact, dim, Seq("k"), salts = 32)
        .agg(count(lit(1)).as("n"), (sum("w") + sum("p")).as("sw"))

    def run(label: String, mk: () => DataFrame): Unit = {
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = mk()
        val r = df.collect().head
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, r, df)
      }
      val (_, r, df) = walls.head
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
      def walk(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
        case q: QueryStageExec => p +: walk(q.plan)
        case other => p +: other.children.flatMap(walk)
      }
      val splits = walk(df.queryExecution.executedPlan)
        .collect { case a: AQEShuffleReadExec => a }
        .map(_.partitionSpecs.count(
          _.getClass.getSimpleName.contains("PartialReducer")))
        .sum
      println(f"[skew] $label%-28s wall_min=${walls.drop(1).map(_._1).min}%.2fs " +
        s"skew_splits=$splits rows=${r.getLong(0)} sw=${r.getLong(1)}")
      if (sys.env.contains("SKEW_DEBUG")) {
        import org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec
        walk(df.queryExecution.executedPlan)
          .collect { case sq: ShuffleQueryStageExec => sq }
          .foreach { sq =>
            sq.mapStats.foreach { ms =>
              val sz = ms.bytesByPartitionId.sorted
              println(s"[skew-debug] stage=${sq.id} parts=${sz.length} " +
                s"max=${sz.last} p50=${sz(sz.length / 2)} sum=${sz.sum}")
            }
          }
        println(walk(df.queryExecution.executedPlan)
          .collect { case a: AQEShuffleReadExec =>
            a.partitionSpecs.map(_.getClass.getSimpleName).groupBy(identity)
              .map { case (k, v) => s"$k=${v.size}" }.mkString(",") }
          .mkString(" | "))
      }
    }

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    run("aqe_skew=off (straggler)", plainJoin)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    run("aqe_skew=on (runtime split)", plainJoin)
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    run("aqe_skew=on+force", plainJoin)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    run("aqe_skew=on+force+coalesce", plainJoin)
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
    run("aqe_skew=on+coalesce", plainJoin)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    run("salted_join (explicit)", saltedJoin)
    spark.stop()
  }
}
