package graft.tools

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Runtime shuffle probe for the q186 trainer-feed chain (test-scoped,
  * not graded surface): executes the full composed query and reports
  * how often — and how heavily — data crossed the wire, from stage
  * metrics. A plan dump can't answer this here: the chain's snapshots
  * (curated corpus, minhash shingles, prefix-sum range partitioning)
  * hide their upstream exchanges behind LogicalRDDs, so the honest
  * reading is the executed stages' shuffle bytes — the round-12
  * verdict's "does the chain fuse or does every stage pay its own
  * shuffle" number for PLANS.md.
  *
  * Usage: Test/runMain graft.tools.ChainProbe <sfDir>
  */
object ChainProbe {

  private final class ShuffleTally extends SparkListener {
    var stages = 0
    var shuffleWriteStages = 0
    var shuffleWriteBytes = 0L
    var shuffleReadBytes = 0L
    var inputBytes = 0L
    // per-stage rows for the attribution dump: which stages own the wire
    // bill (stage name = the callsite Spark records for the stage root)
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long, Long, Long)]
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val m = e.stageInfo.taskMetrics
      stages += 1
      if (m.shuffleWriteMetrics.bytesWritten > 0) shuffleWriteStages += 1
      shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
      shuffleReadBytes += m.shuffleReadMetrics.totalBytesRead
      inputBytes += m.inputMetrics.bytesRead
      // the stage "name" is an AQE thread-pool frame; the first graft.*
      // frame in the callsite stack is the operator that owns the stage
      val site = e.stageInfo.details.linesIterator
        .find(_.contains("graft.")).map(_.trim.take(110))
        .getOrElse(e.stageInfo.name.linesIterator.next().take(90))
      rows += ((e.stageInfo.stageId, site,
        m.shuffleWriteMetrics.bytesWritten,
        m.shuffleReadMetrics.totalBytesRead,
        m.inputMetrics.bytesRead))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val query = if (args.length > 1) args(1) else "q186_trainer_feed"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    graft.core.Sessions.engineConfs.foreach { case (k, v) =>
      spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("WARN")
    new graft.GraftExtensions().registerOn(spark)
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    val t0 = System.nanoTime()
    val df = graft.queries.Registry.queries(query)(spark, sfDir)
    // the bench's own action: noop-write for materialize-tagged rows so
    // count-elimination can't prune the operator under measurement; for
    // agg/sort-rooted rows count() is already honest — but a PROBE wants
    // the full result computed either way, so always noop-write here
    df.write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    // listener events are async (the bus is private API); a short sleep
    // after the terminal action drains them for this probe's purposes
    Thread.sleep(2000)
    println(f"CHAIN sf=$sfDir q=$query time=$dt%.2f s stages=${tally.stages} " +
      s"shuffleWriteStages=${tally.shuffleWriteStages} " +
      f"shuffleWriteMB=${tally.shuffleWriteBytes / 1e6}%.1f " +
      f"shuffleReadMB=${tally.shuffleReadBytes / 1e6}%.1f " +
      f"inputMB=${tally.inputBytes / 1e6}%.1f")
    println("TOP STAGES by shuffle write:")
    tally.rows.sortBy(-_._3).take(12).foreach { case (id, nm, w, r, in) =>
      println(f"  stage=$id%4d writeMB=${w / 1e6}%8.1f readMB=${r / 1e6}%8.1f " +
        f"inputMB=${in / 1e6}%8.1f  $nm")
    }
    spark.stop()
  }
}
