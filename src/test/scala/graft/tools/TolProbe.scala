package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scoped measurement for pageRank's tolScaled early exit (NOT
  * graded surface): on the q104 trade graph, measure (a) the max
  * per-node rank delta across each checkpoint-cadence window — the
  * quantity the in-loop convergence check compares to `tolScaled` —
  * and (b) wall time of a tolerance run vs the fixed-count run. Feeds
  * the PLANS.md round-9 tolerance-vs-iterations table.
  *
  * Usage: Test/runMain graft.tools.TolProbe <sfDir>
  */
object TolProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = spark.read.parquet(s"$dir/orders.parquet").select(col("o_orderkey"), col("o_custkey"))
    val l = spark.read.parquet(s"$dir/lineitem.parquet").select(col("l_orderkey"), col("l_suppkey"))
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), (col("l_suppkey") + lit(10000000L)).as("supp"))
      .distinct()
    val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionAll(pairs.select(col("supp").as("src"), col("cust").as("dst")))
      .localCheckpoint(true)
    def ranks(iters: Int) = graft.ops.Graph.pageRank(edges, "src", "dst",
      iterations = iters, assumeDistinct = true, allNodesReceive = true)
    // per-cadence-window max delta: what the in-loop check sees
    var prev = ranks(4).localCheckpoint(true)
    (2 to 8).foreach { k =>
      val cur = ranks(4 * k).localCheckpoint(true)
      val d = cur.join(prev.select(col("node"), col("rank_scaled").as("__p")), Seq("node"))
        .agg(max(abs(col("rank_scaled") - col("__p")))).head().getLong(0)
      println(s"[tolprobe] window=${4 * (k - 1)}..${4 * k} maxDelta=$d")
      prev = cur
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tFixed) = time(ranks(32).count())
    val (_, tTol) = time(graft.ops.Graph.pageRank(edges, "src", "dst",
      iterations = 32, assumeDistinct = true, allNodesReceive = true,
      tolScaled = 1000000L).count())
    println(s"[tolprobe] fixed32=${"%.2f".format(tFixed)}s tol1e6_cap32=${"%.2f".format(tTol)}s")
    spark.stop()
  }
}
