package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The self-selecting storage policy for graph loop invariants
  * (round-10 verdict: `graft.graph.compactStorage` was a manual knob —
  * the difference between PageRank surviving ×100 on 8 GiB and dying —
  * and an engine designed for 100 TB must pick the policy itself).
  * The auto decision: cache compact, count (the loop's first action
  * would materialize the cache anyway, so the count is free), and
  * upgrade to a pinned checkpoint only when the deserialized estimate
  * comfortably fits the storage pool.
  */
class GraphStorageSpec extends SparkSpec {
  import spark.implicits._

  private def chain(n: Long) =
    (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")

  test("auto policy pins small graphs and releases invariants at CC's terminal") {
    spark.conf.unset("graft.graph.compactStorage")
    Graph.budgetOverride = None
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val comp = Graph.connectedComponents(chain(40), "a", "b")
    assert(Graph.lastDecision.startsWith("pinned"), Graph.lastDecision)
    assert(comp.select(countDistinct($"comp")).head().getLong(0) == 1L)
    assert(comp.count() == 40L)
    // e + nodes released after the loop's final count action: only the
    // final round snapshot may remain live
    val live = sc.getPersistentRDDs.size - before
    assert(live <= 1, s"loop invariants leaked: $live persistent RDDs")
  }

  test("auto policy goes compact when the table exceeds the budget") {
    spark.conf.unset("graft.graph.compactStorage")
    Graph.budgetOverride = Some(1000L) // ~25 rows of 3-long frames
    try {
      val comp = Graph.connectedComponents(chain(40), "a", "b")
      assert(Graph.lastDecision.startsWith("compact"), Graph.lastDecision)
      // compact-evictable storage is a policy change, never a result change
      assert(comp.select(countDistinct($"comp")).head().getLong(0) == 1L)
      assert(comp.count() == 40L)
    } finally Graph.budgetOverride = None
  }

  test("explicit conf overrides auto in both directions") {
    Graph.budgetOverride = Some(1000L) // auto would say compact...
    spark.conf.set("graft.graph.compactStorage", "false")
    try {
      val r = Graph.pageRank(chain(10), "a", "b", iterations = 2)
      assert(r.count() == 10L)
      // ...but the explicit pin wins: no auto decision was recorded
      spark.conf.set("graft.graph.compactStorage", "true")
      val r2 = Graph.pageRank(chain(10), "a", "b", iterations = 2)
      assert(rows(r.orderBy($"node")) == rows(r2.orderBy($"node")))
    } finally {
      spark.conf.unset("graft.graph.compactStorage")
      Graph.budgetOverride = None
    }
  }

  test("an unrecognized storage-conf value fails loudly instead of " +
    "silently falling through to auto") {
    spark.conf.set("graft.graph.compactStorage", "yes")
    try {
      val e = intercept[IllegalArgumentException] {
        Graph.connectedComponents(chain(4), "a", "b").count()
      }
      assert(e.getMessage.contains("true|false|auto"))
    } finally spark.conf.unset("graft.graph.compactStorage")
    // "auto" and "" are explicit spellings of the default decision path
    spark.conf.set("graft.graph.compactStorage", "auto")
    try assert(Graph.connectedComponents(chain(4), "a", "b").count() == 4L)
    finally spark.conf.unset("graft.graph.compactStorage")
  }

  test("pageRank tol-mode convergence releases the loop invariants") {
    spark.conf.unset("graft.graph.compactStorage")
    Graph.budgetOverride = None
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    // star graph converges immediately: first tol check exits the loop
    val edges = (1L until 20L).flatMap(i => Seq((0L, i), (i, 0L))).toDF("a", "b")
    val r = Graph.pageRank(edges, "a", "b", iterations = 40,
      checkpointEvery = 2, tolScaled = Long.MaxValue / 2)
    assert(r.count() == 20L)
    val live = sc.getPersistentRDDs.size - before
    // converged exit: invariants dropped, only the final rank snapshot lives
    assert(live <= 1, s"invariants leaked after converged exit: $live")
  }

  test("estRowBytes: near-exact on fixed-width graph rows") {
    val s = chain(4).withColumn("w", lit(1L)).schema
    assert(Graph.estRowBytes(s) == 16L + 3 * 8L)
  }
}
