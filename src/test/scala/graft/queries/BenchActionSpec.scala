package graft.queries

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions.{col, count, lit, md5}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Join}
import org.apache.spark.sql.util.QueryExecutionListener
import graft.SparkSpec

/** Structural guard for the bench action (round-12 verdict ask #3,
  * generalized): rounds ≤ 12 benched with `count()` plus a
  * hand-maintained materialize tag for known scan-shaped rows — and a
  * registry-wide audit this round showed the voided-work class was far
  * wider than the tag (count() erases unused-output windows, eliminates
  * unique-key joins such as the sentence-dedup keep join, and reduces
  * ~20 projection rows to bare scans). `Registry.consume` now
  * materializes EVERY row through the noop sink, which closes the class
  * by construction — and THIS spec is the tripwire that keeps it
  * closed: if consume ever regresses toward a count-shaped action, the
  * probes below lose their operators and fail loudly.
  *
  * Probe 1 is the round-11 poster child (a pure projection whose whole
  * cost is an expression count() prunes); probe 2 is the round-13 one
  * (a first-occurrence decision whose keep join count() eliminates via
  * aggregate-key uniqueness). Both assert on the OPTIMIZED plan the
  * executed action actually carried, captured by a listener — not on
  * the plan of the unconsumed frame.
  */
class BenchActionSpec extends SparkSpec {

  new graft.GraftExtensions().registerOn(spark)

  private val sfDir = "/root/testdata/sf0.001"

  /** Runs `Registry.consume` on the query and returns the optimized
    * plan of the execution the action triggered. */
  private def consumedPlan(name: String,
                           df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val captured = new AtomicReference[QueryExecution]()
    val l = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
        captured.compareAndSet(null, qe)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      Registry.consume(name, df)
      // the execution listener bus is async; poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (captured.get() == null && System.nanoTime() < deadline)
        Thread.sleep(50)
      val qe = captured.get()
      assert(qe != null, "no QueryExecution captured from the bench action")
      qe.optimizedPlan
    } finally spark.listenerManager.unregister(l)
  }

  test("bench action pays for pure projections (no column-pruning void)") {
    val probe = graft.core.Tables.load(spark, sfDir, "documents")
      .select(md5(col("text")).as("h"))
    // the count-shaped action this spec guards against WOULD void it:
    val countPlan = probe.groupBy().agg(count(lit(1))).queryExecution.optimizedPlan
    assert(!countPlan.toString.contains("md5"),
      "count() no longer prunes the probe — rewrite the probe so the guard stays meaningful")
    val plan = consumedPlan("probe_projection", probe)
    assert(plan.toString.contains("md5"),
      s"bench action let the projection be pruned:\n$plan")
  }

  test("bench action pays for decision joins (no unique-key join elimination)") {
    val q = Registry.all.find(_.name == "q163_sentence_dedup").get
    val df = q.run(spark, sfDir)
    def ops(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      (p.collect { case j: Join => j }.size,
        p.collect { case g: Generate => g }.size,
        p.collect { case a: Aggregate => a }.size)
    val (fj, fg, fa) = ops(df.queryExecution.optimizedPlan)
    assert(fj >= 1 && fg >= 1 && fa >= 2,
      s"q163 plan shape changed (join=$fj generate=$fg agg=$fa) — re-anchor this spec")
    // count() eliminates the keep join + the winners decision entirely:
    val (cj, cg, _) =
      ops(df.groupBy().agg(count(lit(1))).queryExecution.optimizedPlan)
    assert(cj < fj && cg < fg,
      "count() no longer voids q163's decision — update the spec's rationale")
    val (bj, bg, ba) = ops(consumedPlan(q.name, q.run(spark, sfDir)))
    graft.core.Checkpoints.releaseSessionSnapshots()
    graft.core.Scratch.releaseAll()
    assert(bj >= fj && bg >= fg && ba >= fa,
      s"bench action dropped part of q163's decision (join=$bj generate=$bg agg=$ba)")
  }
}
