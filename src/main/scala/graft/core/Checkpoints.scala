package graft.core

import org.apache.spark.sql.DataFrame

/** Targeted release of superseded `localCheckpoint` snapshots inside
  * driver-side iteration loops (PageRank, connected components, rep
  * pointer propagation, BPE training).
  *
  * Why this exists: `Dataset.unpersist()` does NOT release a local
  * checkpoint's blocks — they belong to an internal RDD the checkpoint
  * call persisted, not to the cache manager — so a loop that
  * re-checkpoints every round pins EVERY round's snapshot for the life
  * of the query. Bounded rounds keep that survivable, but storage
  * grows O(rounds) when O(1) snapshots are live, and at large scale
  * pinned blocks compete with execution memory in the unified pool
  * (see PLANS.md round-10 for the measured ×100 memory cliff).
  *
  * [[localCk]] captures exactly which persistent RDD ids one
  * checkpoint call created and returns a release handle. CONTRACT: the
  * caller must only invoke the handle after the snapshot's SUCCESSOR
  * has been materialized by an action — a local checkpoint has no
  * lineage to recompute from, so releasing blocks a still-lazy
  * downstream plan depends on would fail the query. Loops with a
  * per-round driver action (convergence count, merge pick, tolerance
  * delta) have that action for free; fully-lazy chains must keep their
  * snapshots pinned.
  */
object Checkpoints {

  /** `df.localCheckpoint(eager = false)` plus a handle that unpersists
    * exactly the checkpoint's own RDD. The id is read off the returned
    * plan's LogicalRDD — NOT a persistent-RDD id-set diff: building the
    * checkpoint compiles the input plan, and that compilation lazily
    * registers any OTHER persistence the plan uses (e.g. the evictable
    * columnar caches of `Graph.stableBig` under
    * `graft.graph.compactStorage=true`), so a set diff would capture
    * those loop-invariant caches and the first release would silently
    * destroy them (review finding, round-10). If a future Spark stops
    * exposing the plan as LogicalRDD the handle degrades to a no-op —
    * a bounded leak, never a wrong release.
    */
  def localCk(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val ck = df.localCheckpoint(false)
    val rddId = ck.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd.id)
      case _ => None
    }
    (ck, () => rddId.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(false))))
  }

  /** No-op release handle (loop seed state that was never checkpointed). */
  val noRelease: () => Unit = () => ()
}
