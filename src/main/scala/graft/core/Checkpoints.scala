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
    * exactly the blocks this checkpoint pinned. Driver-loop use only
    * (the persistent-RDD id-set diff is not concurrency-safe).
    */
  def localCk(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val ck = df.localCheckpoint(false)
    val mine = (sc.getPersistentRDDs.keySet -- before).toSeq
    (ck, () => mine.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(false))))
  }

  /** No-op release handle (loop seed state that was never checkpointed). */
  val noRelease: () => Unit = () => ()
}
