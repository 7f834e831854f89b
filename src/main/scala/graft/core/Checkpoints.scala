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
    val ck = df.localCheckpoint(false)
    (ck, releaseHandle(ck))
  }

  /** Release handle for an ALREADY-checkpointed frame: unpersists exactly
    * the checkpoint's own RDD. Degrading to a no-op is never silent —
    * [[noopHandleCount]] increments and the first occurrence logs a
    * warning, so a Spark upgrade that changes the checkpoint plan shape
    * is noticed instead of quietly re-introducing the O(rounds)
    * pinned-snapshot leak this object exists to fix (round-10 advice).
    */
  private[graft] def releaseHandle(ck: DataFrame): () => Unit = {
    val sc = ck.sparkSession.sparkContext
    ck.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        val id = l.rdd.id
        () => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false))
      case other =>
        noops.incrementAndGet()
        if (warned.compareAndSet(false, true))
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"localCk handle degraded to no-op: checkpoint plan is " +
            s"${other.getClass.getSimpleName}, not LogicalRDD — superseded " +
            "loop snapshots will stay pinned (bounded leak, never a wrong release)")
        noRelease
    }
  }

  /** Snapshot for an operator that RETURNS a lazy frame built on the
    * checkpoint (lshTopK, embeddingNearDups, semDedup, backoffScore):
    * the snapshot's last reader is the CALLER's terminal action, so no
    * release point exists inside the operator. The handle is parked in
    * a session registry instead — a harness (or library user) calls
    * [[releaseSessionSnapshots]] between queries, after each terminal
    * action, and every parked snapshot is dropped at once. Un-drained,
    * the leak is bounded by calls-per-session of non-evictable blocks
    * (round-11 advice: each such call otherwise pins its blocks for the
    * session's life with no release path at all); the registry itself
    * holds only tiny closures.
    */
  def sessionCk(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(false)
    parked.add(releaseHandle(ck))
    ck
  }

  /** Release every snapshot parked by [[sessionCk]] since the last
    * drain. SAFE ONLY between queries: a still-lazy plan over a parked
    * snapshot has no lineage to recompute from. Returns the number of
    * handles drained. Blocks already unpersisted elsewhere (e.g. a
    * bench harness's unpersist-all sweep) make the handle a no-op. */
  def releaseSessionSnapshots(): Int = {
    var n = 0
    var h = parked.poll()
    while (h != null) { h(); n += 1; h = parked.poll() }
    n
  }

  private val parked =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()
  private val noops = new java.util.concurrent.atomic.AtomicLong(0L)
  private val warned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** How many release handles degraded to no-ops this JVM (0 on every
    * supported Spark; observable leak signal otherwise). */
  def noopHandleCount: Long = noops.get()

  /** No-op release handle (loop seed state that was never checkpointed). */
  val noRelease: () => Unit = () => ()
}
