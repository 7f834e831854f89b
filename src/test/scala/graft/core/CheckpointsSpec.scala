package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The snapshot-release contract behind the iteration loops (PageRank,
  * connected components, rep propagation, BPE): a localCheckpoint's
  * blocks are NOT released by Dataset.unpersist, so loops must release
  * superseded snapshots through the [[Checkpoints.localCk]] handle —
  * and only after a successor has been materialized.
  */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("localCk handle releases exactly the pinned checkpoint blocks") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val (ck, rel) = Checkpoints.localCk(Seq(1L, 2L, 3L).toDF("x"))
    assert(sc.getPersistentRDDs.size == before + 1)
    assert(ck.count() == 3) // materialize
    rel()
    assert(sc.getPersistentRDDs.size == before)
    // releasing a predecessor AFTER its successor materialized keeps
    // the successor fully usable (its own blocks are the data source)
    val (a, relA) = Checkpoints.localCk(Seq(1L, 2L).toDF("x"))
    val (b, relB) = Checkpoints.localCk(a.withColumn("y", $"x" * 2))
    assert(b.count() == 2) // materializes b (pulling a's blocks once)
    relA()
    assert(rows(b) == Seq(Seq(1L, 2L), Seq(2L, 4L)))
    relB()
    assert(sc.getPersistentRDDs.size == before)
  }

  test("connected components releases superseded round snapshots") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    // a 40-node chain forces several doubling rounds — each round
    // checkpoints, and every superseded snapshot must be released
    val edges = (0L until 39L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = graft.ops.Graph.connectedComponents(edges, "a", "b")
    assert(comp.select(countDistinct($"comp")).head().getLong(0) == 1L)
    assert(comp.count() == 40L)
    // live: edge table + node table + final round's snapshot (+ slack),
    // NOT one snapshot per round
    val live = sc.getPersistentRDDs.size - before
    assert(live <= 4, s"round snapshots leaked: $live persistent RDDs")
  }

  test("localCk release never captures OTHER persistence in the plan") {
    // the round-10 review bug: building a checkpoint compiles its input
    // plan, which lazily REGISTERS any caches that plan uses (e.g.
    // Graph.stableBig's columnar caches under compactStorage) — a
    // persistent-RDD set-diff handle captured those and the first
    // release destroyed the loop-invariant caches. The handle must
    // release exactly the checkpoint's own RDD.
    val sc = spark.sparkContext
    val base = Seq(1L, 2L, 3L).toDF("x")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (ck, rel) = Checkpoints.localCk(base.withColumn("y", $"x" + 1))
    val ckId = ck.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
      case other => fail(s"checkpoint plan is not a LogicalRDD: $other")
    }
    assert(ck.count() == 3) // materializes the checkpoint AND the cache
    val beforeRel = sc.getPersistentRDDs.keySet
    rel()
    val released = beforeRel -- sc.getPersistentRDDs.keySet
    assert(released == Set(ckId),
      s"release touched $released, expected exactly the checkpoint $ckId")
    // the cache is intact and still computes
    assert(base.count() == 3)
    base.unpersist()
  }

  test("releaseHandle degrade is counted, never silent") {
    // round-10 advice: a Spark upgrade that stops exposing checkpoints
    // as LogicalRDD must be NOTICED, not silently re-pin every round
    val before = Checkpoints.noopHandleCount
    val h = Checkpoints.releaseHandle(Seq(1L).toDF("x")) // not a checkpoint
    assert(Checkpoints.noopHandleCount == before + 1)
    h() // the degraded handle is a safe no-op
    // the real loop path never increments
    val (ck, rel) = Checkpoints.localCk(Seq(1L, 2L).toDF("x"))
    assert(ck.count() == 2)
    rel()
    assert(Checkpoints.noopHandleCount == before + 1)
  }

  test("sessionCk parks a handle; releaseSessionSnapshots drains exactly " +
    "the parked blocks") {
    // asserts on the SPECIFIC checkpoint RDD ids, not global persistent
    // counts — ContextCleaner unpersists garbage from earlier suites
    // asynchronously, so size-based equality is inherently racy
    val sc = spark.sparkContext
    Checkpoints.releaseSessionSnapshots() // drain anything a prior suite parked
    val a = Checkpoints.sessionCk(Seq(1L, 2L).toDF("x"))
    val b = Checkpoints.sessionCk(Seq(3L).toDF("x"))
    def ckId(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.logical match {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
        case other => fail(s"checkpoint plan is not a LogicalRDD: $other")
      }
    val (ia, ib) = (ckId(a), ckId(b))
    assert(a.count() == 2 && b.count() == 1) // materialize both snapshots
    assert(sc.getPersistentRDDs.contains(ia) && sc.getPersistentRDDs.contains(ib))
    assert(Checkpoints.releaseSessionSnapshots() == 2)
    assert(!sc.getPersistentRDDs.contains(ia) && !sc.getPersistentRDDs.contains(ib),
      "parked snapshots must be fully released by one drain")
    assert(Checkpoints.releaseSessionSnapshots() == 0, "drain is idempotent")
  }

  test("compact-storage mode: CC stays correct end to end") {
    spark.conf.set("graft.graph.compactStorage", "true")
    try {
      val edges = (0L until 39L).map(i => (i, i + 1)).toDF("a", "b")
      val comp = graft.ops.Graph.connectedComponents(edges, "a", "b")
      assert(comp.select(countDistinct($"comp")).head().getLong(0) == 1L)
      assert(comp.count() == 40L)
    } finally spark.conf.unset("graft.graph.compactStorage")
  }

  test("minhash fixpoint propagation releases superseded rounds") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    // long duplicate chains exercise propagate(rounds = -1)
    val docs = (0L until 24L).map(i => (i, s"dup dup dup shared text body ${i / 12}"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.minhashDedup(docs, "text", "doc_id",
      shingleN = 3, numHashes = 16, bands = 4, threshold = 0.5,
      propagationRounds = -1)
    assert(out.count() == 24L)
    val live = sc.getPersistentRDDs.size - before
    assert(live <= 6, s"propagation snapshots leaked: $live persistent RDDs")
  }
}
