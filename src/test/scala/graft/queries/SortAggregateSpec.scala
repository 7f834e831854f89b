package graft.queries

import graft.SparkSpec

/** SortAggregate tripwire: every query in the registry is planned
  * against the smoke fixtures and checked for SortAggregate — the plan
  * shape behind the round-13 scale findings. A declarative aggregate
  * whose buffer type is immutable (any `min/max(struct(...))`,
  * `min_by/max_by` with a struct operand) cannot hash-aggregate, so
  * Spark plans a SortAggregate that SORTS THE ENTIRE input stream per
  * partition — measured at ×100 as a task-memory query-killer when the
  * stream is corpus-sized (commit 10ad36b). The fix pattern is
  * [[graft.ops.Dedup.packRanks]]: ride the lexicographic witness on one
  * long, recover group constants with plain min/max.
  *
  * Aggregates over BOUNDED streams are whitelisted BY NAME with the
  * bound's rationale — the point is that a sort over a bounded stream
  * is a decision, never a silent default. (ObjectHashAggregate —
  * collect_list, percentile — is not SortAggregate and is not banned.
  * KEYLESS SortAggregates — `SortAggregate(key=[], …)`, e.g. a global
  * `min(stringCol)` — are not flagged either: with no grouping keys
  * the operator requires no child ordering, so NO sort is inserted
  * and it degenerates to a single running buffer per partition.)
  */
class SortAggregateSpec extends SparkSpec {

  new graft.GraftExtensions().registerOn(spark)

  private val sfDir = "/root/testdata/sf0.001"

  /** query name -> max allowed SortAggregate count (partial + final
    * pairs both appear in the plan string), each with its bound.
    */
  private val whitelist: Map[String, Int] = Map(
    // Dedup.incrementalDedup's best-match pick (max(struct(jaccard,
    // -oid))) runs on the POST-VERIFY edge stream — pairs that already
    // cleared the exact-Jaccard bar, survivor-sized by construction
    // (deliberate: commit 10ad36b).
    "q85_incremental_dedup" -> 2,
    // Similarity.semDedup's representative pick (min(struct(cand,
    // sim))) runs on the POST-THRESHOLD pair stream — cosine >= t
    // survivors only, survivor-sized by construction (deliberate:
    // commit 10ad36b).
    "q71_semdedup" -> 2)

  private val detector = "SortAggregate\\(key=\\[[^\\]]".r

  test("no unlisted SortAggregate anywhere in the registry") {
    val offenders = Registry.all.flatMap { q =>
      val plan =
        try q.run(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
      val n = detector.findAllIn(plan).size
      if (n > whitelist.getOrElse(q.name, 0)) Some(s"${q.name}($n)") else None
    }
    assert(offenders.isEmpty,
      s"unlisted SortAggregates in: ${offenders.mkString(", ")}")
  }

  test("the detector catches a deliberately reverted packed witness") {
    // rebuild the EXACT shape commit 8a3c49c removed from
    // similarityJoinPrefix — min(struct(ra, rb)) on a keyed stream —
    // and prove the tripwire regex fires on it (and stays quiet on the
    // packed-long replacement): a future refactor that quietly
    // re-introduces a struct buffer cannot pass this suite.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cand = Seq((1L, 2L, 3, 4), (1L, 2L, 5, 1)).toDF("id_a", "id_b", "ra", "rb")
    val reverted = cand.groupBy($"id_a", $"id_b")
      .agg(min(struct($"ra", $"rb")).as("w"))
    assert(detector.findAllIn(
      reverted.queryExecution.executedPlan.toString).size >= 2,
      "the reverted min(struct) shape must plan as keyed SortAggregate")
    // Dedup.packRanks is private[ops]; its expression inlined
    val packed = cand.groupBy($"id_a", $"id_b")
      .agg(min(shiftleft($"ra".cast("long"), 31) + $"rb".cast("long")).as("w"))
    assert(detector.findAllIn(
      packed.queryExecution.executedPlan.toString).isEmpty,
      "the packed-long shape must stay a HashAggregate")
  }
}
