package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-pair construction for RLHF / DPO training data: per
  * prompt, pick the best- and worst-scored response and emit them as a
  * (chosen, rejected) pair — the standard reduction from "N scored
  * responses per prompt" to the pairwise format preference-tuned
  * trainers consume.
  */
object Preference {

  /** One (chosen, rejected) pair per prompt group.
    *
    * chosen = the response maximizing (score, then LOWEST id on ties);
    * rejected = the response minimizing (score, then lowest id on
    * ties). Groups with fewer than two responses, or whose best-worst
    * score gap is under `minGap`, are dropped — a pair whose margin the
    * scorer can't distinguish is training noise, and DPO-style losses
    * assume chosen strictly beats rejected. With `minGap = 0` a group
    * whose scores are all equal degenerates to chosen == rejected
    * (both tiebreaks land on the lowest id); keep `minGap >= 1` unless
    * the caller filters such pairs itself.
    *
    * Scale shape: two hash aggregates on the prompt key around one
    * co-partitioned join — partial aggregation collapses each partition
    * to one (max score, min score, count) row per prompt before the
    * exchange, the join back reuses that partitioning (no new
    * exchange), and the winning ids fall out of conditional mins; no
    * window sort, no SortAggregate, and response payloads (the texts)
    * never move — join them back by id AFTER pairing if the trainer
    * needs them. Rows with a NULL id or score are excluded up front.
    *
    * CALLER CONTRACT: `idCol` must be SIGNED NUMERIC. (Historical:
    * the tiebreak once ordered by the id's NEGATION, where a string id
    * silently became a NULL sort key. The conditional-min form no
    * longer negates, but the contract is kept — numeric response ids
    * are what every caller has, and relaxing a fail-fast check is an
    * API change for another day.) Hash or dense-rank non-numeric
    * response ids first.
    */
  def pairs(responses: DataFrame, groupCol: Column, idCol: Column,
            scoreCol: Column, minGap: Long = 1L): DataFrame = {
    require(minGap >= 0, s"minGap must be >= 0, got $minGap")
    // fail fast on the SIGNED-NUMERIC contract instead of leaning on the
    // scaladoc (round-11 advice); see the contract note above
    val idType = responses.select(idCol.as("__id")).schema.head.dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"idCol must resolve to a signed numeric type (tiebreak negates " +
        s"it); got ${idType.simpleString} — hash or dense-rank " +
        "non-numeric response ids first")
    // Two hash aggregates + one co-partitioned join, NOT a single
    // max_by/min_by over structs: struct operands give the aggregate an
    // immutable buffer, which plans as a keyed SortAggregate — a
    // per-partition sort of the ENTIRE response stream (round-14
    // tripwire; the task-memory failure class of commit 10ad36b). Here
    // the score extremes are plain min/max (mutable buffers), the join
    // back is on the aggregate's own output partitioning (no new
    // exchange; AQE skew-splits a hot prompt), and the argmin ids are
    // conditional mins — every aggregate hash-aggregable, semantics
    // identical: chosen = max score tie→min id, rejected = min score
    // tie→min id.
    val narrow = responses
      .select(groupCol.as("prompt_id"), idCol.as("__id"), scoreCol.as("__s"))
      .where(col("__id").isNotNull && col("__s").isNotNull)
    val stats = narrow.groupBy(col("prompt_id"))
      .agg(max(col("__s")).as("__cs"), min(col("__s")).as("__rs"),
        count(lit(1)).as("n_responses"))
      .where(col("n_responses") >= 2 && col("__cs") - col("__rs") >= minGap)
    narrow.join(stats, Seq("prompt_id"))
      .groupBy(col("prompt_id"))
      .agg(
        min(when(col("__s") === col("__cs"), col("__id"))).as("chosen_id"),
        min(when(col("__s") === col("__rs"), col("__id"))).as("rejected_id"),
        max(col("__cs")).as("chosen_score"),
        max(col("__rs")).as("rejected_score"),
        max(col("n_responses")).as("n_responses"))
      .select(col("prompt_id"), col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("score_gap"),
        col("n_responses"))
  }
}
