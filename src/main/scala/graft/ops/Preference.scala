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
    * Scale shape: a single `max_by`/`min_by` hash-aggregate on the
    * prompt key — partial aggregation keeps one best and one worst
    * candidate per key per partition, so the exchange carries at most
    * two narrow structs per (partition, prompt); no window sort, no
    * join-back, and response payloads (the texts) never move — join
    * them back by id AFTER pairing if the trainer needs them.
    * Rows with a NULL id or score are excluded up front.
    *
    * CALLER CONTRACT: `idCol` must be SIGNED NUMERIC — the chosen-side
    * tiebreak orders by its negation, which a string id would silently
    * turn into a NULL sort key (arbitrary tie pick, no error) and
    * which maps Long.MinValue to itself (inverted tiebreak for that
    * one id). Hash or dense-rank non-numeric response ids first.
    */
  def pairs(responses: DataFrame, groupCol: Column, idCol: Column,
            scoreCol: Column, minGap: Long = 1L): DataFrame = {
    require(minGap >= 0, s"minGap must be >= 0, got $minGap")
    // fail fast on the SIGNED-NUMERIC contract instead of leaning on the
    // scaladoc (round-11 advice): a string id would make -col(__id) a
    // NULL sort key — a silent arbitrary tie pick, no error
    val idType = responses.select(idCol.as("__id")).schema.head.dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"idCol must resolve to a signed numeric type (tiebreak negates " +
        s"it); got ${idType.simpleString} — hash or dense-rank " +
        "non-numeric response ids first")
    responses
      .select(groupCol.as("prompt_id"), idCol.as("__id"), scoreCol.as("__s"))
      .where(col("__id").isNotNull && col("__s").isNotNull)
      .groupBy(col("prompt_id"))
      .agg(
        max_by(struct(col("__id").as("id"), col("__s").as("s")),
          struct(col("__s"), -col("__id"))).as("__c"),
        min_by(struct(col("__id").as("id"), col("__s").as("s")),
          struct(col("__s"), col("__id"))).as("__r"),
        count(lit(1)).as("n_responses"))
      .where(col("n_responses") >= 2 &&
        col("__c.s") - col("__r.s") >= minGap)
      .select(col("prompt_id"),
        col("__c.id").as("chosen_id"), col("__r.id").as("rejected_id"),
        col("__c.s").as("chosen_score"), col("__r.s").as("rejected_score"),
        (col("__c.s") - col("__r.s")).as("score_gap"),
        col("n_responses"))
  }
}
