package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT conversation assembly: sessionized interaction streams become
  * ordered turn transcripts with alternation QA and a hard turn cap —
  * the chat-data shape between raw event logs and a dialogue trainer
  * (assemble → validate role alternation → truncate to context).
  *
  * Scale shape: two chained keyed window passes (user → user,session)
  * and one hash aggregation — no driver round-trips, no global sort.
  * Per-group state is bounded by `maxTurns` BEFORE the collect (the
  * turn cap is applied on the exploded stream, not on an assembled
  * array), so one pathological never-idle user cannot swamp a reducer
  * with an unbounded transcript: the collected array is ≤ maxTurns
  * elements by construction at any corpus size.
  */
object Conversations {

  /** Assemble per-(user, session) ordered transcripts.
    *
    * Sessions split on `gapSeconds` of inactivity (the q27 gaps-and-
    * islands form, tie-broken by `tieCol` so replays are stable).
    * Output, one row per conversation:
    *   - `n_events`   total events in the session (pre-cap)
    *   - `n_turns`    turns kept (≤ maxTurns)
    *   - `transcript` kept turn labels in time order, '>'-joined
    *   - `n_violations` kept-turn positions whose label repeats the
    *     previous one (role-alternation QA; first turn never counts)
    *   - `truncated`  whether the cap dropped events
    */
  def assemble(events: DataFrame, userCol: String, tsCol: String,
               turnCol: String, tieCol: String,
               gapSeconds: Long = 1800L, maxTurns: Int = 20): DataFrame = {
    require(maxTurns > 0, s"maxTurns must be positive, got $maxTurns")
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val sess = events
      .select(col(userCol), col(tsCol), col(tieCol), col(turnCol))
      .withColumn("__prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev"))
            > gapSeconds, 1).otherwise(0))
      .withColumn("sess_id", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bySess = Window.partitionBy(col(userCol), col("sess_id"))
      .orderBy(col(tsCol), col(tieCol))
    val turns = sess
      .withColumn("__turn", row_number().over(bySess))
      .withColumn("__n_events", count(lit(1)).over(
        Window.partitionBy(col(userCol), col("sess_id"))))
      .where(col("__turn") <= maxTurns)
      // violations over the KEPT prefix: the cap is part of the
      // assembled artifact, so QA runs on what the trainer sees
      .withColumn("__viol",
        when(lag(col(turnCol), 1).over(bySess) === col(turnCol), 1L)
          .otherwise(0L))
    turns.groupBy(col(userCol), col("sess_id"))
      .agg(
        max(col("__n_events")).as("n_events"),
        count(lit(1)).as("n_turns"),
        array_join(transform(
          array_sort(collect_list(struct(
            col(tsCol).as("ts"), col(tieCol).as("tie"),
            col(turnCol).as("t")))),
          x => x.getField("t")), ">").as("transcript"),
        sum(col("__viol")).as("n_violations"))
      .withColumn("truncated", col("n_events") > maxTurns)
  }
}
