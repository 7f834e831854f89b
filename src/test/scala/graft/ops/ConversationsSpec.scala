package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SFT conversation assembly: session split, turn order, alternation
  * QA, and the hard turn cap, all on hand fixtures.
  */
class ConversationsSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "s", "event_id", "event_type")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))

  test("gap splits sessions; transcripts ordered; repeats flagged") {
    val df = events(
      (1L, 0L, 10L, "view"), (1L, 10L, 11L, "view"),
      (1L, 2000L, 12L, "click"), (1L, 2010L, 13L, "view"),
      (1L, 2020L, 14L, "view"))
    val r = Conversations.assemble(df, "user_id", "ts", "event_type",
      "event_id", gapSeconds = 1800L, maxTurns = 3)
      .orderBy("user_id", "sess_id").collect()
    assert(r.length == 2)
    assert(r(0).getAs[String]("transcript") == "view>view")
    assert(r(0).getAs[Long]("n_violations") == 1L)
    assert(!r(0).getAs[Boolean]("truncated"))
    assert(r(1).getAs[String]("transcript") == "click>view>view")
    assert(r(1).getAs[Long]("n_turns") == 3L)
    assert(r(1).getAs[Long]("n_violations") == 1L)
  }

  test("turn cap truncates, keeps the time-ordered prefix, and flags") {
    val df = events((2L to 6L).map(i =>
      (2L, i * 10, i, if (i % 2 == 0) "user" else "assistant")): _*)
    val r = Conversations.assemble(df, "user_id", "ts", "event_type",
      "event_id", gapSeconds = 1800L, maxTurns = 3).head()
    assert(r.getAs[Long]("n_events") == 5L)
    assert(r.getAs[Long]("n_turns") == 3L)
    assert(r.getAs[Boolean]("truncated"))
    assert(r.getAs[String]("transcript") == "user>assistant>user")
    assert(r.getAs[Long]("n_violations") == 0L)
  }

  test("same-timestamp turns tie-break on event_id") {
    val df = events((3L, 5L, 20L, "b"), (3L, 5L, 19L, "a"))
    val r = Conversations.assemble(df, "user_id", "ts", "event_type",
      "event_id", gapSeconds = 1800L, maxTurns = 8).head()
    assert(r.getAs[String]("transcript") == "a>b")
  }

  test("first turn never counts as a violation even when labels repeat later") {
    val df = events((4L, 0L, 1L, "x"), (4L, 1L, 2L, "x"), (4L, 2L, 3L, "x"))
    val r = Conversations.assemble(df, "user_id", "ts", "event_type",
      "event_id", gapSeconds = 1800L, maxTurns = 8).head()
    assert(r.getAs[Long]("n_violations") == 2L)
  }
}
