package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], minGap: Long = 1L) =
    Preference.pairs(rows.toDF("p", "id", "s"),
      col("p"), col("id"), col("s"), minGap)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap

  test("best and worst picked; ties break to the LOWEST id on both ends") {
    val got = run(Seq(
      // pA: clear best 30 (id 2), worst 10 shared by ids 3 and 4 → id 3
      ("pA", 1L, 20L), ("pA", 2L, 30L), ("pA", 3L, 10L), ("pA", 4L, 10L),
      // pB: best 9 shared by ids 7 and 8 → id 7; worst 5 (id 9)
      ("pB", 7L, 9L), ("pB", 8L, 9L), ("pB", 9L, 5L)))
    assert(got("pA") == ((2L, 3L, 30L, 10L, 20L, 4L)))
    assert(got("pB") == ((7L, 9L, 9L, 5L, 4L, 3L)))
  }

  test("singleton groups and sub-minGap margins are dropped") {
    val got = run(Seq(
      ("one", 1L, 50L),                    // singleton
      ("flat", 2L, 7L), ("flat", 3L, 7L),  // gap 0 < minGap 1
      ("ok", 4L, 8L), ("ok", 5L, 6L)), minGap = 2L)
    assert(got.keySet == Set("ok"))
    assert(got("ok") == ((4L, 5L, 8L, 6L, 2L, 2L)))
  }

  test("NULL ids/scores excluded before grouping and counting") {
    val df = Seq(
      (Some("g"), Some(1L), Some(10L)),
      (Some("g"), Some(2L), None),       // null score: out
      (Some("g"), None, Some(99L)),      // null id: out
      (Some("g"), Some(3L), Some(4L)))
      .toDF("p", "id", "s")
    val r = Preference.pairs(df, col("p"), col("id"), col("s"), 1L).head()
    // survivors are ids 1 and 3; n_responses counts only them
    assert((r.getLong(1), r.getLong(2), r.getLong(6)) == ((1L, 3L, 2L)))
  }

  test("a non-numeric id fails FAST, not as a silent NULL tiebreak") {
    // round-11 advice: the signed-numeric contract was scaladoc-only —
    // a string id made -col(__id) a NULL sort key (arbitrary tie pick,
    // no error). Now it's a require at call time.
    val df = Seq(("g", "resp-1", 10L), ("g", "resp-2", 20L))
      .toDF("p", "id", "s")
    val e = intercept[IllegalArgumentException] {
      Preference.pairs(df, col("p"), col("id"), col("s"))
    }
    assert(e.getMessage.contains("signed numeric"))
  }
}
