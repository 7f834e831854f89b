package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Gopher repetition battery + corpus boilerplate strip — hand-computed
  * fixtures pin the exact ppm arithmetic and the duplicate/boilerplate
  * semantics the q174/q175 oracles replay at corpus scale.
  */
class RepetitionSpec extends SparkSpec {

  import spark.implicits._

  private def signals(texts: (Long, String)*): Map[Long, org.apache.spark.sql.Row] =
    QualityRules.repetitionSignals(
        texts.toSeq.toDF("doc_id", "t"), "t", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("repetitionSignals: duplicate lines, paragraphs, top n-grams by hand") {
    // lines: "aa bb" ×2, "cc dd ee", "pp qq"  → 4 lines, 1 duplicate
    // paragraphs: ["aa bb\naa bb\ncc dd ee", "pp qq"] → 2, no duplicate
    val m = signals(1L -> "aa bb\naa bb\ncc dd ee\n\npp qq")
    val r = m(1L)
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Long]("dup_line_ppm") == 250000L) // 1/4
    // line chars: 5+5+8+5 = 23; duplicate char mass 5
    assert(r.getAs[Long]("dup_line_char_ppm") == 5L * 1000000L / 23L)
    assert(r.getAs[Long]("n_paras") == 2L)
    assert(r.getAs[Long]("dup_para_ppm") == 0L)
    assert(r.getAs[Long]("dup_para_char_ppm") == 0L)
    // tokens: aa bb aa bb cc dd ee pp qq (word chars = 18)
    // top 2-gram "aa bb" ×2, mass 2·4 = 8
    assert(r.getAs[Long]("top2_char_ppm") == 8L * 1000000L / 18L)
    // all 3-grams unique; tie → lexicographically smallest "aa bb aa", mass 6
    assert(r.getAs[Long]("top3_char_ppm") == 6L * 1000000L / 18L)
    // smallest 4-gram "aa bb aa bb", mass 8
    assert(r.getAs[Long]("top4_char_ppm") == 8L * 1000000L / 18L)
  }

  test("repetitionSignals: blank docs dropped, short docs score 0 grams") {
    val m = signals(1L -> "   ", 2L -> "solo")
    assert(!m.contains(1L))
    val r = m(2L)
    assert(r.getAs[Long]("n_lines") == 1L)
    assert(r.getAs[Long]("n_paras") == 1L)
    assert(r.getAs[Long]("dup_line_ppm") == 0L)
    assert(r.getAs[Long]("top2_char_ppm") == 0L)
    assert(r.getAs[Long]("top3_char_ppm") == 0L)
    assert(r.getAs[Long]("top4_char_ppm") == 0L)
  }

  test("repetitionSignals: fully templated doc saturates the line signal") {
    val m = signals(1L -> "spam line\nspam line\nspam line\nspam line")
    val r = m(1L)
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Long]("dup_line_ppm") == 750000L) // 3/4 duplicates
    assert(r.getAs[Long]("dup_line_char_ppm") == 750000L)
  }

  test("boilerplateStrip: df-threshold strips all copies, keeps order") {
    val df = Seq(
      (1L, "H\nx1\nmid\nF"),
      (2L, "H\nx2\nF"),
      (3L, "H\nx1\nF")).toDF("doc_id", "t")
    val out = WebText.boilerplateStrip(df, "t", "doc_id", minDocs = 2L)
      .collect().map(r => r.getLong(0) -> r).toMap
    // H, F in 3 docs; x1 in 2 docs → all boilerplate at minDocs=2
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_lines") == 4L)
    assert(d1.getAs[Long]("n_removed") == 3L)
    val d2 = out(2L)
    assert(d2.getAs[Long]("n_removed") == 2L)
    // doc 3 loses everything → md5 of empty string
    assert(out(3L).getAs[String]("clean_md5") ==
      "d41d8cd98f00b204e9800998ecf8427e")
    // doc 1 keeps exactly "mid"; doc 2 keeps exactly "x2"
    assert(d1.getAs[String]("clean_md5") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("mid".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("boilerplateStrip: blank lines dropped before counting") {
    val df = Seq(
      (1L, "H\n\n   \na1\nH2"),
      (2L, "H\nb1\nH2")).toDF("doc_id", "t")
    val out = WebText.boilerplateStrip(df, "t", "doc_id", minDocs = 2L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_lines") == 3L) // blanks gone
    assert(out(1L).getAs[Long]("n_removed") == 2L) // H, H2
  }

  test("boilerplateStrip rejects minDocs < 2") {
    val df = Seq((1L, "a")).toDF("doc_id", "t")
    intercept[IllegalArgumentException] {
      WebText.boilerplateStrip(df, "t", "doc_id", minDocs = 1L)
    }
  }
}
