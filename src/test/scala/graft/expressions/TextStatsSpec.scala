package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** The native text-stats battery must equal the composable
  * split/filter/regexp formulation (the form the DuckDB oracle mirrors)
  * bit for bit — doubles included, since q31's round(.,6) and the
  * q164/q186 curation gate's >= 0.5 comparison sit directly on these
  * values.
  */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private val stop = Seq("the", "a", "of", "and", "to", "in", "is")

  // ---- the pre-round-17 composable forms, kept VERBATIM ----
  private def tokens(text: Column): Column = split(trim(text), "\\s+")

  private def refWordSetRatio(text: Column, words: Seq[String]): Column = {
    val toks = tokens(lower(text))
    val hits = size(filter(toks, t => t.isInCollection(words)))
    when(size(toks) > 0, hits.cast("double") / size(toks).cast("double")).otherwise(0.0)
  }

  private def refPunctRatio(text: Column): Column = {
    val stripped = length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))
    when(length(text) > 0,
      (length(text) - stripped).cast("double") / length(text).cast("double")).otherwise(0.0)
  }

  private def refQualityScore(text: Column, stopwords: Seq[String]): Column = {
    val n = size(tokens(text))
    val lengthScore = least(n.cast("double") / 20.0, lit(1.0))
    val stopScore = least(refWordSetRatio(text, stopwords) * 5.0, lit(1.0))
    val punctPenalty = refPunctRatio(text)
    greatest(lit(0.0), least(lit(1.0),
      lengthScore * 0.4 + stopScore * 0.4 + (lit(1.0) - punctPenalty) * 0.2))
  }

  private def assertSame(docs: DataFrame): Unit = {
    val both = docs.select(col("id"),
      graft.ops.TextAnalysis.wordSetRatio(col("text"), stop).as("sr"),
      graft.ops.TextAnalysis.qualityScore(col("text"), stop).as("q"),
      graft.expressions.TextStatsExprs.stats(col("text"), stop)
        .getField("n_raw").as("n"),
      graft.expressions.TextStatsExprs.stats(col("text"), stop)
        .getField("punct_ratio").as("pr"),
      refWordSetRatio(col("text"), stop).as("rsr"),
      refQualityScore(col("text"), stop).as("rq"),
      size(tokens(col("text"))).as("rn"),
      refPunctRatio(col("text")).as("rpr"))
    both.collect().foreach { r =>
      val id = r.getLong(0)
      // exact double equality on purpose — the gate arithmetic must match
      assert(r.getDouble(1) == r.getDouble(5), s"stop_ratio id=$id: $r")
      assert(r.getDouble(2) == r.getDouble(6), s"quality id=$id: $r")
      assert(r.getInt(3) == r.getInt(7), s"n_raw id=$id: $r")
      assert(r.getDouble(4) == r.getDouble(8), s"punct_ratio id=$id: $r")
    }
  }

  test("native stats equal the composable forms on random text") {
    val rnd = new scala.util.Random(41)
    val words = Seq("The", "a", "OF", "beta", "x9", "!?", "¢ent", "is,", "and")
    val seps = Seq(" ", "  ", "\n", "\t", " \n ")
    val docs = (1L to 120L).map { i =>
      val n = rnd.nextInt(50)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        sb.append(words(rnd.nextInt(words.size)))
        sb.append(seps(rnd.nextInt(seps.size)))
      }
      (i, sb.toString)
    }.toDF("id", "text")
    assertSame(docs)
  }

  test("degenerate shapes: empty, whitespace-only, unicode, punctuation walls") {
    val docs = Seq(
      (1L, ""), (2L, "   "), (3L, "\t\n\t"), (4L, "the"),
      (5L, "THE A OF AND TO IN IS"), (6L, "!!! ??? ***"),
      (7L, "İstanbul STRASSE ÄÖÜ the"), (8L, "a b the"), // NBSP is not \s
      (9L, "🙂 the 🙂🙂")).toDF("id", "text")
    assertSame(docs)
  }

  // ---- gopherStats vs the pre-round-17 composable battery ----
  private def assertGopherSame(docs: DataFrame): Unit = {
    val toks = tokens(lower(col("text")))
    val refWords = size(toks).cast("long")
    val refWordChars = aggregate(transform(toks, w => length(w).cast("long")),
      lit(0L), (acc, v) => acc + v)
    val refStop = size(filter(toks, w => w.isInCollection(stop))).cast("long")
    val refAlpha = size(filter(toks, w => w.rlike("[a-z]"))).cast("long")
    val refChars = length(col("text")).cast("long")
    val refSym = refChars -
      length(regexp_replace(col("text"), "[^A-Za-z0-9\\s]", "")).cast("long")
    val st = TextStatsExprs.gopherStats(col("text"), stop)
    docs.select(col("id"),
      st.getField("n_words"), st.getField("n_word_chars"),
      st.getField("n_stop"), st.getField("n_alpha"),
      st.getField("n_chars"), st.getField("n_sym"),
      refWords, refWordChars, refStop, refAlpha, refChars, refSym)
      .collect().foreach { r =>
        (1 to 6).foreach { k =>
          assert(r.getLong(k) == r.getLong(k + 6),
            s"gopher field $k mismatch id=${r.getLong(0)}: $r")
        }
      }
  }

  test("gopher stats equal the composable battery on random and degenerate text") {
    val rnd = new scala.util.Random(53)
    val words = Seq("The", "a", "OF", "beta9", "??", "x", "¢", "mixedCASE")
    val seps = Seq(" ", "  ", "\n", "\t")
    val docs = ((1L to 80L).map { i =>
      val n = rnd.nextInt(40)
      (i, (0 until n).map(_ => words(rnd.nextInt(words.size)) +
        seps(rnd.nextInt(seps.size))).mkString)
    } ++ Seq((100L, ""), (101L, "   "), (102L, "\t\n"), (103L, "123 456"),
      (104L, "ÄÖÜ ß"), (105L, "🙂 a🙂b"))).toDF("id", "text")
    assertGopherSame(docs)
  }

  test("quality gate parity at the 0.5 boundary neighborhood") {
    // q164/q186 gate on roundAway(quality, 6) >= 0.5 — sweep doc shapes
    // whose quality lands near 0.5 so a 1-ulp drift would flip the gate
    val docs = (1L to 40L).map { i =>
      val toks = (0 until i.toInt).map(j =>
        if (j % 3 == 0) "the" else s"w$j").mkString(" ")
      (i, toks + (if (i % 2 == 0) "!!" else ""))
    }.toDF("id", "text")
    assertSame(docs)
  }
}
