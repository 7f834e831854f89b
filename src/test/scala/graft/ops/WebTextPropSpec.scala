package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property coverage for the round-9 web-text/PII operators: plain
  * scalacheck sampling with fixed seeds (deterministic, no
  * scalatestplus bridge), batched through ONE Spark action per
  * property so 200 cases don't launch 200 jobs.
  */
class WebTextPropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(9000L + i)).toSeq)

  // ---- Luhn: for any digit prefix, EXACTLY ONE check digit validates
  //      (the defining property of a mod-10 checksum) ----
  test("luhn: exactly one of the ten check digits validates (prop)") {
    import spark.implicits._
    val prefixGen = for {
      len <- Gen.choose(12, 18)
      ds <- Gen.listOfN(len, Gen.choose(0, 9))
    } yield ds.mkString
    val prefixes = samples(prefixGen, 120).distinct
    val all = for {
      p <- prefixes; d <- 0 to 9
    } yield (p, p + d.toString)
    val validPerPrefix = all.toDF("prefix", "num")
      .select(col("prefix"), PiiScan.luhnValid(col("num")).as("ok"))
      .groupBy("prefix").agg(sum(col("ok").cast("int")).as("n"))
      .collect().map(_.getLong(1))
    assert(validPerPrefix.nonEmpty && validPerPrefix.forall(_ == 1L))
  }

  // ---- sentenceSplit: a character-conservation law — every
  //      non-whitespace char of the input appears in the segments, in
  //      order, except leading terminator noise (dropped by design) ----
  test("sentenceSplit conserves non-whitespace content in order (prop)") {
    import spark.implicits._
    val charGen = Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
      2 -> Gen.oneOf('.', '!', '?'))
    val textGen = Gen.listOf(charGen).map(_.mkString)
    val texts = samples(textGen, 200).distinct
    val rows = texts.toDF("t")
      .select(col("t"), WebText.sentenceSplit(col("t")).as("s"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val segs = r.getSeq[String](1)
      // segments are trimmed and non-empty
      assert(segs.forall(s => s.nonEmpty && s == s.trim))
      // conservation: concatenated segments == input minus whitespace,
      // minus any LEADING terminator run (unmatched by either branch)
      val expect = t.dropWhile(c => c == '.' || c == '!' || c == '?')
        .filterNot(_.isWhitespace)
      // a segment boundary only drops whitespace, never content chars
      assert(segs.mkString.filterNot(_.isWhitespace) == expect,
        s"input=${t.take(60)}")
    }
  }

  // ---- htmlToText: wrapping plain markup-free text in content tags
  //      is content-neutral (whitespace-collapse aside) ----
  test("htmlToText(wrap(t)) == collapse(t) for markup-free text (prop)") {
    import spark.implicits._
    val charGen = Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
      1 -> Gen.oneOf('.', ',', ':', '!'))
    val textGen = Gen.nonEmptyListOf(charGen).map(_.mkString)
    val texts = samples(textGen, 200).distinct
    val rows = texts.toDF("t").select(col("t"),
      WebText.htmlToText(
        concat(lit("<html><body><div id=\"x\">"), col("t"),
          lit("</div></body></html>"))).as("c"))
      .collect()
    rows.foreach { r =>
      val expect = r.getString(0).replaceAll("[ \t\n\r]+", " ").trim
      assert(r.getString(1) == expect, s"input=${r.getString(0).take(60)}")
    }
  }
}
