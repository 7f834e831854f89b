package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The native repetition battery must equal the retired composable
  * formulation (line/paragraph/gram explode → keyed hash aggregates —
  * the dataflow the DuckDB oracle mirrors) on random inputs and on
  * every degenerate whitespace shape, bit for bit.
  */
class RepetitionSignalsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-17 repetitionSignals dataflow — kept VERBATIM as the
    * parity pin (only the trailing ppm select is shared with the live
    * operator, so the pin covers the full struct the expression feeds).
    */
  private def reference(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val txt = col(textCol)
    val base = df.where(trim(txt) =!= "")
      .select(col(idCol).as("__id"),
        length(regexp_replace(txt, "\\s", "")).cast("long").as("__wc"),
        txt.as("__t"))
    def tag(arr: org.apache.spark.sql.Column, kind: String): org.apache.spark.sql.Column =
      transform(
        filter(transform(arr, x => trim(x)), x => x =!= ""),
        x => struct(lit(kind).as("k"), x.as("v")))
    val lineParaRows = base
      .select(col("__id"), col("__wc"),
        explode(concat(tag(split(col("__t"), "\n"), "L"),
          tag(split(col("__t"), "\n{2,}"), "P"))).as("s"))
      .select(col("__id"), col("__wc"),
        col("s.k").as("__k"), col("s.v").as("__v"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("__pos"))
    val gramRows = base
      .select(col("__id"), col("__wc"),
        posexplode(split(trim(col("__t")), "\\s+")).as(Seq("__pos", "__w")))
      .select(col("__id"), col("__wc"), col("__w"),
        lead(col("__w"), 1).over(win).as("__l1"),
        lead(col("__w"), 2).over(win).as("__l2"),
        lead(col("__w"), 3).over(win).as("__l3"))
      .select(col("__id"), col("__wc"),
        explode(array(
          struct(lit("G2").as("k"),
            when(col("__l1").isNotNull,
              concat_ws(" ", col("__w"), col("__l1"))).as("v")),
          struct(lit("G3").as("k"),
            when(col("__l2").isNotNull,
              concat_ws(" ", col("__w"), col("__l1"), col("__l2"))).as("v")),
          struct(lit("G4").as("k"),
            when(col("__l3").isNotNull,
              concat_ws(" ", col("__w"), col("__l1"), col("__l2"),
                col("__l3"))).as("v")))).as("s"))
      .select(col("__id"), col("__wc"),
        col("s.k").as("__k"), col("s.v").as("__v"))
      .where(col("__v").isNotNull)
    val ex = lineParaRows.unionByName(gramRows)
    val counts = ex.groupBy(col("__id"), col("__k"), col("__v"))
      .agg(count(lit(1)).as("__c"), max(col("__wc")).as("__wc"))
    val topKey = col("__c") * lit(4294967296L) +
      length(translate(col("__v"), " ", "")).cast("long")
    val per = counts.groupBy(col("__id"), col("__k"))
      .agg(max(col("__wc")).as("__wc"),
        sum(col("__c")).as("__total"),
        sum(col("__c") - 1).as("__dups"),
        sum(length(col("__v")).cast("long") * col("__c")).as("__chars"),
        sum(length(col("__v")).cast("long") * (col("__c") - 1)).as("__dupchars"),
        max(topKey).as("__top"))
    def pick(k: String, c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      max(when(col("__k") === k, c))
    val topMass = shiftright(col("__top"), 32) *
      (col("__top") % lit(4294967296L))
    per.groupBy(col("__id"))
      .agg(max(col("__wc")).as("__wc"),
        pick("L", col("__total")).as("n_lines"),
        pick("L", col("__dups")).as("__ld"),
        pick("L", col("__chars")).as("__lc"),
        pick("L", col("__dupchars")).as("__ldc"),
        pick("P", col("__total")).as("n_paras"),
        pick("P", col("__dups")).as("__pd"),
        pick("P", col("__chars")).as("__pc"),
        pick("P", col("__dupchars")).as("__pdc"),
        pick("G2", topMass).as("__g2m"),
        pick("G3", topMass).as("__g3m"),
        pick("G4", topMass).as("__g4m"))
      .select(col("__id").as(idCol), col("n_lines"),
        expr("__ld * 1000000 div n_lines").as("dup_line_ppm"),
        expr("case when __lc > 0 then __ldc * 1000000 div __lc else 0 end")
          .as("dup_line_char_ppm"),
        col("n_paras"),
        expr("__pd * 1000000 div n_paras").as("dup_para_ppm"),
        expr("case when __pc > 0 then __pdc * 1000000 div __pc else 0 end")
          .as("dup_para_char_ppm"),
        expr("coalesce(__g2m * 1000000 div __wc, 0)").as("top2_char_ppm"),
        expr("coalesce(__g3m * 1000000 div __wc, 0)").as("top3_char_ppm"),
        expr("coalesce(__g4m * 1000000 div __wc, 0)").as("top4_char_ppm"))
  }

  private def byId(df: DataFrame): Map[Long, Row] =
    df.collect().map(r => r.getLong(0) -> r).toMap

  private def assertSame(docs: DataFrame): Unit = {
    val got = byId(graft.ops.QualityRules.repetitionSignals(docs, "text", "id"))
    val want = byId(reference(docs, "text", "id"))
    assert(got.keySet == want.keySet,
      s"row sets differ: only-native=${got.keySet -- want.keySet} " +
        s"only-reference=${want.keySet -- got.keySet}")
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"id=$id native=${got(id)} reference=$w")
    }
  }

  test("native battery equals the composable formulation on random text") {
    val rnd = new scala.util.Random(29)
    // small vocab forces real duplicate lines/paras/grams; separators
    // include runs of spaces, newlines and blank-ish lines
    val words = Seq("alpha", "beta", "gamma", "x", "yy", "¢ent")
    val seps = Seq(" ", "  ", "\n", "\n\n", "\n \n", " \n", "\t")
    val docs = (1L to 80L).map { i =>
      val n = rnd.nextInt(60)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        sb.append(words(rnd.nextInt(words.size)))
        sb.append(seps(rnd.nextInt(seps.size)))
      }
      (i, sb.toString)
    }.toDF("id", "text")
    assertSame(docs)
  }

  test("degenerate whitespace shapes match, including the no-row docs") {
    val docs = Seq(
      (1L, ""), // filtered by the blank gate
      (2L, "   "), // trim-blank, filtered
      (5L, "one"), // single token: lines only, no grams
      (6L, "a b a b a b"), // heavy bigram repetition
      (7L, "l1\nl1\n\nl1\nl2"), // dup lines and paras
      (8L, " lead\ntrail \n  \nmid  dle")).toDF("id", "text")
    assertSame(docs)
    // pin the interesting absences explicitly
    val ids = graft.ops.QualityRules.repetitionSignals(docs, "text", "id")
      .select("id").as[Long].collect().toSet
    assert(!ids.contains(1L) && !ids.contains(2L))
  }

  test("line-only docs keep the coalesced-zero gram ppm of the aggregate") {
    val docs = Seq((5L, "one")).toDF("id", "text")
    val out = graft.ops.QualityRules.repetitionSignals(docs, "text", "id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(5L).getLong(1) == 1L && out(5L).getLong(7) == 0L)
  }

  test("pure non-space whitespace: both formulations raise the same div-0") {
    // "\t\n\t" / "\n\n" pass the blank gate but split into EMPTY tokens,
    // whose joined grams (" ") are real rows with zero word chars — the
    // gram ppm then divides by __wc = 0 in BOTH formulations (ANSI
    // SparkArithmeticException, an ArithmeticException subclass). Such
    // docs cannot pass any fixture gate; parity includes the failure
    // mode, not a silent rescue.
    for (doc <- Seq("\t\n\t", "\n\n")) {
      val docs = Seq((4L, doc)).toDF("id", "text")
      intercept[java.lang.ArithmeticException] {
        graft.ops.QualityRules.repetitionSignals(docs, "text", "id").collect()
      }
      intercept[java.lang.ArithmeticException] {
        reference(docs, "text", "id").collect()
      }
    }
  }
}
