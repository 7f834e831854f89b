package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/C4-style rule-based quality filtering — the deterministic
  * cousin of the learned classifier (model/LogReg): a battery of cheap
  * per-document statistics with hard thresholds, the standard first
  * pass over a raw web crawl before any model-based scoring
  * (cf. Gopher's quality heuristics and C4's cleaning rules).
  *
  * Every metric is exact integer / parts-per-million arithmetic — no
  * floats — so an external engine (or the DuckDB oracle) reproduces the
  * numbers bit-for-bit, and the rule outcomes are portable across the
  * fleet. All metrics are non-negative by construction, so truncating
  * integer division (Spark `div`) and flooring division (DuckDB `//`)
  * agree — same invariant as the q81/q83 queries.
  *
  * Scale shape: one narrow projection over the corpus — no shuffle, no
  * join, no UDF; the token work is Catalyst HOFs over the split array.
  * At 100 TB this is a single map-only pass that fuses into whatever
  * scan feeds it.
  */
object QualityRules {

  final case class Thresholds(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLenPpm: Long = 3000000L, maxMeanWordLenPpm: Long = 10000000L,
      minStopwordPpm: Long = 20000L,   // ≥ 2% stopwords
      minAlphaWordPpm: Long = 800000L, // ≥ 80% of words contain a letter
      maxSymbolPpm: Long = 100000L)    // ≤ 10% symbol characters

  /** Per-document rule metrics + individual rule verdicts + the overall
    * pass flag. Output columns (beyond idCol): n_words, n_word_chars,
    * mean_word_len_ppm, stopword_ppm, alpha_word_ppm, symbol_ppm,
    * pass_words, pass_word_len, pass_stopwords, pass_alpha, pass_symbols,
    * pass_all.
    */
  def gopherRules(df: DataFrame, textCol: String, idCol: String,
                  stopwords: Seq[String] = TextAnalysis.defaultStopwords,
                  t: Thresholds = Thresholds()): DataFrame = {
    // One native pass per row (round 17): the composable battery paid an
    // interpreted aggregate/filter lambda per token plus a per-token
    // rlike regex for the alpha count; GopherStatsExpr computes all six
    // counts in one compiled scan (TextStatsSpec pins bit-parity)
    val st = graft.expressions.TextStatsExprs.gopherStats(col(textCol), stopwords)
    df.select(col(idCol),
        st.getField("n_words").as("n_words"),
        st.getField("n_word_chars").as("n_word_chars"),
        st.getField("n_stop").as("__nstop"), st.getField("n_alpha").as("__nalpha"),
        st.getField("n_chars").as("__nchars"), st.getField("n_sym").as("__nsym"))
      .select(col(idCol), col("n_words"), col("n_word_chars"),
        expr("n_word_chars * 1000000 div n_words").as("mean_word_len_ppm"),
        expr("__nstop * 1000000 div n_words").as("stopword_ppm"),
        expr("__nalpha * 1000000 div n_words").as("alpha_word_ppm"),
        when(col("__nchars") > 0, expr("__nsym * 1000000 div __nchars"))
          .otherwise(0L).as("symbol_ppm"))
      .select(col(idCol), col("n_words"), col("n_word_chars"),
        col("mean_word_len_ppm"), col("stopword_ppm"), col("alpha_word_ppm"),
        col("symbol_ppm"),
        (col("n_words") >= t.minWords && col("n_words") <= t.maxWords)
          .as("pass_words"),
        (col("mean_word_len_ppm") >= t.minMeanWordLenPpm &&
          col("mean_word_len_ppm") <= t.maxMeanWordLenPpm).as("pass_word_len"),
        (col("stopword_ppm") >= t.minStopwordPpm).as("pass_stopwords"),
        (col("alpha_word_ppm") >= t.minAlphaWordPpm).as("pass_alpha"),
        (col("symbol_ppm") <= t.maxSymbolPpm).as("pass_symbols"))
      .withColumn("pass_all",
        col("pass_words") && col("pass_word_len") && col("pass_stopwords") &&
          col("pass_alpha") && col("pass_symbols"))
  }
  /** Blocklist phrase matching — the safety-scrub primitive: which
    * documents contain which banned phrases, as WHOLE consecutive
    * whitespace tokens (never substrings: banning "ass" must not flag
    * "assembly", so matching is token-aligned by construction).
    *
    * Shape for a 100 TB corpus with a 10⁴-phrase dictionary: the
    * dictionary broadcasts (it is bounded and tiny next to the
    * corpus); the corpus pays ONE tokenizing scan plus `maxLen − 1`
    * `lead` windows keyed by document (one shuffle), and the
    * candidate join fans out only on dictionary FIRST words — a token
    * that begins no banned phrase joins nothing. Linear in corpus
    * tokens, independent of dictionary hit rate.
    *
    * Returns (id, n_hits, n_phrases) for documents with ≥ 1 match;
    * join back `left_anti` to scrub, or `left` + null-check to flag.
    */
  /** Gopher's REPETITION battery (Rae et al. 2021 §A1.1.2, the half of
    * the quality heuristics [[gopherRules]] does not cover): per-document
    * duplicate-line / duplicate-paragraph fractions by count and by
    * character mass, plus the fraction of word characters claimed by the
    * single most frequent word n-gram for n = 2,3,4. Templated pages,
    * scraper loops and keyword-stuffed spam light these up while leaving
    * natural prose near zero — the standard repetition gate before
    * training-data export.
    *
    * Exact semantics (documented because the oracle reproduces them
    * bit-for-bit): lines split on `\n`, paragraphs on `\n{2,}`, both
    * trimmed with blank segments dropped; an occurrence is a *duplicate*
    * when an identical segment already occurred, so a segment appearing
    * c times contributes c−1 duplicates and len·(c−1) duplicate chars.
    * The top n-gram is the max-count gram over whitespace tokens with
    * ties broken to the lexicographically smallest; its char mass is
    * count · (gram length excluding joining spaces), over total token
    * chars. All ratios are ppm longs under truncating integer division
    * (non-negative, so Spark `div` ≡ DuckDB `//`). Docs that are blank
    * after trim produce no output row; docs shorter than n tokens score
    * 0 for that n.
    *
    * Scale shape (round 17): ZERO exchanges — all ten signals are
    * per-document functions of the document's own text, so the whole
    * battery runs inside the scan via the native
    * [[graft.expressions.RepetitionSignalsExpr]] (one compiled pass per
    * row: segment/gram hash-map tallies, memory bounded by the largest
    * single document — the bound the keyed hash aggregate already had).
    * The previous composable formulation exploded every line, paragraph
    * and n-gram into a corpus-wide (id, kind, segment) stream — ~5
    * short STRINGS per token crossing the wire as groupBy keys, plus a
    * per-doc window sort for the `lead` gram construction — and spent
    * ×100-board time shuffling what never needed to leave the row
    * (46.5 s ×100, 1.98 s ×1 measured round 16).
    * RepetitionSignalsSpec pins the expression equal to the retired
    * formulation on random and degenerate inputs; callers key by a
    * unique idCol (both callers pass the fixture primary key — under
    * the retired keyed aggregate duplicate ids would have MERGED their
    * segment tallies, which no caller relied on).
    */
  def repetitionSignals(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val txt = col(textCol)
    df.where(trim(txt) =!= "")
      .select(col(idCol).as("__id"),
        graft.expressions.RepetitionExprs.signals(txt).as("__s"))
      // docs with no line, paragraph or gram row never reached the keyed
      // aggregate; the expression signals that as NULL
      .where(col("__s").isNotNull)
      .select(col("__id"), col("__s.wc").as("__wc"),
        col("__s.n_lines").as("n_lines"), col("__s.ld").as("__ld"),
        col("__s.lc").as("__lc"), col("__s.ldc").as("__ldc"),
        col("__s.n_paras").as("n_paras"), col("__s.pd").as("__pd"),
        col("__s.pc").as("__pc"), col("__s.pdc").as("__pdc"),
        col("__s.g2m").as("__g2m"), col("__s.g3m").as("__g3m"),
        col("__s.g4m").as("__g4m"))
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

  def blocklistHits(df: DataFrame, textCol: String, idCol: String,
                    phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "blocklistHits: empty dictionary")
    require(phrases.forall(_.trim.nonEmpty),
      "blocklistHits: blank phrase in dictionary (would token-join empty strings)")
    val spark = df.sparkSession
    import spark.implicits._
    val dict = phrases.map { p =>
      val ws = p.trim.toLowerCase.split("\\s+").toSeq
      (ws.head, ws.size, ws.mkString(" "))
    }
    val maxLen = dict.map(_._2).max
    require(maxLen <= 8, s"blocklistHits: phrases longer than 8 tokens ($maxLen)")
    val dictDf = broadcast(dict.toDF("__w0", "__len", "__phrase"))
    val toks = df.select(col(idCol),
      posexplode(split(trim(lower(col(textCol))), "\\s+")).as(Seq("pos", "w")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    // window columns w1..wmaxLen: the phrase-sized token windows
    val windows = (1 to maxLen).scanLeft(Option.empty[Column]) {
      case (None, _) => Some(col("w"))
      case (Some(prev), k) =>
        Some(concat(prev, lit(" "), lead(col("w"), k - 1).over(win)))
    }.flatten
    val withWins = windows.zipWithIndex.foldLeft(toks) {
      case (d, (c, i)) => d.withColumn(s"__w${i + 1}", c)
    }
    val matchCol = (1 to maxLen).foldLeft(lit(null).cast("string")) {
      (acc, k) => when(col("__len") === k, col(s"__w$k")).otherwise(acc)
    }
    withWins.join(dictDf, col("w") === col("__w0"))
      .where(matchCol === col("__phrase"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("__phrase")).as("n_phrases"))
  }
}
