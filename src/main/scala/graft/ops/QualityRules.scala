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
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val nWords = size(toks).cast("long")
    // total characters inside words (whitespace excluded) — robust to
    // repeated separators, unlike length(text) - (n-1)
    val nWordChars = aggregate(transform(toks, w => length(w).cast("long")),
      lit(0L), (acc, v) => acc + v)
    val nStop = size(filter(toks, w => w.isInCollection(stopwords))).cast("long")
    val nAlpha = size(filter(toks, w => w.rlike("[a-z]"))).cast("long")
    val nChars = length(col(textCol)).cast("long")
    // count of non-alnum, non-space chars
    val nSymbols = nChars -
      length(regexp_replace(col(textCol), "[^A-Za-z0-9\\s]", "")).cast("long")
    df.select(col(idCol),
        nWords.as("n_words"),
        nWordChars.as("n_word_chars"),
        nStop.as("__nstop"), nAlpha.as("__nalpha"),
        nChars.as("__nchars"), nSymbols.as("__nsym"))
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
    * Scale shape: two scans of the (id, text) projection — one explodes
    * lines + paragraphs, one explodes tokens and forms the gram streams
    * with `lead` windows (codegen'd; per-token Catalyst lambdas are
    * interpreted `ArrayTransform.eval` and were measured 25× slower
    * here — same trap as the round-11 minhash signature) — then two
    * keyed linear aggregations: (id, kind, segment) with map-side
    * partial combine (duplicates collapse before the wire), then (id).
    * No join, no all-pairs, no driver round-trip; skew is bounded by
    * the largest single document.
    */
  def repetitionSignals(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val txt = col(textCol)
    val base = df.where(trim(txt) =!= "")
      .select(col(idCol).as("__id"),
        // total token chars = length with ALL whitespace removed
        length(regexp_replace(txt, "\\s", "")).cast("long").as("__wc"),
        txt.as("__t"))
    // lines + paragraphs from ONE scan: a single generator over the two
    // tagged splits (per-doc HOF cost is O(lines), not O(tokens) — the
    // interpreted-lambda tax is negligible at this cardinality)
    def tag(arr: Column, kind: String): Column =
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
    // Top gram = max count, ties to the LARGEST char mass (the
    // conservative Gopher read: among equally-frequent top grams, flag
    // the one covering the most characters). Encoded as max over ONE
    // packed long — count above bit 32, space-free char length in the
    // low 32 bits — so the aggregate stays HASH-based. The earlier
    // string encoding (zero-padded inverted count ++ gram, min) put a
    // STRING in the aggregation buffer, and string buffers are as
    // immutable as structs: the round-14 tripwire caught it planning a
    // keyed SortAggregate over the full per-doc distinct-gram stream.
    // Only the winning gram's (count, length) matter downstream — the
    // mass is their product — so nothing variable-width need ride the
    // buffer at all. Count is bounded by tokens per doc < 2^31 and the
    // char length by doc bytes < 2^32, so the packing cannot overflow.
    val topKey = col("__c") * lit(4294967296L) +
      length(translate(col("__v"), " ", "")).cast("long")
    val per = counts.groupBy(col("__id"), col("__k"))
      .agg(max(col("__wc")).as("__wc"),
        sum(col("__c")).as("__total"),
        sum(col("__c") - 1).as("__dups"),
        sum(length(col("__v")).cast("long") * col("__c")).as("__chars"),
        sum(length(col("__v")).cast("long") * (col("__c") - 1)).as("__dupchars"),
        max(topKey).as("__top"))
    def pick(k: String, c: Column): Column = max(when(col("__k") === k, c))
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
