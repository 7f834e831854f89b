package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, document
  * fingerprinting. All pure Catalyst expressions (higher-order array
  * functions) — codegen-friendly, no UDFs, fully distributed.
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word segmentation count: word pieces + digit runs +
    * punctuation, the common pre-tokenizer regex shape.
    */
  def bpeishCount(text: Column): Column =
    size(filter(split(text,
      "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])"),
      t => length(t) > 0 && t =!= " "))

  /** Character n-gram shingles (distinct), the dedup/Jaccard unit.
    * Native expression (graft.expressions.CharNgramsExpr) — one
    * compiled pass instead of length(text) interpreted substr evals.
    */
  def charNgrams(text: Column, n: Int): Column =
    graft.expressions.MinHashExprs.charNgrams(text, n)

  /** Exact Jaccard similarity of two shingle sets (native codegen pass;
    * the `array_intersect`+`size` formulation re-builds SQL set machinery
    * per row and dominated candidate verification).
    */
  def jaccard(a: Column, b: Column): Column =
    graft.expressions.MinHashExprs.jaccardSim(a, b)

  /** Share of tokens found in `words` (stopword ratio — a standard
    * fluency signal in quality filters). Native single-pass expression
    * (round 17): the composable `filter(toks, isInCollection)` lambda
    * evaluates interpreted per token, and the quality trio re-split the
    * text once per signal; [[graft.expressions.TextStatsExpr]] computes
    * the whole battery in one compiled pass (TextStatsSpec pins parity
    * with the composable form).
    */
  def wordSetRatio(text: Column, words: Seq[String]): Column =
    graft.expressions.TextStatsExprs.stats(text, words).getField("stop_ratio")

  /** Fraction of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column = {
    val stripped = length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))
    when(length(text) > 0,
      (length(text) - stripped).cast("double") / length(text).cast("double")).otherwise(0.0)
  }

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Composite quality score in [0,1]: length sweet-spot + stopword
    * presence − punctuation noise (the length/punct/stopword-ratio recipe
    * used by web-scale corpus filters).
    */
  def qualityScore(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    // one TextStatsExpr pass (see wordSetRatio); the expression replays
    // the composite's exact left-associated double arithmetic
    graft.expressions.TextStatsExprs.stats(text, stopwords).getField("quality")

  /** Language-ID heuristic: marker-stopword hit counts per language,
    * deterministic argmax (ties broken by the order given). Returns the
    * language code whose marker set scores highest, or `fallback`.
    */
  def langIdScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isInCollection(markers)))

  val defaultMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "pour", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  def langId(text: Column,
             markers: Seq[(String, Seq[String])] = defaultMarkers,
             fallback: String = "und"): Column = {
    val scores = markers.map { case (lang, ws) => lang -> langIdScore(text, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit(fallback)) { case ((lang, sc), acc) =>
      when(sc > 0 && sc === best, lit(lang)).otherwise(acc)
    }
  }

  /** 64-bit document fingerprint: order-sensitive rolling combination of
    * token hashes (Rabin-style): acc = (acc<<5) ^ (acc>>59) ^ xxhash64(t).
    * Native expression (graft.expressions.FingerprintExpr) — the
    * composable `aggregate(tokens, ...)` fold evaluates its lambda per
    * token interpreted; the expression is one compiled loop per row and
    * bit-identical to the fold.
    */
  def fingerprint(text: Column): Column =
    graft.expressions.MinHashExprs.fingerprint(tokens(text))

  // ---- oracle-portable hash family -------------------------------------
  // The engine's native hash family is XXH64 (fastest; used by the hot
  // dedup paths). These md5-derived variants trade speed for CROSS-ENGINE
  // REPRODUCIBILITY: any system with md5 — DuckDB, Postgres, Go, a data
  // partner's audit notebook — recomputes the identical fingerprints, so
  // hash-valued results can sit under an external oracle or a contractual
  // audit instead of a rows-only check. All built-ins, fully codegen'd.

  /** 64-bit portable hash: the two leading 32-bit halves of md5(bytes)
    * assembled into one signed long — bit-for-bit reproducible from SQL
    * (`('0x' || substr(md5(x),1,8))::UBIGINT` etc.).
    */
  def portableHash64(s: Column): Column = {
    val hex = md5(s.cast("binary"))
    val hi = conv(substring(hex, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(hex, 9, 8), 16, 10).cast("long")
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  /** 48-bit portable hash: always positive, so SIGNED and UNSIGNED
    * comparisons agree — the variant for cross-engine min/ordering
    * (minhash signatures), where a sign-flipped 64-bit value would sort
    * differently in engines without unsigned longs.
    */
  def portableHash48(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 12), 16, 10).cast("long")


  /** [[fingerprint]]'s oracle-portable twin: same rolling fold
    * `acc = (acc<<5) ^ (acc>>59) ^ h(t)` with [[portableHash64]] tokens.
    * Long shifts wrap and `>>` is arithmetic in both Spark and the
    * oracle's UBIGINT emulation, so the result is bit-identical across
    * engines (q37's hash oracle proves it end-to-end).
    */
  def portableFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) =>
      shiftleft(acc, 5).bitwiseXOR(shiftright(acc, 59))
        .bitwiseXOR(portableHash64(t)))

  // ---- PII redaction (training-data hygiene) ----
  // Patterns are deliberately conservative and dialect-portable: they
  // mean the same thing in Java regex (Spark) and RE2 (DuckDB/Go), so
  // scrubbed output is oracle-comparable. regexp_replace is codegen'd —
  // the scrub is a pure projection, no UDF, no shuffle.

  /** `user@host.tld` — no quoting/comment RFC exotica. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad IPv4 with word boundaries. */
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** NANP-shaped `[+]ddd-ddd-dddd` with `-`/space separators. */
  val phoneRe = "\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}"

  /** Replace emails, IPv4s, then phone-shaped runs with typed
    * placeholders. Order matters: emails contain dots and digits, IPv4s
    * contain digit runs — scrub the most specific shape first.
    */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Occurrence count of one PII pattern (audit metric). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Overlapping character-window chunking for training-data prep:
    * windows of `size` chars starting every `stride` chars (stride <
    * size ⇒ overlap; the trailing window may be shorter). Pure array
    * expression — each row maps to its chunk list with no UDF and no
    * shuffle; explode downstream to get one row per chunk.
    */
  def chunks(text: Column, size: Int, stride: Int): Column = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    transform(sequence(lit(1), greatest(length(text), lit(1)), lit(stride)),
      s => text.substr(s, lit(size)))
  }

  /** Adjacent word bigrams of a text ("a b", "b c", …); empty below two
    * tokens. Built on index arithmetic so the window join stays a pure
    * array expression (HOF lambdas run interpreted, but only ~one eval
    * per token — not a per-pair hot loop).
    */
  def wordBigrams(text: Column): Column = {
    val w = tokens(text)
    when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1),
        i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** Deterministic, engine-portable sharding bucket in [0, 100): parsed
    * from the first 8 hex chars of md5(text ‖ salt). The standard
    * train/val splitter — unlike xxhash64 the hash family is identical
    * in every engine, so splits survive an engine migration; unlike
    * rand() it is stable under re-runs and repartitioning. Salt gives
    * independent splits over the same corpus.
    */
  def hashBucket(text: Column, salt: String = ""): Column =
    conv(substring(md5(concat(text, lit(salt))), 1, 8), 16, 10)
      .cast("long") % 100

  /** [[hashBucket]] at arbitrary resolution: bucket in [0, mod) from the
    * first 8 hex chars of md5(text ‖ salt). ppm-resolution (mod = 1e6)
    * backs sampling-rate comparisons where 1% granularity is too coarse.
    */
  def hashBucketMod(text: Column, salt: String, mod: Long): Column =
    conv(substring(md5(concat(text, lit(salt))), 1, 8), 16, 10)
      .cast("long") % mod

  // ---- normalization (training-data canonical form) ----
  // The accent map is an explicit lowercase Latin table rather than a
  // Unicode normalizer: NFD/NFKD tables differ across ICU versions and
  // engines, while `translate` with a fixed map means the same thing
  // everywhere (Spark, DuckDB, any SQL engine) — normalized corpora stay
  // byte-identical across engine migrations.
  val accentFrom = "áàâäãåāéèêëēíìîïīóòôöõōúùûüūçñýÿšž"
  val accentTo   = "aaaaaaaeeeeeiiiiiooooooouuuuucnyysz"

  /** Canonical text normalization: lowercase → strip accents (fixed
    * map) → control chars to spaces → collapse whitespace runs → trim.
    * Pure codegen projection (translate + regexp_replace) — no UDF, no
    * shuffle, safe to push below any downstream dedup/hash step. Order
    * matters: lowercasing first means the accent map needs only
    * lowercase entries; control-strip before collapse so a control run
    * becomes one space.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        translate(lower(text), accentFrom, accentTo),
        "[\\x00-\\x1f\\x7f]", " "),
      "\\s+", " "))

  /** Within-document n-gram repetition: 1 − distinct/total n-gram
    * positions — the C4/Gopher-style boilerplate signal (near 0 for
    * natural prose, toward 1 for templated/repeated text); 0.0 for docs
    * shorter than n.
    */
  def repetition(text: Column, n: Int): Column = {
    val positions = length(text) - lit(n - 1)
    when(positions <= 0, lit(0.0)).otherwise(
      lit(1.0) - size(charNgrams(text, n)).cast("double") / positions.cast("double"))
  }

  /** Deflate compression ratio (compressed/raw bytes) — the
    * long-range complement to [[repetition]]: templated or repeated
    * text compresses far below natural prose. Native codegen expression
    * (graft.expressions.CompressRatioExpr); engine-internal codec ⇒ no
    * DuckDB oracle (rows-only query).
    */
  def compressionRatio(text: Column): Column =
    graft.expressions.CompressExprs.compressionRatio(text)

  /** Benchmark-contamination scan (decontamination for eval sets): a
    * document is contaminated when it shares at least `minHits` distinct
    * character `n`-grams with the benchmark corpus. Scale shape: the
    * benchmark's distinct shingle set is the small side → broadcast;
    * the corpus explodes to (id, shingle) pairs that die at the join
    * unless they hit — only matching pairs reach the per-doc count, and
    * document text itself never shuffles.
    */
  def contamination(docs: org.apache.spark.sql.DataFrame,
                    benchmark: org.apache.spark.sql.DataFrame,
                    textCol: String, idCol: String,
                    n: Int, minHits: Long): org.apache.spark.sql.DataFrame = {
    val docSh = docs.select(col(idCol),
      explode(charNgrams(col(textCol), n)).as("__g"))
    val benchSh = benchmark
      .select(explode(charNgrams(col(textCol), n)).as("__g")).distinct()
    // charNgrams emits DISTINCT shingles per doc and the broadcast set
    // is distinct, so each (doc, shingle) hit occurs exactly once —
    // plain count == count(distinct) without the extra two-phase
    // distinct Exchange a countDistinct would plan
    docSh.join(broadcast(benchSh), Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
      .where(col("n_hits") >= minHits)
  }

  /** Span-level benchmark decontamination — the transform counterpart
    * of [[contamination]] (which only FLAGS docs): excise every word
    * `n`-gram span that appears verbatim in the benchmark set and
    * reassemble the survivors in document order. Flag-and-drop loses
    * whole documents over one quoted test item; span excision keeps
    * the clean remainder — what production pretraining pipelines
    * actually ship.
    *
    * Scale shape: the benchmark gram set is broadcast (eval suites are
    * small by definition); per-doc gram construction and the final
    * rebuild are single HOF passes (map-side, no token explosion
    * beyond the hit join); the one shuffle carries (doc, start) int
    * pairs for HITS only — O(contaminated spans), not O(tokens).
    *
    * Returns (id, n_spans, n_tokens_kept, clean_md5) for every corpus
    * doc; n_spans = 0 rows pass through with their text intact
    * (whitespace-normalized by the shared tokenizer).
    */
  def decontaminate(docs: org.apache.spark.sql.DataFrame,
                    benchmark: org.apache.spark.sql.DataFrame,
                    textCol: String, idCol: String,
                    n: Int = 8): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"span n must be >= 1, got $n")
    // word n-grams with 1-based start positions, one HOF pass per doc
    def grams(t: Column): Column =
      transform(sequence(lit(1), greatest(size(t) - (n - 1), lit(0))),
        i => struct(i.as("s"), array_join(slice(t, i, lit(n)), " ").as("gram")))
    val docToks = docs.select(col(idCol), tokens(col(textCol)).as("__t"))
    val benchGrams = benchmark
      .select(explode(grams(tokens(col(textCol)))).as("__g"))
      .select(col("__g.gram").as("__gram")).distinct()
    val hits = docToks
      .select(col(idCol), explode(grams(col("__t"))).as("__g"))
      .select(col(idCol), col("__g.s").as("__s"), col("__g.gram").as("__gram"))
      .join(broadcast(benchGrams), Seq("__gram"))
      .groupBy(col(idCol))
      .agg(collect_set(col("__s")).as("__ss"))
    val ss = coalesce(col("__ss"), array().cast("array<int>"))
    val kept = filter(
      transform(col("__t"), (tok, i) => struct(tok.as("tok"), (i + 1).as("p"))),
      x => !exists(ss, s => s <= x("p") && x("p") < s + n))
    docToks.join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(size(col("__ss")), lit(0)).cast("long").as("n_spans"),
        size(transform(kept, x => x("tok"))).cast("long").as("n_tokens_kept"),
        md5(array_join(transform(kept, x => x("tok")), " ")).as("clean_md5"))
  }

  /** BM25 relevance of every document to a fixed term set (Robertson &
    * Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
    * Beyond") — the retrieval scorer behind quality-by-query curation
    * (rank a corpus against seed queries, keep the head).
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *   idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))
    *
    * Scale shape: tokens are filtered to the query terms BEFORE any
    * shuffle (the explode feeds an `isin` the optimizer pushes against
    * the scan projection), so the tf aggregation moves only matching
    * (doc, term) pairs — O(hits), not O(tokens). Corpus stats (N,
    * avgdl) and per-term df are tiny aggregates that ride broadcast
    * joins. The per-doc total folds contributions in sorted term order
    * (same trick as the model ops): float addition is order-sensitive,
    * and the sorted fold is what an external oracle can reproduce
    * exactly.
    */
  def bm25(docs: org.apache.spark.sql.DataFrame, textCol: String,
           idCol: String, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val lens = docs.select(col(idCol), tokenCount(lower(col(textCol))).as("__dl"))
    val stats = lens.agg(count(lit(1)).as("__n"),
      sum(col("__dl")).as("__sumdl"))
    val tf = docs.select(col(idCol),
        explode(tokens(lower(col(textCol)))).as("__t"))
      .where(col("__t").isin(queryTerms: _*))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__tf"))
      .transform(graft.core.Checkpoints.sessionCk) // feeds df AND the contrib join: tokenize once
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val contrib = tf
      .join(broadcast(dfreq), Seq("__t"))
      .join(lens, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("__t"),
        (log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)) *
          (col("__tf") * (k1 + 1.0)) /
          (col("__tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") /
              (col("__sumdl").cast("double") / col("__n"))))).as("__c"))
    val perDoc = contrib.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        aggregate(transform(
            sort_array(collect_list(struct(col("__t"), col("__c")))),
            s => s("__c")),
          lit(0.0), (acc, c) => acc + c).as("score"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** Vocabulary coverage curve: for each k in `ks`, the share of all
    * token OCCURRENCES covered by the k most frequent tokens — the
    * "how big a vocab do I need" / tokenizer-sizing diagnostic.
    *
    * Scale shape: one explode→groupBy shuffle builds the frequency
    * table (the only corpus-sized stage); the top-max(k) cut is a
    * TakeOrdered (per-partition partial top-k, never a global sort of
    * the vocabulary); everything after runs over ≤ max(k) rows. Shares
    * are exact integer ppm (covered × 1e6 div total), so engines agree
    * bit-for-bit.
    */
  def vocabCoverage(docs: org.apache.spark.sql.DataFrame, textCol: String,
                    ks: Seq[Int]): org.apache.spark.sql.DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), s"ks must be positive: $ks")
    val kmax = ks.max
    val freq = docs
      .select(explode(tokens(lower(col(textCol)))).as("__t"))
      .where(length(col("__t")) > 0)
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
      .transform(graft.core.Checkpoints.sessionCk) // feeds the top-k cut AND the total
    val total = freq.agg(sum(col("__c")).as("__tot"))
    // TakeOrderedAndProject: partial top-k per partition, k rows out
    val top = freq.orderBy(col("__c").desc, col("__t").asc).limit(kmax)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__c").desc, col("__t").asc))) // ≤ kmax rows: single task fine
    val spark = docs.sparkSession
    import spark.implicits._
    val kdf = ks.toDF("k")
    kdf.join(broadcast(top), col("__rn") <= col("k"))
      .groupBy(col("k")).agg(sum(col("__c")).as("covered"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("covered"), col("__tot").as("total_tokens"),
        expr("covered * 1000000 div __tot").as("coverage_ppm"))
  }
}
