package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model scoring — the classic KenLM-style
  * fluency/perplexity signal of training-data pipelines (filtering by
  * LM score), re-expressed as pure relational algebra with exact
  * integer probabilities so the scores are bit-identical across
  * engines.
  *
  * The model IS the corpus: bigram and unigram-prefix counts are
  * aggregated once, then each document's bigrams join back to the
  * counts and average an add-one-smoothed conditional probability
  * quantized to parts-per-million:
  *
  *   p_ppm(w2|w1)  = (c(w1,w2) + 1) * 1e6  div  (c(w1,·) + V)
  *   lm_ppm(doc)   = Σ p_ppm over the doc's bigrams  div  n_bigrams
  *
  * (V = corpus vocabulary size, the add-one denominator.) No log, no
  * float: libm log differs in the last ulp across engines, so the
  * standard avg-log-prob is replaced by avg smoothed probability — the
  * FILTERING ORDER it induces is the same for the screening use case,
  * and the arithmetic is exactly reproducible. All quantities are
  * non-negative, so `div` (truncate) and `//` (floor) agree.
  *
  * Scale shape: tokenize → explode bigrams (one shuffle to count),
  * broadcast-join nothing — the bigram-count join is a shuffle join on
  * the bigram key (the count table is corpus-sized), and the per-doc
  * average is a map-side-combinable agg on doc_id. The V scalar rides
  * via a 1-row broadcast cross join. Three shuffles total, each
  * carrying (hash-sized) token keys, never text.
  */
object NgramLm {

  /** Per-document bigram LM score. Output: idCol, n_bigrams,
    * lm_ppm (NULL for docs with < 2 tokens — nothing to score).
    */
  def bigramScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      TextAnalysis.tokens(lower(col(textCol))).as("__w"))
    // (doc, w1, w2) exploded bigrams: zip the array with its tail
    val bigrams = toks.select(col(idCol),
      explode(zip_with(
        slice(col("__w"), lit(1), greatest(size(col("__w")) - 1, lit(0))),
        slice(col("__w"), lit(2), greatest(size(col("__w")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
      .transform(graft.core.Checkpoints.sessionCk) // feeds counts AND the scoring join
    val c12 = bigrams.groupBy(col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__c12"))
    val c1 = bigrams.groupBy(col("__w1")).agg(count(lit(1)).as("__c1"))
    val vocab = toks.select(explode(col("__w")).as("__t"))
      .agg(countDistinct(col("__t")).as("__v"))
    val scored = bigrams
      .join(c12, Seq("__w1", "__w2"))
      .join(c1, Seq("__w1"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        expr("(__c12 + 1) * 1000000 div (__c1 + __v)").as("__p_ppm"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__p_ppm")).as("__sp"))
      .select(col(idCol), col("n_bigrams"),
        expr("__sp div n_bigrams").as("lm_ppm"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("lm_ppm"))
  }

  /** Stupid-Backoff trigram scoring (Brants et al. 2007) in exact
    * integer ppm — the CCNet shape: the LM is trained on a REFERENCE
    * slice of the corpus (docs with `id % trainMod == 0`) and scores
    * the rest, so unseen n-grams actually occur and the backoff chain
    * does real work (scoring a corpus against itself never backs off).
    *
    *   S(w3|w1,w2) = c(w1w2w3)/c(w1w2)        if the trigram is seen
    *               = 0.4 * S(w3|w2)           else
    *   S(w3|w2)    = c(w2w3)/c(w2)            if the bigram is seen
    *               = 0.4 * S(w3)              else
    *   S(w3)       = c(w3)/N                  (0 if unseen)
    *
    * quantized to ppm with the 0.4 factor as the exact rational
    * (2·x) div 5 — no float anywhere, scores bit-identical across
    * engines. Output per scored doc: n_trigrams, n_hit3/n_hit2/n_hit1
    * (positions resolved at each backoff level), score_ppm = mean
    * trigram score (NULL when the doc has < 3 tokens).
    *
    * Scale shape: count tables are keyed hash aggregations over the
    * (smaller) training slice; scoring is five keyed left joins from
    * the trigram stream (AQE broadcasts the count tables while they
    * fit, shuffle-joins past that), the corpus total N rides a 1-row
    * broadcast. The gram streams are one window pass per side
    * (`lead` over doc-keyed windows — the q174 codegen-friendly form,
    * not interpreted array lambdas). No driver round-trips.
    */
  def backoffScore(df: DataFrame, textCol: String, idCol: String,
                   trainMod: Int = 5): DataFrame = {
    require(trainMod > 1, s"trainMod must be > 1, got $trainMod")
    import org.apache.spark.sql.expressions.Window
    val toks = df.where(trim(col(textCol)) =!= "")
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(lower(col(textCol))))
          .as(Seq("__p", "__w")))
    val isTrain = pmod(col(idCol), lit(trainMod)) === 0
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("__p"))
    def grams(t: DataFrame): DataFrame = t
      .withColumn("__w2", lead(col("__w"), 1).over(wDoc))
      .withColumn("__w3", lead(col("__w"), 2).over(wDoc))

    val trainToks = toks.where(isTrain).transform(graft.core.Checkpoints.sessionCk)
    val tg = grams(trainToks)
    val c1 = trainToks.groupBy(col("__w")).agg(count(lit(1)).as("__c1"))
    val nTot = trainToks.agg(count(lit(1)).as("__n"))
    val c2 = tg.where(col("__w2").isNotNull)
      .groupBy(col("__w"), col("__w2")).agg(count(lit(1)).as("__c2"))
    val c3 = tg.where(col("__w3").isNotNull)
      .groupBy(col("__w"), col("__w2"), col("__w3"))
      .agg(count(lit(1)).as("__c3"))

    val sg = grams(toks.where(!isTrain)).where(col("__w3").isNotNull)
      .select(col(idCol), col("__w").as("__g1"), col("__w2").as("__g2"),
        col("__w3").as("__g3"))
    val joined = sg
      .join(c3.select(col("__w").as("__g1"), col("__w2").as("__g2"),
        col("__w3").as("__g3"), col("__c3")),
        Seq("__g1", "__g2", "__g3"), "left")
      .join(c2.select(col("__w").as("__g1"), col("__w2").as("__g2"),
        col("__c2").as("__c12")), Seq("__g1", "__g2"), "left")
      .join(c2.select(col("__w").as("__g2"), col("__w2").as("__g3"),
        col("__c2").as("__c23")), Seq("__g2", "__g3"), "left")
      .join(c1.select(col("__w").as("__g2"), col("__c1").as("__c1w2")),
        Seq("__g2"), "left")
      .join(c1.select(col("__w").as("__g3"), col("__c1").as("__c1w3")),
        Seq("__g3"), "left")
      .crossJoin(broadcast(nTot))
    val scored = joined.select(col(idCol),
      expr("""CASE WHEN __c3 IS NOT NULL THEN __c3 * 1000000 div __c12
                   WHEN __c23 IS NOT NULL
                     THEN (2 * (__c23 * 1000000 div __c1w2)) div 5
                   ELSE (2 * ((2 * (coalesce(__c1w3, 0L) * 1000000 div __n))
                         div 5)) div 5 END""").as("__p_ppm"),
      when(col("__c3").isNotNull, 1L).otherwise(0L).as("__h3"),
      when(col("__c3").isNull && col("__c23").isNotNull, 1L)
        .otherwise(0L).as("__h2"),
      when(col("__c3").isNull && col("__c23").isNull &&
        col("__c1w3").isNotNull, 1L).otherwise(0L).as("__h1"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("__h3")).as("n_hit3"),
        sum(col("__h2")).as("n_hit2"), sum(col("__h1")).as("n_hit1"),
        sum(col("__p_ppm")).as("__sp"))
      .withColumn("score_ppm", expr("__sp div n_trigrams")).drop("__sp")
    df.where(pmod(col(idCol), lit(trainMod)) =!= 0).select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_hit3"), lit(0L)).as("n_hit3"),
        coalesce(col("n_hit2"), lit(0L)).as("n_hit2"),
        coalesce(col("n_hit1"), lit(0L)).as("n_hit1"),
        col("score_ppm"))
  }

  final case class BpeMerge(round: Int, x: String, y: String, cnt: Long)

  /** FULL greedy BPE tokenizer training at corpus scale — `rounds`
    * iterations of the classic loop: count adjacent token pairs
    * (weighted by word frequency), pick the most frequent pair
    * (deterministic tie-break: count desc, pair asc), merge it
    * everywhere, repeat. The merge itself is a greedy left-to-right
    * fold over each word's token array — a Catalyst `aggregate` HOF, no
    * UDF — which is exactly the sequential non-overlapping semantics of
    * reference BPE implementations ((a,a) on "aaa" → ["aa","a"]).
    *
    * Scale shape: training runs on the DISTINCT-word table (pair counts
    * weighted by word frequency) — corpus text is touched once to build
    * it; each round is then one pair-count shuffle over the (small)
    * vocabulary plus a 1-row collect, and each round's token arrays are
    * checkpointed so lineage stays flat. The learned merge list is
    * driver-side (like any trained-model artifact) but every decision
    * is recomputable relationally — the q95 oracle replays the whole
    * training loop in SQL and must agree on every merge.
    *
    * `batch` bounds the driver-loop cost at real vocab sizes (10k+
    * merges would otherwise be 10k Spark jobs): each outer round counts
    * pairs ONCE, then greedily selects up to `batch` candidates in
    * (cnt desc, pair asc) order whose member tokens are disjoint from
    * every earlier selection's members AND its glued output — exactly
    * the condition under which applying the earlier merges cannot
    * create or destroy occurrences of the later pair, so each recorded
    * `cnt` is still the true count at its own application time. Total
    * merges stay `rounds`; jobs drop to ~rounds/batch. `batch = 1` is
    * bit-identical to the classic loop (the q95 oracle contract).
    * Batched selection is NOT always the same LIST as sequential greedy
    * (a merge can create a brand-new pair that outranks the next
    * candidate) — it is the standard frequency-snapshot approximation,
    * and every merge in it is valid with an exact count.
    *
    * Returns the merge list and the final (word-frequency, tokens)
    * frame.
    */
  def bpeTrain(df: DataFrame, textCol: String,
               rounds: Int, batch: Int = 1): (Seq[BpeMerge], DataFrame) = {
    require(batch >= 1, s"batch must be >= 1, got $batch")
    val words = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("__word"))
      .where(length(col("__word")) > 0)
      .groupBy(col("__word")).agg(count(lit(1)).as("__wc"))
      .select(col("__wc"),
        transform(sequence(lit(1), length(col("__word"))),
          i => col("__word").substr(i, lit(1))).as("__toks"))
    var (cur, relCur) = graft.core.Checkpoints.localCk(words)
    // release handle for cur's PREDECESSOR: safe to call only once a
    // collect() has materialized cur (a local checkpoint cannot be
    // recomputed, so a still-lazy successor forbids release)
    var relPrev = graft.core.Checkpoints.noRelease
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var exhausted = false
    while (merges.size < rounds && !exhausted) {
      val want = math.min(batch, rounds - merges.size)
      val n = size(col("__toks"))
      // over-fetch 4x: conflicting candidates are skipped, and selecting
      // fewer than `want` this round just means another round runs
      val top = cur.select(col("__wc"),
          explode(zip_with(
            slice(col("__toks"), lit(1), greatest(n - 1, lit(0))),
            slice(col("__toks"), lit(2), greatest(n - 1, lit(0))),
            (a, b) => struct(a.as("x"), b.as("y")))).as("__p"))
        .groupBy(col("__p.x").as("x"), col("__p.y").as("y"))
        .agg(sum(col("__wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("x").asc, col("y").asc)
        .limit(want * 4).collect()
      // the collect materialized cur — its predecessor's snapshot (round
      // before last) is unreachable now; without this, a long training
      // run pins one corpus-sized snapshot PER MERGE ROUND
      relPrev(); relPrev = graft.core.Checkpoints.noRelease
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        for (r <- top if sel.size < want) {
          val (x, y) = (r.getString(0), r.getString(1))
          if (!used(x) && !used(y)) {
            sel += ((x, y, r.getLong(2)))
            used ++= Seq(x, y, x + y)
          }
        }
        sel.foreach { case (x, y, c) =>
          merges += BpeMerge(merges.size + 1, x, y, c) }
        // greedy left-to-right merge of each (x,y): fold each token into
        // the accumulator, gluing when the accumulator's last token is x
        // and the incoming token is y; one fold per selected merge, in
        // selection order, all inside one projection + one checkpoint
        val mergedToks = sel.foldLeft(col("__toks")) { case (toks, (x, y, _)) =>
          aggregate(toks,
            array().cast("array<string>"),
            (acc, t) => when(size(acc) > 0 &&
                element_at(acc, -1) === lit(x) && t === lit(y),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(concat(element_at(acc, -1), t))))
              .otherwise(concat(acc, array(t))))
        }
        val (nx, rel) = graft.core.Checkpoints.localCk(
          cur.select(col("__wc"), mergedToks.as("__toks")))
        relPrev = relCur // cur becomes releasable once nx materializes
        relCur = rel
        cur = nx
      }
    }
    (merges.toSeq, cur)
  }

  /** Apply a learned merge list to new text — the inference half of
    * [[bpeTrain]] (train once on a reference corpus, tokenize any later
    * batch with the frozen merges, exactly like production tokenizers).
    * Each merge is one greedy fold, applied in training order; the
    * whole chain is a single map-side projection — no shuffle, no
    * state, embarrassingly parallel at any scale.
    * Output: the input plus `tokens` (array) and `n_tokens`.
    */
  def bpeApply(df: DataFrame, textCol: String, idCol: String,
               merges: Seq[BpeMerge]): DataFrame = {
    val charsOf = (w: org.apache.spark.sql.Column) =>
      transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))
    val wordToks = merges.foldLeft(charsOf(col("__word"))) { (toks, m) =>
      aggregate(toks, array().cast("array<string>"),
        (acc, t) => when(size(acc) > 0 &&
            element_at(acc, -1) === lit(m.x) && t === lit(m.y),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), t))))
          .otherwise(concat(acc, array(t))))
    }
    // posexplode keeps the word index: collect_list order after a
    // shuffle is NOT document order, so sort by position before flatten
    val perWord = df.select(col(idCol),
      posexplode(TextAnalysis.tokens(lower(col(textCol))))
        .as(Seq("__wi", "__word")))
      .where(length(col("__word")) > 0)
      .select(col(idCol), col("__wi"), wordToks.as("__wt"))
    val perDoc = perWord.groupBy(col(idCol))
      .agg(flatten(transform(
        sort_array(collect_list(struct(col("__wi"), col("__wt")))),
        s => s.getField("__wt"))).as("tokens"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("tokens",
        coalesce(col("tokens"), array().cast("array<string>")))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Post-training vocabulary view: the corpus re-tokenized by the
    * learned merges, top-`topK` tokens by weighted frequency with a
    * deterministic total order. Output: token, cnt, rank.
    */
  def bpeTopTokens(df: DataFrame, textCol: String, rounds: Int,
                   topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (_, cur) = bpeTrain(df, textCol, rounds)
    cur.select(col("__wc"), explode(col("__toks")).as("token"))
      .groupBy(col("token")).agg(sum(col("__wc")).as("cnt"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("token").asc)))
      .where(col("rank") <= topK)
  }

  /** One round of BPE-style vocabulary induction at corpus scale: count
    * every within-word adjacent character pair and return the `topK`
    * merge candidates with a deterministic total order (count desc, pair
    * asc). This is the inner loop of tokenizer training — at 100 TB the
    * pair counting is the expensive part and is exactly this explode +
    * count shuffle (pairs are ≤ a few thousand distinct keys, so the
    * map-side combine collapses almost everything before the exchange).
    * Output: pair, cnt, rank.
    */
  def bpePairCounts(df: DataFrame, textCol: String, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = df.select(
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("__word"))
    val p = words.where(length(col("__word")) >= 2)
      .select(explode(sequence(lit(1), length(col("__word")) - 1)).as("__i"),
        col("__word"))
      .select(expr("substr(__word, __i, 2)").as("pair"))
    p.groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("pair").asc)))
      .where(col("rank") <= topK)
  }

  /** Collocation / phrase mining (word2phrase, Mikolov et al. 2013):
    * adjacent token pairs scored by LIFT — how much more often the pair
    * occurs than its parts predict:
    *
    *   lift_ppm(w1,w2) = c(w1,w2) · N_bigrams · 1e6  div  (c(w1,·) · c(·,w2))
    *
    * — the log-free PMI monotone (exact BIGINT end to end; log's last
    * ulp differs across engines, the RANKING it induces does not).
    * Pairs below `minCount` are dropped first (rare-pair lift explodes,
    * the standard word2phrase guard), then the top `k` by
    * (lift desc, pair asc) are kept — the phrase-vocabulary induction
    * step before a tokenizer merge or an n-gram feature build.
    *
    * Scale shape: one explode→count shuffle for pair counts; left/right
    * marginals aggregate FROM the pair-count table (already tiny:
    * vocab², post-minCount), never from the corpus again; the final cut
    * is a TakeOrdered partial top-k, no global sort.
    */
  def collocations(df: DataFrame, textCol: String,
                   minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = df.select(TextAnalysis.tokens(lower(col(textCol))).as("__w"))
    val pairs = toks.select(
        explode(zip_with(
          slice(col("__w"), lit(1), greatest(size(col("__w")) - 1, lit(0))),
          slice(col("__w"), lit(2), greatest(size(col("__w")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val c12 = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("pair_n"))
      .transform(graft.core.Checkpoints.sessionCk) // feeds marginals, total, and the scored cut
    val left = c12.groupBy(col("w1")).agg(sum(col("pair_n")).as("__c1"))
    val right = c12.groupBy(col("w2")).agg(sum(col("pair_n")).as("__c2"))
    val total = c12.agg(sum(col("pair_n")).as("__n"))
    c12.where(col("pair_n") >= minCount)
      .join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .crossJoin(broadcast(total))
      // DECIMAL(38,0): pair_n·N·1e6 exceeds 2^63 once the corpus has
      // ~3e9 bigrams — 128-bit integer arithmetic (DuckDB: HUGEINT)
      // keeps the lift exact at any scale; IntegralDivide on decimals
      // returns BIGINT
      .select(col("w1"), col("w2"), col("pair_n"),
        expr("""CAST(pair_n AS DECIMAL(38,0)) * __n * 1000000
                div (CAST(__c1 AS DECIMAL(38,0)) * __c2)""").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }
}
