package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, Layout, TextAnalysis => TA, Windows}

/** Round-4 corpus-curation operators: canonical text normalization,
  * substring-level (stride-1) duplication profiling, sequence packing,
  * temperature-scaled mixture sampling, Z-order layout, incremental
  * batch-vs-store dedup, and a distributed quality classifier.
  */
object CurationQueries {

  private def round(c: org.apache.spark.sql.Column, scale: Int) =
    graft.ops.Numeric.roundAway(c, scale)

  /** q84's oracle, generated: LogReg.trainScore(portable = true)
    * replayed whole — the q187 md5 feature leg (tokens → 48-bit md5
    * buckets → counts → L1 shares + bias slot), then `iters` unrolled
    * batch-GD steps. Each step:
    *   - per-doc margin: fold of w[bucket+1]·x in ascending-bucket
    *     order (the driver's sorted doc arrays);
    *   - g = σ(m) − y; per-bucket gradient = Σ roundAway(x·g·10⁸) in
    *     BIGINT — the exact longs trainDocsFixed's treeAggregate
    *     combines, so partition order is moot on both engines;
    *   - w' = w − lr·((q/10⁸)/nDocs + l2·w) (bias unregularized), with
    *     the driver's operation order.
    * Every w$i is MATERIALIZED — inlined, each step would re-run the
    * whole prefix chain. exp() is the one step that is only
    * ~1-ulp-identical across libm implementations; every accumulation
    * downstream of it passes through the integer quantization, so a
    * last-ulp disagreement flips a hash only if some x·g·10⁸ lands
    * within one ulp of a .5 boundary (odds ~1e-10 per contribution).
    */
  private def logRegOracle(dim: Int, iters: Int): String = {
    val kDim = dim + 1
    def quant(x: String) = graft.ops.FixedPoint.quantizeSql(x, graft.ops.FixedPoint.GradScale)
    val steps = (0 until iters).map { i =>
      s"""mg$i AS (
         |  SELECT f.doc_id, f.y,
         |    list_reduce(list(wt.w[f.bucket + 1] * f.x ORDER BY f.bucket),
         |                (a, b) -> a + b) AS m
         |  FROM feat f, w$i wt
         |  WHERE f.y IS NOT NULL
         |  GROUP BY f.doc_id, f.y),
         |gr$i AS (
         |  SELECT f.bucket, SUM(${quant("f.x * g.g")}) AS q
         |  FROM feat f
         |  JOIN (SELECT doc_id, 1.0 / (1.0 + exp(-m)) - y AS g FROM mg$i) g
         |    USING (doc_id)
         |  GROUP BY f.bucket),
         |w${i + 1} AS MATERIALIZED (
         |  SELECT list(b2.wk - 5.0 * (((CAST(COALESCE(g2.q, 0) AS DOUBLE) / 100000000.0) / nd.n)
         |              + (CASE WHEN b2.k = $kDim THEN CAST(0.0 AS DOUBLE)
         |                      ELSE 0.0001 * b2.wk END))
         |              ORDER BY b2.k) AS w
         |  FROM nd, (SELECT kk.k AS k, wt.w[kk.k] AS wk
         |            FROM w$i wt CROSS JOIN
         |                 (SELECT unnest(generate_series(1, $kDim)) AS k) kk) b2
         |  LEFT JOIN gr$i g2 ON g2.bucket = b2.k - 1
         |  GROUP BY nd.n)""".stripMargin
    }.mkString(",\n")
    s"""WITH tok AS (
       |  SELECT doc_id,
       |         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tk
       |  FROM documents),
       |bu AS (
       |  SELECT doc_id,
       |         CAST(CAST(('0x' || substr(md5(tk), 1, 12)) AS UBIGINT)
       |              % $dim AS INTEGER) AS bucket
       |  FROM tok),
       |cnt AS (SELECT doc_id, bucket, count(*) AS c FROM bu GROUP BY 1, 2),
       |nrm AS (SELECT doc_id, SUM(c) AS nt FROM cnt GROUP BY 1),
       |lab AS (
       |  SELECT doc_id,
       |    CASE WHEN lang IS NULL THEN NULL
       |         WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
       |         ELSE CAST(0.0 AS DOUBLE) END AS y
       |  FROM documents),
       |feat AS MATERIALIZED (
       |  SELECT f0.doc_id, f0.bucket, f0.x, l.y FROM (
       |    SELECT cnt.doc_id, cnt.bucket,
       |           CAST(cnt.c AS DOUBLE) / CAST(nrm.nt AS DOUBLE) AS x
       |    FROM cnt JOIN nrm USING (doc_id)
       |    UNION ALL
       |    SELECT doc_id, $dim AS bucket, CAST(1.0 AS DOUBLE) AS x
       |    FROM documents) f0
       |  JOIN lab l USING (doc_id)),
       |nd AS (SELECT CAST(GREATEST(count(*), 1) AS DOUBLE) AS n
       |       FROM documents WHERE lang IS NOT NULL),
       |w0 AS (SELECT list_transform(generate_series(1, $kDim),
       |                             x2 -> CAST(0.0 AS DOUBLE)) AS w),
       |$steps,
       |sc AS (
       |  SELECT f.doc_id,
       |    list_reduce(list(wt.w[f.bucket + 1] * f.x ORDER BY f.bucket),
       |                (a, b) -> a + b) AS m
       |  FROM feat f, w$iters wt
       |  GROUP BY f.doc_id)
       |SELECT doc_id, round(1.0 / (1.0 + exp(-m)), 4) AS score,
       |       (1.0 / (1.0 + exp(-m))) >= 0.5 AS pred_en
       |FROM sc""".stripMargin
  }

  /** Accent seed appended to every 4th doc so normalization is
    * non-vacuous on the ASCII synthetic corpus: uppercase accents,
    * doubled spaces, a tab, and a control char (BEL).
    */
  private val accentSeed = "  CAFÉ  naïve\tZürich\u0007été "

  val qs: Seq[Q] = Seq(

    // ---- canonical normalization (lowercase, fixed accent map,
    //      control strip, whitespace collapse) ----
    Q("q79_normalize",
      (s, dir) => {
        val seeded = Tables.load(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 4 === 0, lit(accentSeed)).otherwise(lit("")))
            .as("seeded"))
        seeded.select(col("doc_id"),
          TA.normalizeText(col("seeded")).as("norm"))
          .select(col("doc_id"), col("norm"),
            length(col("norm")).as("n_chars_norm"))
      },
      Some("""WITH seeded AS (
                SELECT doc_id, text || CASE WHEN doc_id % 4 = 0
                  THEN '  CAFÉ  naïve' || chr(9) || 'Zürich' || chr(7) || 'été '
                  ELSE '' END AS s
                FROM documents),
              n AS (
                SELECT doc_id,
                  trim(regexp_replace(regexp_replace(
                    translate(lower(s),
                      'áàâäãåāéèêëēíìîïīóòôöõōúùûüūçñýÿšž',
                      'aaaaaaaeeeeeiiiiiooooooouuuuucnyysz'),
                    '[\x00-\x1f\x7f]', ' ', 'g'),
                    '\s+', ' ', 'g')) AS norm
                FROM seeded)
              SELECT doc_id, norm, CAST(length(norm) AS INTEGER) AS n_chars_norm
              FROM n""")),

    // ---- substring-level dup profile (hashed suffix-array stand-in:
    //      stride-1 8-word windows, dup at any alignment) ----
    Q("q80_substring_dedup",
      (s, dir) => {
        Dedup.substringDupStats(Tables.load(s, dir, "documents"),
          "text", "doc_id", words = 8)
      },
      Some("""WITH w AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                FROM documents),
              p AS (
                SELECT doc_id, md5(array_to_string(ws[i.i : i.i+7], ' ')) AS wh
                FROM w, LATERAL (
                  SELECT unnest(generate_series(1, len(ws) - 7)) AS i) i
                WHERE len(ws) >= 8),
              f AS (SELECT wh, count(*) AS c FROM p GROUP BY 1),
              d AS (
                SELECT p.doc_id, count(*) AS n_windows,
                       CAST(sum(CASE WHEN f.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_dup_windows
                FROM p JOIN f USING (wh) GROUP BY 1)
              SELECT doc_id,
                     COALESCE(n_windows, 0) AS n_windows,
                     COALESCE(n_dup_windows, 0) AS n_dup_windows,
                     COALESCE(n_dup_windows * 1000000 // n_windows, 0) AS dup_ppm
              FROM documents LEFT JOIN d USING (doc_id)""")),

    // ---- GPT-style sequence packing (concat-and-chunk): global token
    //      cumsum via the DISTRIBUTED prefix sum (Windows.globalRunningSum
    //      — parallel per partition, not Spark's single-task global
    //      window), then pure integer arithmetic per doc: which packed
    //      ctx=512 sequences the doc spans.
    //      PARITY INVARIANT (cf. the q83 CAST-to-BIGINT note): Spark `div`
    //      truncates toward zero while DuckDB `//` floors — they agree
    //      here ONLY because every operand is provably non-negative
    //      (tokenCount >= 1 even for empty text: split yields [""], so
    //      tok_end >= 1 and tok_end-1 >= 0). Keep it that way. ----
    Q("q81_sequence_packing",
      (s, dir) => {
        val t = Tables.load(s, dir, "documents")
          .select(col("doc_id"), TA.tokenCount(col("text")).cast("long").as("n_tokens"))
        Windows.globalRunningSum(t, "doc_id", "n_tokens", "tok_end")
          .select(col("doc_id"), col("n_tokens"),
            (col("tok_end") - col("n_tokens")).as("tok_start"),
            expr("(tok_end - n_tokens) div 512").as("first_seq"),
            expr("(tok_end - 1) div 512").as("last_seq"),
            expr("(tok_end - 1) div 512 - (tok_end - n_tokens) div 512 + 1")
              .as("n_seqs"))
      },
      Some("""WITH t AS (
                SELECT doc_id,
                       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                         AS n_tokens
                FROM documents),
              c AS (
                SELECT doc_id, n_tokens,
                       CAST(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS tok_end
                FROM t)
              SELECT doc_id, n_tokens,
                     tok_end - n_tokens AS tok_start,
                     (tok_end - n_tokens) // 512 AS first_seq,
                     (tok_end - 1) // 512 AS last_seq,
                     (tok_end - 1) // 512 - (tok_end - n_tokens) // 512 + 1 AS n_seqs
              FROM c""")),

    // ---- temperature-scaled source mixture (T=2 via sqrt — IEEE
    //      requires sqrt correctly rounded, so the weights are
    //      bit-identical across engines; everything after the one sqrt
    //      is integer arithmetic) + deterministic md5 sampling at the
    //      resulting per-source rate, against a 10k-token budget.
    //      Same div-vs-// invariant as q81: all shares/rates/totals are
    //      non-negative by construction (counts and floor(sqrt) weights),
    //      so truncate-toward-zero and floor agree ----
    Q("q82_mixture_sampling",
      (s, dir) => {
        val t = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text"),
            TA.tokenCount(col("text")).cast("long").as("n_tok"))
        val src = t.groupBy(col("source")).agg(sum(col("n_tok")).as("n_tokens"))
        val w = src.select(col("source"), col("n_tokens"),
          floor(sqrt(col("n_tokens").cast("double")) * 1000).cast("long").as("w_int"))
        val tot = w.agg(sum(col("w_int")).as("tot"))
        val rates = w.crossJoin(broadcast(tot))
          .select(col("source"), col("n_tokens"),
            expr("w_int * 1000000 div tot").as("share_ppm"))
          .withColumn("rate_ppm",
            least(lit(1000000L), expr("10000 * share_ppm div n_tokens")))
        t.join(broadcast(rates.select(col("source"), col("share_ppm"), col("rate_ppm"))),
            Seq("source"))
          .select(col("doc_id"), col("source"), col("share_ppm"), col("rate_ppm"),
            (TA.hashBucketMod(col("text"), "mix", 1000000L) < col("rate_ppm"))
              .as("sampled"))
      },
      Some("""WITH t AS (
                SELECT doc_id, source, text,
                       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                         AS n_tok
                FROM documents),
              src AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens
                      FROM t GROUP BY 1),
              w AS (SELECT source, n_tokens,
                           CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000) AS BIGINT)
                             AS w_int
                    FROM src),
              tot AS (SELECT CAST(sum(w_int) AS BIGINT) AS tot FROM w),
              r AS (SELECT source, n_tokens,
                           w_int * 1000000 // tot AS share_ppm
                    FROM w, tot),
              r2 AS (SELECT source, share_ppm,
                            least(1000000, 10000 * share_ppm // n_tokens) AS rate_ppm
                     FROM r)
              SELECT t.doc_id, t.source, r2.share_ppm, r2.rate_ppm,
                     (CAST(CAST(('0x' || substr(md5(t.text || 'mix'), 1, 8)) AS UBIGINT)
                           % 1000000 AS BIGINT) < r2.rate_ppm) AS sampled
              FROM t JOIN r2 USING (source)""")),

    // ---- Z-order (Morton) layout key over events (user_id × epoch-day):
    //      pure 64-bit shift/mask arithmetic, identical in any engine;
    //      zbucket is the file-assignment a Z-ordered writer would use ----
    Q("q83_zorder",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val x = pmod(col("user_id"), lit(65536L)).cast("long")
        val y = datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
        e.select(col("event_id"),
          Layout.zorder2(x, y).as("zval"))
          .withColumn("zbucket", expr("zval div 65536"))
      },
      Some {
        // CAST to BIGINT: spread16's last step shifts past 2^31 — 32-bit
        // arithmetic would overflow in the oracle engine
        val x = "(CAST(user_id % 65536 AS BIGINT))"
        val y = "(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT))"
        s"""SELECT event_id,
           |  ${Layout.zorder2Sql(x, y)} AS zval,
           |  ${Layout.zorder2Sql(x, y)} // 65536 AS zbucket
           |FROM events""".stripMargin
      }),

    // ---- incremental batch-vs-store dedup: exact (md5) + best near
    //      match via exact-recall prefix filtering, new×store only.
    //      The BATCH is bounded to the base id range (doc_id < 1e8 =
    //      one ScaleUp replica): the nightly contract this operator
    //      models is a FIXED-SIZE arrival set against a GROWING store
    //      — arrivals don't multiply because the warehouse got older.
    //      At the driver scales every doc_id is < 1e8, so the bound is
    //      a no-op for correctness (oracle rows identical); at scaled
    //      dirs it keeps the row measuring the contract shape instead
    //      of batch×store both growing — the r14 honest-bench probe
    //      measured THAT shape superlinear (20M → 579M candidates at
    //      ×1 → ×10 on the saturated 3-gram vocabulary; PLANS.md), and
    //      the operator's new saturation guard now names the cliff at
    //      call time. BOTH contract enforcements are armed: a generous
    //      posting cap (20k — a posting list can't exceed the corpus,
    //      so it is bit-inert at every driver scale and the oracle is
    //      unchanged; it backstops the templated-corpus degenerate
    //      mass, with q195 as the drop-and-report audit leg) and the
    //      saturation guard with a DELIBERATELY raised budget: the
    //      guard's own eager estimate at ×100 is 381.5M candidates —
    //      every contributing token under the cap, i.e. genuine
    //      mid-frequency fan-out that is LINEAR in the store (batch
    //      fixed) — and 600M admits that measured shape while still
    //      naming any superlinear regression loudly ----
    Q("q85_incremental_dedup",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val r = Dedup.incrementalDedup(
          d.where(col("doc_id") % 7 === 3 && col("doc_id") < 100000000L),
          d.where(col("doc_id") % 7 =!= 3),
          "text", "doc_id", shingleN = 3, threshold = 0.7,
          maxPostings = 20000L, maxCandidateVolume = 600000000L)
        r.select(col("doc_id"), col("exact_dup"), col("best_old_id"),
          round(col("best_jaccard"), 6).as("best_jaccard"))
      },
      Some("""WITH newb AS (SELECT doc_id, text FROM documents
                            WHERE doc_id % 7 = 3 AND doc_id < 100000000),
              old AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3),
              shn AS (
                SELECT doc_id,
                  list_distinct([substr(text, CAST(i AS INTEGER), 3)
                    FOR i IN generate_series(1, greatest(length(text) - 2, 0))]) AS s
                FROM newb),
              sho AS (
                SELECT doc_id,
                  list_distinct([substr(text, CAST(i AS INTEGER), 3)
                    FOR i IN generate_series(1, greatest(length(text) - 2, 0))]) AS s
                FROM old),
              pairs AS (
                SELECT n.doc_id AS nid, o.doc_id AS oid,
                  len(list_filter(n.s, x -> list_contains(o.s, x))) AS inter,
                  len(n.s) + len(o.s)
                    - len(list_filter(n.s, x -> list_contains(o.s, x))) AS uni
                FROM shn n, sho o),
              v AS (
                SELECT nid, oid, CAST(inter AS DOUBLE) / uni AS j
                FROM pairs
                WHERE uni > 0 AND CAST(inter AS DOUBLE) / uni >= 0.7),
              best AS (
                SELECT nid, oid, j,
                       row_number() OVER (PARTITION BY nid
                                          ORDER BY j DESC, oid ASC) AS rn
                FROM v),
              ex AS (SELECT DISTINCT md5(text) AS k FROM old)
              SELECT n.doc_id,
                     (ex.k IS NOT NULL) AS exact_dup,
                     b.oid AS best_old_id,
                     round(b.j, 6) AS best_jaccard
              FROM newb n
              LEFT JOIN ex ON md5(n.text) = ex.k
              LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON n.doc_id = b.nid""")),

    // ---- the audit leg of q85's armed posting cap (the q148 pattern):
    //      union-corpus shingle tokens whose posting lists exceed the
    //      cap and were therefore dropped from candidate generation.
    //      The oracle REPLAYS the census (not just an empty assert) —
    //      at driver scales no posting list can reach 20k so the result
    //      is empty by arithmetic, and at a saturated scaled corpus the
    //      drops become enumerable exactly like q148's ----
    Q("q195_incremental_audit",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        Dedup.similarityJoinDroppedTokens(
          d.where((col("doc_id") % 7 === 3 && col("doc_id") < 100000000L) ||
            col("doc_id") % 7 =!= 3),
          "text", shingleN = 3, maxPostings = 20000L)
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents
                         WHERE (doc_id % 7 = 3 AND doc_id < 100000000)
                            OR doc_id % 7 <> 3),
              sh AS (
                SELECT doc_id,
                  unnest(list_distinct([substr(text, CAST(i AS INTEGER), 3)
                    FOR i IN generate_series(1, greatest(length(text) - 2, 0))])) AS token
                FROM d)
              SELECT token, count(*) AS n_postings
              FROM sh GROUP BY token HAVING count(*) > 20000""")),

    // ---- q84's deterministic feature leg under the FULL oracle (the
    //      q44 integer/float split): hashed-BoW bucket counts with the
    //      portable md5-derived token hash, every (doc, bucket, count)
    //      row replayed by DuckDB. The float remainder of q84 — L1
    //      shares and the GD fit — is spec-anchored (LogRegSpec); the
    //      native xxhash64 family stays q84's hot path ----
    Q("q187_bow_features",
      (s, dir) => graft.model.LogReg.hashedCounts(
        Tables.load(s, dir, "documents"), "text", "doc_id",
        dim = 128, portable = true),
      Some("""WITH t AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)),
                         '\s+')) AS tk
                FROM documents),
              h AS (
                SELECT doc_id,
                       CAST(CAST(('0x' || substr(md5(tk), 1, 12)) AS UBIGINT)
                            % 128 AS INTEGER) AS bucket
                FROM t)
              SELECT doc_id, bucket, count(*) AS c
              FROM h GROUP BY 1, 2""")),

    // ---- fastText-style quality classifier: hashed-BoW logistic
    //      regression trained distributed (one treeAggregate per GD
    //      step, model collect is ≤ dim+1 longs) on the weak label
    //      lang='en', scoring the whole corpus. UNDER THE HASH ORACLE
    //      since round 15: portable mode = q187's md5 feature leg +
    //      FixedPoint gradient accumulation, so the full 12-step fit
    //      AND the scores replay in DuckDB ----
    Q("q84_quality_classifier",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        graft.model.LogReg.trainScore(d, "text", "doc_id",
            col("lang") === "en", dim = 128, iters = 12, portable = true)
          .select(col("doc_id"), round(col("score"), 4).as("score"),
            (col("score") >= 0.5).as("pred_en"))
      },
      Some(logRegOracle(dim = 128, iters = 12))),

    // ---- blocked edit-distance entity resolution: the string-metric
    //      dedup member (everything else is set-based). Blocking on
    //      (brand, first name word) bounds the pair fan-out; Spark's
    //      threshold-banded levenshtein verifies inside blocks ----
    Q("q144_fuzzy_match",
      (s, dir) => Dedup.fuzzyMatchPairs(
        Tables.load(s, dir, "part"), "p_name", "p_partkey",
        Seq(col("p_brand"), substring_index(col("p_name"), " ", 1)),
        // cap ARMED as the pattern users should copy: generous enough
        // to be bit-identical here (max block is 128 at sf0.1, ~1.3k
        // extrapolated at sf1), while a degenerate blocking key at
        // scale gets dropped-and-reported instead of going quadratic;
        // q146 is the audit leg asserting nothing was dropped
        maxDist = 3, maxBlockSize = 2000L),
      Some("""WITH p AS (
                SELECT p_partkey AS id, p_name AS name, p_brand AS b,
                       split_part(p_name, ' ', 1) AS w1
                FROM part)
              SELECT a.id AS id_a, b2.id AS id_b,
                     CAST(levenshtein(a.name, b2.name) AS BIGINT) AS dist
              FROM p a JOIN p b2
                ON a.b = b2.b AND a.w1 = b2.w1 AND a.id < b2.id
              WHERE levenshtein(a.name, b2.name) <= 3""")),

    // ---- the audit leg of q144's armed block cap: blocking-key values
    //      whose blocks exceed the cap (dropped whole from the match).
    //      Empty here — the oracled assertion that q144's cap dropped
    //      NOTHING, so its result is bit-identical to the uncapped
    //      form; non-empty at scale means "fix the blocking predicate",
    //      with the offending key values and sizes in hand ----
    Q("q146_fuzzy_audit",
      (s, dir) => Dedup.fuzzyMatchDroppedBlocks(
        Tables.load(s, dir, "part"),
        Seq(col("p_brand"), substring_index(col("p_name"), " ", 1)),
        maxBlockSize = 2000L),
      Some("""SELECT p_brand AS block_0,
                     split_part(p_name, ' ', 1) AS block_1,
                     count(*) AS n_rows
              FROM part GROUP BY 1, 2 HAVING count(*) > 2000""")),

    // ---- rendezvous (HRW) resharding 16 → 20: minimal-movement shard
    //      reassignment — moved docs land ONLY on added shards, expected
    //      moved fraction (20−16)/20. Portable 48-bit md5 weights,
    //      argmax encoded as max(w·64+s) then mod 64, so the oracle
    //      replays the whole assignment including tie-breaks ----
    Q("q177_rendezvous_reshard",
      (s, dir) => Layout.rendezvousReshard(
        Tables.load(s, dir, "documents"), "doc_id", 16, 20),
      Some("""WITH w AS (
                SELECT doc_id, s.s AS s,
                       CAST(('0x' || substr(md5('hrw:' ||
                              CAST(doc_id AS VARCHAR) || ':' ||
                              CAST(s.s AS VARCHAR)), 1, 12)) AS UBIGINT)
                         AS w
                FROM documents, LATERAL (
                  SELECT unnest(generate_series(0, 19)) AS s) s),
              k AS (
                SELECT doc_id,
                       max(CASE WHEN s < 16 THEN w * 64 + s END) AS k16,
                       max(w * 64 + s) AS k20
                FROM w GROUP BY 1)
              SELECT doc_id, CAST(k16 % 64 AS INTEGER) AS shard_from,
                     CAST(k20 % 64 AS INTEGER) AS shard_to,
                     ((k16 % 64) <> (k20 % 64)) AS moved
              FROM k"""))
  )
}
