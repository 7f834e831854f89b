package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggs, Dedup, NgramLm, QualityRules, VectorOps, Winnow}

/** Round-5 corpus-quality operators: Gopher-style rule filtering,
  * corpus bigram-LM scoring, winnowing (MOSS) fingerprints, int8
  * embedding quantization, and BPE-pair vocabulary induction. All five
  * are exact-arithmetic formulations (integer/ppm, md5 hashes,
  * correctly-rounded IEEE steps) so each has a full DuckDB oracle.
  */
object QualityQueries {

  /** q94's oracle, generated: VectorOps.pcaFit(portable = true) +
    * pcaProject replayed whole in DuckDB.
    *
    *  - moments: q = roundAway(x·10⁴) per element; Σq_i and Σq_i·q_j in
    *    BIGINT (exact, order-free — the same longs the mapPartitions
    *    kernel accumulates); mean/covariance from them with the
    *    driver's exact operation order;
    *  - power iteration: one recursive CTE per component carries the
    *    64-vector through `iters` matvec+normalize steps — every fold
    *    runs in strict index order (list_reduce over generate_series),
    *    mirroring the driver's `(0 until dims).map(...).sum` loops, so
    *    each of the 400 iterations is bit-identical;
    *  - sign convention (first-largest-|coordinate| positive) and
    *    deflation C ← C − λvvᵀ with the driver's ((λ·v_i)·v_j)
    *    association;
    *  - projection: pc_k = fold(x·v_k) − fold(μ·v_k), NULL vectors
    *    stay NULL, half-away-from-zero 6-dp rounding both sides.
    */
  private def pcaOracle(dims: Int, k: Int, iters: Int): String = {
    def quant(x: String) = graft.ops.FixedPoint.quantizeSql(x, 1e4)
    def foldI(body: String, n: String) =
      s"list_reduce(list_transform(generate_series(1, $n), i -> $body), (x, y) -> x + y)"
    def foldJ(body: String) =
      s"list_reduce(list_transform(generate_series(1, $dims), j -> $body), (x, y) -> x + y)"
    val comps = (0 until k).map { kk =>
      s"""d$kk AS (
         |  SELECT i2 AS d0 FROM (
         |    SELECT i2, mat[i2][i2] AS diag
         |    FROM mat$kk, (SELECT unnest(generate_series(1, $dims)) AS i2) z)
         |  ORDER BY diag DESC, i2 LIMIT 1),
         |it$kk AS (
         |  -- anchor types are PINNED onto the recursion's working table
         |  -- (DuckDB casts every iteration back to them), and bare 1.0
         |  -- parses as DECIMAL(2,1) — without the CASTs the whole power
         |  -- iteration silently rounds to one decimal per step
         |  SELECT 0 AS t,
         |    list_transform(generate_series(1, $dims),
         |      i -> CASE WHEN i = d0 THEN CAST(1.0 AS DOUBLE)
         |                ELSE CAST(0.0 AS DOUBLE) END) AS v,
         |    CAST(0.0 AS DOUBLE) AS lambda
         |  FROM d$kk
         |  UNION ALL
         |  SELECT t + 1,
         |    CASE WHEN nrm > 0 THEN list_transform(w, x -> x / nrm) ELSE v END,
         |    CASE WHEN nrm > 0 THEN nrm ELSE lambda END
         |  FROM (
         |    SELECT t, v, lambda, w, sqrt(${foldI("w[i] * w[i]", dims.toString)}) AS nrm
         |    FROM (
         |      SELECT t, v, lambda,
         |        list_transform(generate_series(1, $dims),
         |          i -> ${foldJ("mat[i][j] * v[j]")}) AS w
         |      FROM it$kk, mat$kk) t1) t2
         |  WHERE t < $iters),
         |vr$kk AS MATERIALIZED (SELECT v, lambda FROM it$kk WHERE t = $iters),
         |im$kk AS (
         |  SELECT i2 FROM vr$kk, (SELECT unnest(generate_series(1, $dims)) AS i2) z
         |  ORDER BY abs(v[i2]) DESC, i2 LIMIT 1),
         |vc$kk AS MATERIALIZED (
         |  SELECT CASE WHEN v[(SELECT i2 FROM im$kk)] < 0
         |              THEN list_transform(v, x -> -x) ELSE v END AS v
         |  FROM vr$kk),
         |md$kk AS (SELECT ${foldI("mus[i] * v[i]", dims.toString)} AS mdot
         |          FROM mul, vc$kk),
         |mat${kk + 1} AS MATERIALIZED (
         |  SELECT list_transform(generate_series(1, $dims), i ->
         |           list_transform(generate_series(1, $dims), j ->
         |             mat[i][j] - ((lambda * v[i]) * v[j]))) AS mat
         |  FROM mat$kk, vr$kk m2)""".stripMargin
    }.mkString(",\n")
    // NULL on ANY wrong-length embedding, not just NULL ones (r15
    // advice): the engine's zip_with NULL-pads a short/long vector and
    // its dot comes out NULL for len ≠ dims, while a prefix fold over
    // least(len, dims) would produce a number — and an EMPTY list would
    // make the init-less list_reduce error out. The len guard mirrors
    // the zip_with semantics exactly (fixtures are uniform 64-dim, so
    // driver-scale hashes are unchanged).
    val pcCols = (0 until k).map { kk =>
      s"""  round(CASE WHEN ep.xv IS NULL OR len(ep.xv) <> $dims THEN NULL
         |             ELSE ${foldI(s"ep.xv[i] * c$kk.v[i]", dims.toString)}
         |                  - md$kk.mdot END, 6) AS pc_$kk""".stripMargin
    }.mkString(",\n")
    val fromComps = (0 until k).map(kk => s"vc$kk c$kk, md$kk").mkString(", ")
    s"""WITH RECURSIVE v0 AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = $dims),
       |dd AS (SELECT unnest(generate_series(1, $dims)) AS d),
       |qm AS MATERIALIZED (SELECT vec_id, d, ${quant("v[d]")} AS q FROM v0 CROSS JOIN dd),
       |n0 AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v0),
       |s1 AS (SELECT d, SUM(q) AS s FROM qm GROUP BY d),
       |muc AS (SELECT d, (CAST(s AS DOUBLE) / 10000.0) / n AS mu FROM s1, n0),
       |mul AS MATERIALIZED (SELECT list(mu ORDER BY d) AS mus FROM muc),
       |g AS (SELECT a.d AS i2, b.d AS j2, SUM(a.q * b.q) AS m
       |      FROM qm a JOIN qm b USING (vec_id) GROUP BY a.d, b.d),
       |c0e AS (
       |  SELECT g.i2, g.j2,
       |    (((CAST(g.m AS DOUBLE) / 10000.0) / 10000.0) / n0.n) - mi.mu * mj.mu AS c
       |  FROM g CROSS JOIN n0
       |  JOIN muc mi ON mi.d = g.i2
       |  JOIN muc mj ON mj.d = g.j2),
       |cm0 AS (SELECT i2, list(c ORDER BY j2) AS r FROM c0e GROUP BY i2),
       |mat0 AS MATERIALIZED (SELECT list(r ORDER BY i2) AS mat FROM cm0),
       |$comps,
       |ep AS (SELECT vec_id, embedding::DOUBLE[] AS xv FROM embeddings)
       |SELECT ep.vec_id,
       |$pcCols
       |FROM ep, $fromComps""".stripMargin
  }

  val qs: Seq[Q] = Seq(

    // ---- blocklist phrase matching (safety scrub): token-aligned
    //      dictionary hits via broadcast dict + phrase-sized token
    //      windows; the oracle recomputes every hit with list slicing,
    //      so tokenization, alignment, and per-phrase lengths must all
    //      agree. Dictionary mixes 3/2/2-token phrases plus one absent
    //      phrase (must contribute nothing). ----
    Q("q169_blocklist",
      (s, dir) => QualityRules.blocklistHits(
        Tables.load(s, dir, "documents"), "text", "doc_id",
        Seq("slow hash batch", "merge group", "table hash", "zz qq")),
      Some("""WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(lower(text)), '\s+') AS ws
                FROM documents),
              d(phrase, l) AS (VALUES ('slow hash batch', 3),
                                      ('merge group', 2),
                                      ('table hash', 2),
                                      ('zz qq', 2)),
              dd AS (SELECT phrase, l,
                            regexp_split_to_array(phrase, ' ') AS pw
                     FROM d),
              u AS (SELECT doc_id, ws,
                           unnest(generate_series(1, len(ws))) AS p
                    FROM t),
              m AS (SELECT doc_id, phrase
                    FROM u JOIN dd
                      ON CAST(p AS INTEGER) + l - 1 <= len(ws)
                     AND ws[CAST(p AS INTEGER):
                            CAST(p AS INTEGER) + CAST(l AS INTEGER) - 1] = pw)
              SELECT doc_id, count(*) AS n_hits,
                     CAST(count(DISTINCT phrase) AS BIGINT) AS n_phrases
              FROM m GROUP BY doc_id"""),
    ),

    // ---- Gopher/C4 rule battery: integer/ppm metrics + hard-threshold
    //      verdicts, one map-only pass (the deterministic pre-filter in
    //      front of the learned classifier q84) ----
    Q("q86_gopher_rules",
      (s, dir) => QualityRules.gopherRules(
        Tables.load(s, dir, "documents"), "text", "doc_id"),
      Some("""WITH w AS (
                SELECT doc_id, text,
                       regexp_split_to_array(trim(lower(text)), '\s+') AS ws,
                       CAST(length(text) AS BIGINT) AS nchars
                FROM documents),
              m AS (
                SELECT doc_id,
                  CAST(len(ws) AS BIGINT) AS n_words,
                  CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT)
                    AS n_word_chars,
                  CAST(len(list_filter(ws, x -> list_contains(
                    ['the','a','an','of','and','to','in','is','it','that'], x)))
                    AS BIGINT) AS nstop,
                  CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
                    AS BIGINT) AS nalpha,
                  nchars,
                  nchars - CAST(length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))
                    AS BIGINT) AS nsym
                FROM w),
              p AS (
                SELECT doc_id, n_words, n_word_chars,
                  n_word_chars * 1000000 // n_words AS mean_word_len_ppm,
                  nstop * 1000000 // n_words AS stopword_ppm,
                  nalpha * 1000000 // n_words AS alpha_word_ppm,
                  CASE WHEN nchars > 0 THEN nsym * 1000000 // nchars
                       ELSE 0 END AS symbol_ppm
                FROM m)
              SELECT doc_id, n_words, n_word_chars, mean_word_len_ppm,
                     stopword_ppm, alpha_word_ppm, symbol_ppm,
                     (n_words >= 50 AND n_words <= 100000) AS pass_words,
                     (mean_word_len_ppm >= 3000000 AND mean_word_len_ppm <= 10000000)
                       AS pass_word_len,
                     (stopword_ppm >= 20000) AS pass_stopwords,
                     (alpha_word_ppm >= 800000) AS pass_alpha,
                     (symbol_ppm <= 100000) AS pass_symbols,
                     (n_words >= 50 AND n_words <= 100000
                      AND mean_word_len_ppm >= 3000000 AND mean_word_len_ppm <= 10000000
                      AND stopword_ppm >= 20000
                      AND alpha_word_ppm >= 800000
                      AND symbol_ppm <= 100000) AS pass_all
              FROM p""")),

    // ---- corpus bigram LM score: add-one-smoothed conditional
    //      probability in exact ppm integers (no log, no float —
    //      cross-engine reproducible KenLM-style fluency filter) ----
    Q("q87_bigram_lm",
      (s, dir) => NgramLm.bigramScore(
        Tables.load(s, dir, "documents"), "text", "doc_id"),
      Some("""WITH t AS (
                SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
                FROM documents),
              bg AS (
                SELECT doc_id, ws[CAST(i.i AS INTEGER)] AS w1,
                       ws[CAST(i.i AS INTEGER) + 1] AS w2
                FROM t, LATERAL (
                  SELECT unnest(generate_series(1, len(ws) - 1)) AS i) i
                WHERE len(ws) >= 2),
              c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
                      FROM bg GROUP BY 1, 2),
              c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
                     FROM bg GROUP BY 1),
              v AS (SELECT CAST(count(DISTINCT u.t) AS BIGINT) AS v
                    FROM (SELECT unnest(ws) AS t FROM t) u),
              s AS (
                SELECT bg.doc_id,
                       (c12.c12 + 1) * 1000000 // (c1.c1 + v.v) AS p_ppm
                FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v),
              d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                           CAST(sum(p_ppm) AS BIGINT) AS sp
                    FROM s GROUP BY 1)
              SELECT doc_id, COALESCE(n_bigrams, 0) AS n_bigrams,
                     sp // n_bigrams AS lm_ppm
              FROM documents LEFT JOIN d USING (doc_id)""")),

    // ---- winnowing (MOSS) fingerprints: md5 k-gram hashes, w-window
    //      minima, corpus-wide sharing counts — the sub-document
    //      copy-detection standard with its ≥ k+w−1 match guarantee ----
    Q("q88_winnowing",
      (s, dir) => Winnow.fingerprints(
        Tables.load(s, dir, "documents"), "text", "doc_id", k = 8, w = 4),
      Some("""WITH g AS (
                SELECT doc_id, i.i AS p,
                  CAST(CAST(('0x' || substr(md5(substr(text, CAST(i.i AS INTEGER), 8)), 1, 8))
                    AS UBIGINT) AS BIGINT) AS h
                FROM documents, LATERAL (
                  SELECT unnest(generate_series(1, length(text) - 7)) AS i) i
                WHERE length(text) >= 8),
              wm AS (
                SELECT doc_id, p,
                  min(h) OVER (PARTITION BY doc_id ORDER BY p
                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
                  count(*) OVER (PARTITION BY doc_id) AS npos
                FROM g),
              sel AS (SELECT DISTINCT doc_id, wmin AS fp
                      FROM wm WHERE p <= greatest(npos - 3, 1)),
              sh AS (SELECT fp, count(DISTINCT doc_id) AS ndocs
                     FROM sel GROUP BY 1),
              d AS (SELECT sel.doc_id, CAST(count(*) AS BIGINT) AS n_fp,
                           CAST(sum(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END)
                             AS BIGINT) AS n_shared_fp
                    FROM sel JOIN sh USING (fp) GROUP BY 1)
              SELECT doc_id,
                     CAST(greatest(length(text) - 7, 0) AS BIGINT) AS n_grams,
                     COALESCE(n_fp, 0) AS n_fp,
                     COALESCE(n_shared_fp, 0) AS n_shared_fp
              FROM documents LEFT JOIN d USING (doc_id)""")),

    // ---- int8 embedding quantization audit: exact integer checksums of
    //      the faiss-style symmetric scalar quantizer (float→double is
    //      exact; scale+round are correctly-rounded IEEE + C round) ----
    Q("q89_embedding_quantize",
      (s, dir) => VectorOps.quantizeInt8Stats(
        Tables.load(s, dir, "embeddings"), "embedding", "vec_id"),
      Some("""WITH e AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings),
              m AS (SELECT vec_id, v,
                           list_max(list_transform(v, x -> abs(x))) AS mx
                    FROM e),
              q AS (
                SELECT vec_id,
                  CASE WHEN mx > 0 THEN CAST(round(u.x * 127 / mx) AS BIGINT)
                       ELSE 0 END AS q
                FROM m, LATERAL (SELECT unnest(v) AS x) u)
              SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dims,
                     CAST(sum(q) AS BIGINT) AS qsum,
                     CAST(min(q) AS BIGINT) AS qmin,
                     CAST(max(q) AS BIGINT) AS qmax,
                     CAST(sum(CASE WHEN abs(q) = 127 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_sat
              FROM q GROUP BY 1""")),

    // ---- one BPE merge round at corpus scale: within-word adjacent
    //      char-pair counts, top-20 merge candidates, deterministic
    //      total order (count desc, pair asc) ----
    Q("q90_bpe_pairs",
      (s, dir) => NgramLm.bpePairCounts(
        Tables.load(s, dir, "documents"), "text", topK = 20),
      Some("""WITH w AS (
                SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
                FROM documents),
              p AS (
                SELECT substr(word, CAST(i.i AS INTEGER), 2) AS pair
                FROM w, LATERAL (
                  SELECT unnest(generate_series(1, length(word) - 1)) AS i) i
                WHERE length(word) >= 2),
              c AS (SELECT pair, CAST(count(*) AS BIGINT) AS cnt
                    FROM p GROUP BY 1)
              SELECT pair, cnt,
                     CAST(row_number() OVER (ORDER BY cnt DESC, pair ASC)
                       AS INTEGER) AS rank
              FROM c
              ORDER BY rank
              LIMIT 20""")),

    // ---- Johnson–Lindenstrauss projection with a deterministic
    //      md5 ±1 matrix: exact integer arithmetic end-to-end, so the
    //      16 projected coordinates hash-match across engines ----
    Q("q91_jl_projection",
      (s, dir) => VectorOps.jlProject(
        Tables.load(s, dir, "embeddings"), "embedding", "vec_id", k = 16),
      Some {
        val projCols = (0 until 16).map { kk =>
          s"""CAST(sum(CASE WHEN CAST(('0x' || substr(md5(j || '_$kk'), 1, 8))
             |  AS UBIGINT) % 2 = 0 THEN xq ELSE -xq END) AS BIGINT) AS proj_$kk"""
            .stripMargin
        }.mkString(",\n                     ")
        s"""WITH e AS (
           |  SELECT vec_id,
           |         unnest(list_transform(embedding,
           |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS xq,
           |         generate_subscripts(embedding, 1) - 1 AS j
           |  FROM embeddings)
           |SELECT vec_id,
           |                     $projCols
           |FROM e GROUP BY vec_id""".stripMargin
      }),

    // ---- EXACT containment join (asymmetric near-subset detection):
    //      prefix filtering on the smaller side; quadratic definition
    //      is the oracle on a 300-doc slice; integer-ppm outputs ----
    Q("q92_containment_join",
      (s, dir) => Dedup.containmentPairs(
        Tables.load(s, dir, "documents").where(col("doc_id") < 300),
        "text", "doc_id", shingleN = 3, thresholdPpm = 700000L),
      Some("""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
              sh AS (
                SELECT doc_id,
                  list_distinct([substr(text, CAST(i AS INTEGER), 3)
                    FOR i IN generate_series(1, greatest(length(text) - 2, 0))]) AS s
                FROM d),
              pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS BIGINT)
                    AS inter,
                  CAST(len(a.s) AS BIGINT) AS la,
                  CAST(len(b.s) AS BIGINT) AS lb
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE len(a.s) > 0 AND len(b.s) > 0)
              SELECT id_a, id_b,
                     inter * 1000000 // least(la, lb) AS containment_ppm,
                     inter * 1000000 // (la + lb - inter) AS jaccard_ppm
              FROM pairs
              WHERE inter * 1000000 // least(la, lb) >= 700000""")),

    // ---- dedup-threshold calibration: exact pairwise Jaccard over a
    //      deterministic 1/20 sample, histogrammed by similarity decile
    //      with a reverse-cumulative pair count — the sweep run before
    //      committing a near-dup threshold (all-pairs stays on the
    //      sample by design; production dedup is the LSH path) ----
    Q("q111_threshold_calibration",
      (s, dir) => Dedup.thresholdCalibration(
        Tables.load(s, dir, "documents"), "text", "doc_id",
        shingleN = 3, sampleMod = 20L),
      Some("""WITH d AS (SELECT doc_id, text FROM documents
                         WHERE doc_id % 20 = 0
                         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                         LIMIT 500),
              sh AS (
                SELECT doc_id,
                  list_distinct([substr(text, CAST(i AS INTEGER), 3)
                    FOR i IN generate_series(1, greatest(length(text) - 2, 0))]) AS s
                FROM d),
              nz AS (SELECT * FROM sh WHERE len(s) > 0),
              pairs AS (
                SELECT CAST(len(list_filter(a.s, x -> list_contains(b.s, x)))
                         AS BIGINT) AS i,
                       CAST(len(a.s) + len(b.s)
                         - len(list_filter(a.s, x -> list_contains(b.s, x)))
                         AS BIGINT) AS u
                FROM nz a JOIN nz b ON a.doc_id < b.doc_id),
              hist AS (
                SELECT least(i * 1000000 // u // 100000, 9) AS bucket,
                       CAST(count(*) AS BIGINT) AS n_pairs
                FROM pairs GROUP BY 1)
              SELECT bucket, n_pairs,
                     CAST(sum(n_pairs) OVER (ORDER BY bucket DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS n_pairs_at_or_above
              FROM hist""")),

    // ---- collocation / phrase mining (word2phrase): adjacent-pair
    //      lift in exact 128-bit integer ppm (the log-free PMI
    //      monotone), minCount guard, deterministic top-k ----
    Q("q117_collocations",
      (s, dir) => NgramLm.collocations(
        Tables.load(s, dir, "documents"), "text", minCount = 20L, k = 25),
      Some("""WITH t AS (
                SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS ws
                FROM documents),
              bg AS (
                SELECT ws[CAST(i.i AS INTEGER)] AS w1,
                       ws[CAST(i.i AS INTEGER) + 1] AS w2
                FROM t, LATERAL (
                  SELECT unnest(generate_series(1, len(ws) - 1)) AS i) i
                WHERE len(ws) >= 2),
              c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_n
                      FROM bg GROUP BY 1, 2),
              l AS (SELECT w1, CAST(sum(pair_n) AS BIGINT) AS c1
                    FROM c12 GROUP BY 1),
              r AS (SELECT w2, CAST(sum(pair_n) AS BIGINT) AS c2
                    FROM c12 GROUP BY 1),
              n AS (SELECT CAST(sum(pair_n) AS BIGINT) AS n FROM c12)
              SELECT c12.w1, c12.w2, c12.pair_n,
                     CAST(CAST(c12.pair_n AS HUGEINT) * n.n * 1000000
                          // (CAST(l.c1 AS HUGEINT) * r.c2) AS BIGINT)
                       AS lift_ppm
              FROM c12 JOIN l USING (w1) JOIN r USING (w2), n
              WHERE c12.pair_n >= 20
              ORDER BY lift_ppm DESC, w1 ASC, w2 ASC
              LIMIT 25""")),

    // ---- incremental aggregate maintenance: fold a new batch's
    //      mergeable state (cnt/sum/min/max, DECIMAL-exact sums) into
    //      the stored rollup — merge(state(A), state(B)) ≡ state(A∪B),
    //      and the oracle IS the from-scratch aggregation ----
    Q("q93_incremental_agg",
      (s, dir) => {
        val keys = Seq("event_type", "day")
        val e = Tables.load(s, dir, "events").withColumn("day", to_date(col("ts")))
        val store = Aggs.aggState(e.where(col("event_id") % 5 =!= 0), keys, "value")
        val batch = Aggs.aggState(e.where(col("event_id") % 5 === 0), keys, "value")
        Aggs.finishAggState(Aggs.mergeAggState(store, batch, keys), keys)
      },
      Some("""SELECT event_type, CAST(ts AS DATE) AS day,
                     CAST(count(*) AS BIGINT) AS cnt,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                       AS avg_v,
                     min(value) AS min_v, max(value) AS max_v
              FROM events GROUP BY 1, 2""")),

    // ---- FULL BPE tokenizer training (6 greedy merge rounds) — the
    //      oracle replays the entire training loop in SQL (unrolled
    //      CTE per round, reduce() as the greedy merge fold) and must
    //      agree with Spark on every merge decision and the final
    //      vocabulary ----
    Q("q95_bpe_train",
      (s, dir) => NgramLm.bpeTopTokens(
        Tables.load(s, dir, "documents"), "text", rounds = 6, topK = 30),
      Some {
        def roundCtes(r: Int): String = {
          val prev = s"w${r - 1}"
          s"""p$r AS (
             |  SELECT toks[CAST(i.i AS INTEGER)] AS x,
             |         toks[CAST(i.i AS INTEGER) + 1] AS y,
             |         CAST(sum(wc) AS BIGINT) AS cnt
             |  FROM $prev, LATERAL (
             |    SELECT unnest(generate_series(1, len(toks) - 1)) AS i) i
             |  WHERE len(toks) >= 2
             |  GROUP BY 1, 2
             |  ORDER BY cnt DESC, x ASC, y ASC
             |  LIMIT 1),
             |w$r AS (
             |  SELECT wc,
             |    CASE WHEN p$r.x IS NULL THEN toks ELSE
             |      reduce(list_transform(toks, t -> [t]),
             |        (acc, el) -> CASE WHEN acc[-1] = p$r.x AND el[1] = p$r.y
             |                     THEN acc[:-2] || [acc[-1] || el[1]]
             |                     ELSE acc || el END)
             |    END AS toks
             |  FROM $prev LEFT JOIN p$r ON TRUE)""".stripMargin
        }
        val rounds = 6
        s"""WITH w0 AS (
           |  SELECT word, CAST(count(*) AS BIGINT) AS wc,
           |         [substr(word, CAST(i AS INTEGER), 1)
           |          FOR i IN generate_series(1, length(word))] AS toks
           |  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
           |          AS word FROM documents)
           |  WHERE length(word) > 0
           |  GROUP BY word),
           |${(1 to rounds).map(roundCtes).mkString(",\n")},
           |tok AS (
           |  SELECT u.t AS token, CAST(sum(wc) AS BIGINT) AS cnt
           |  FROM w$rounds, LATERAL (SELECT unnest(toks) AS t) u
           |  GROUP BY 1)
           |SELECT token, cnt,
           |       CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS INTEGER)
           |         AS rank
           |FROM tok ORDER BY rank LIMIT 30""".stripMargin
      }),

    // ---- distributed PCA: one mapPartitions pass accumulates the d×d
    //      second-moment matrix (one array per partition moves — the
    //      d²-rows-per-vector relational formulation never exists);
    //      driver-side power iteration; map-side projection. UNDER THE
    //      HASH ORACLE since round 15: portable mode accumulates the
    //      moments in FixedPoint long arithmetic (order-free, exact),
    //      and the driver's power iteration + deflation is pure
    //      correctly-rounded IEEE steps on those deterministic moments
    //      — the oracle re-derives the moments in SQL and replays all
    //      400 matvecs in recursive CTEs, bit-for-bit ----
    Q("q94_pca",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val model = graft.ops.VectorOps.pcaFit(e, "embedding", k = 4,
          portable = true)
        val r6 = (c: org.apache.spark.sql.Column) =>
          graft.ops.Numeric.roundAway(c, 6)
        graft.ops.VectorOps.pcaProject(e, "embedding", "vec_id", model)
          .select(col("vec_id"),
            r6(col("pc_0")).as("pc_0"), r6(col("pc_1")).as("pc_1"),
            r6(col("pc_2")).as("pc_2"), r6(col("pc_3")).as("pc_3"))
      },
      Some(pcaOracle(dims = 64, k = 4, iters = 100))),

    // ---- leakage-safe train/val split: connected components of the
    //      shared-winnowing-fingerprint copy graph (≥ 50% of the
    //      smaller side's fingerprints), split by md5 of the CLUSTER
    //      root — near-copies land on one side, where per-doc hashing
    //      (q53) would scatter them across train and eval ----
    Q("q143_leakage_split",
      (s, dir) => {
        val cc = Winnow.copyClusters(
          Tables.load(s, dir, "documents"), "text", "doc_id",
          k = 8, w = 4, minSharePpm = 500000L, maxPostings = 64L)
        val b = graft.ops.TextAnalysis.hashBucket(
          col("cluster_root").cast("string"), "leak1")
        cc.select(col("doc_id"), col("cluster_root"), b.as("bucket"),
          when(b < 90, "train").otherwise("val").as("split"))
      },
      Some("""WITH RECURSIVE g AS (
                SELECT doc_id, i.i AS p,
                  CAST(CAST(('0x' || substr(md5(substr(text, CAST(i.i AS INTEGER), 8)), 1, 8))
                    AS UBIGINT) AS BIGINT) AS h
                FROM documents, LATERAL (
                  SELECT unnest(generate_series(1, length(text) - 7)) AS i) i
                WHERE length(text) >= 8),
              wm AS (
                SELECT doc_id, p,
                  min(h) OVER (PARTITION BY doc_id ORDER BY p
                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
                  count(*) OVER (PARTITION BY doc_id) AS npos
                FROM g),
              sel AS (SELECT DISTINCT doc_id, wmin AS fp
                      FROM wm WHERE p <= greatest(npos - 3, 1)),
              nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp
                     FROM sel GROUP BY 1),
              keep AS (SELECT fp, doc_id FROM sel
                       QUALIFY count(*) OVER (PARTITION BY fp) <= 64),
              ov AS (SELECT a.doc_id AS x, b.doc_id AS y,
                            CAST(count(*) AS BIGINT) AS shared
                     FROM keep a JOIN keep b USING (fp)
                     WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
              e AS (SELECT x, y
                    FROM ov JOIN nf na ON na.doc_id = ov.x
                            JOIN nf nb ON nb.doc_id = ov.y
                    WHERE shared * 1000000 >= 500000 * least(na.nfp, nb.nfp)),
              eu AS (SELECT x AS a, y AS b FROM e UNION SELECT y, x FROM e),
              reach(node, lbl) AS (
                SELECT a, a FROM (SELECT DISTINCT a FROM eu) t
                UNION
                SELECT eu.b, reach.lbl FROM reach JOIN eu ON reach.node = eu.a),
              comp AS (SELECT node, min(lbl) AS root FROM reach GROUP BY 1),
              lab AS (
                SELECT d.doc_id,
                       CAST(COALESCE(c.root, d.doc_id) AS BIGINT) AS cluster_root
                FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)
              SELECT doc_id, cluster_root,
                     CAST(CAST(('0x' || substr(md5(CAST(cluster_root AS VARCHAR)
                            || 'leak1'), 1, 8)) AS UBIGINT) % 100 AS BIGINT)
                       AS bucket,
                     CASE WHEN CAST(('0x' || substr(md5(CAST(cluster_root AS VARCHAR)
                            || 'leak1'), 1, 8)) AS UBIGINT) % 100 < 90
                          THEN 'train' ELSE 'val' END AS split
              FROM lab""")),

    // ---- Gopher repetition battery (dup-line / dup-paragraph count +
    //      char fractions, top n-gram char mass). The fixture corpus is
    //      single-line, so both engines derive the same structured page:
    //      6-token lines, every 3rd line duplicated (within-doc dups by
    //      construction), paragraphs of 4 lines — then the graded
    //      operator computes the signals from the '\n'-structured text.
    Q("q174_repetition_signals",
      (s, dir) => {
        // Pure-regex synthesis (codegen'd): per-token Catalyst lambdas
        // are interpreted and were 25× slower. Produces the byte-same
        // string as the oracle's list construction: 6-token lines,
        // lines at 0-based index ≡ 0 (mod 3) appended as duplicates,
        // '\n\n' inserted after every 4th line.
        val norm = regexp_replace(trim(col("text")), "\\s+", " ")
        val s1 = regexp_replace(norm, "((?:\\S++ ){5}\\S++) ", "$1\n")
        val extras = regexp_extract_all(s1,
          lit("([^\n]++)(?:\n[^\n]++){0,2}(?:\n|$)"), lit(1))
        val dupped = concat_ws("\n", s1, array_join(extras, "\n"))
        val synth = regexp_replace(dupped,
          "((?:[^\n]*+\n){3}[^\n]*+)\n", "$1\n\n")
        QualityRules.repetitionSignals(
          Tables.load(s, dir, "documents")
            .where(trim(col("text")) =!= "")
            .select(col("doc_id"), synth.as("t")),
          "t", "doc_id")
      },
      Some("""WITH w AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                FROM documents WHERE trim(text) <> ''),
              b AS (
                SELECT doc_id, list_transform(
                         generate_series(0, CAST((len(ws)+5)//6 AS INTEGER)-1),
                         i -> array_to_string(ws[i*6+1 : i*6+6], ' ')) AS base
                FROM w),
              a AS (
                SELECT doc_id, list_concat(base,
                         [base[i] FOR i IN generate_series(1, len(base))
                                  IF (i-1)%3 = 0]) AS lns
                FROM b),
              sy AS (
                SELECT doc_id, array_to_string(
                         list_transform(
                           generate_series(0, CAST((len(lns)+3)//4 AS INTEGER)-1),
                           j -> array_to_string(lns[j*4+1 : j*4+4], chr(10))),
                         chr(10)||chr(10)) AS synth
                FROM a),
              tk AS (SELECT doc_id, synth,
                            regexp_split_to_array(trim(synth), '\s+') AS t
                     FROM sy),
              wc AS (SELECT doc_id,
                            CAST(list_sum(list_transform(t, x -> length(x)))
                              AS BIGINT) AS wchars
                     FROM tk),
              lseg AS (SELECT doc_id,
                              unnest([trim(x) FOR x IN string_split(synth, chr(10))
                                      IF trim(x) <> '']) AS v
                       FROM sy),
              pseg AS (SELECT doc_id,
                              unnest([trim(x) FOR x IN
                                      regexp_split_to_array(synth, '\n{2,}')
                                      IF trim(x) <> '']) AS v
                       FROM sy),
              lc AS (SELECT doc_id, v, CAST(count(*) AS BIGINT) AS c
                     FROM lseg GROUP BY 1, 2),
              lm AS (SELECT doc_id, SUM(c) AS n, SUM(c-1) AS d,
                            SUM(length(v)*c) AS ch, SUM(length(v)*(c-1)) AS dch
                     FROM lc GROUP BY 1),
              pq AS (SELECT doc_id, v, CAST(count(*) AS BIGINT) AS c
                     FROM pseg GROUP BY 1, 2),
              pm AS (SELECT doc_id, SUM(c) AS n, SUM(c-1) AS d,
                            SUM(length(v)*c) AS ch, SUM(length(v)*(c-1)) AS dch
                     FROM pq GROUP BY 1),
              gi AS (SELECT doc_id, t, n,
                            unnest(generate_series(1, len(t)-n+1)) AS i
                     FROM tk, (SELECT unnest([2,3,4]) AS n) ns
                     WHERE len(t) >= n),
              g AS (SELECT doc_id, n, array_to_string(t[i : i+n-1], ' ') AS v
                    FROM gi),
              gc AS (SELECT doc_id, n, v, CAST(count(*) AS BIGINT) AS c
                     FROM g GROUP BY 1, 2, 3),
              gt AS (SELECT doc_id, n,
                            c * CAST(length(replace(v, ' ', '')) AS BIGINT) AS mass,
                            row_number() OVER (PARTITION BY doc_id, n
                                               ORDER BY c DESC,
                                                 length(replace(v, ' ', '')) DESC)
                              AS rn
                     FROM gc),
              gm AS (SELECT doc_id,
                            MAX(CASE WHEN n = 2 THEN mass END) AS m2,
                            MAX(CASE WHEN n = 3 THEN mass END) AS m3,
                            MAX(CASE WHEN n = 4 THEN mass END) AS m4
                     FROM gt WHERE rn = 1 GROUP BY 1)
              SELECT lm.doc_id,
                CAST(lm.n AS BIGINT) AS n_lines,
                CAST(lm.d * 1000000 // lm.n AS BIGINT) AS dup_line_ppm,
                CAST(CASE WHEN lm.ch > 0 THEN lm.dch * 1000000 // lm.ch
                          ELSE 0 END AS BIGINT) AS dup_line_char_ppm,
                CAST(pm.n AS BIGINT) AS n_paras,
                CAST(pm.d * 1000000 // pm.n AS BIGINT) AS dup_para_ppm,
                CAST(CASE WHEN pm.ch > 0 THEN pm.dch * 1000000 // pm.ch
                          ELSE 0 END AS BIGINT) AS dup_para_char_ppm,
                CAST(COALESCE(gm.m2 * 1000000 // wc.wchars, 0) AS BIGINT)
                  AS top2_char_ppm,
                CAST(COALESCE(gm.m3 * 1000000 // wc.wchars, 0) AS BIGINT)
                  AS top3_char_ppm,
                CAST(COALESCE(gm.m4 * 1000000 // wc.wchars, 0) AS BIGINT)
                  AS top4_char_ppm
              FROM lm JOIN pm USING (doc_id) JOIN wc USING (doc_id)
                   LEFT JOIN gm USING (doc_id)""")),

    // ---- corpus-level boilerplate line strip (RefinedWeb-style): lines
    //      in >= 10 distinct docs removed everywhere. Fixture injects
    //      corpus-wide chrome (header/footer, df=500) and per-source
    //      chrome ('src srcN', df=25) around unique content lines; the
    //      operator must strip exactly the chrome and reassemble the
    //      survivors in order. ----
    Q("q175_boilerplate_strip",
      (s, dir) => {
        // Regex line-chunking (same 6-token lines as q174's synth),
        // chrome prepended/appended as literals.
        val norm = regexp_replace(trim(col("text")), "\\s+", " ")
        val chunks = regexp_replace(norm, "((?:\\S++ ){5}\\S++) ", "$1\n")
        val synth = concat(
          lit("=== corpus header ===\nsrc "), col("source"), lit("\n"),
          chunks, lit("\n--- footer ---"))
        graft.ops.WebText.boilerplateStrip(
          Tables.load(s, dir, "documents")
            .where(trim(col("text")) =!= "")
            .select(col("doc_id"), synth.as("t")),
          "t", "doc_id", minDocs = 10L)
      },
      Some("""WITH w AS (
                SELECT doc_id, source,
                       regexp_split_to_array(trim(text), '\s+') AS ws
                FROM documents WHERE trim(text) <> ''),
              sy AS (
                SELECT doc_id, list_concat(
                         list_concat(
                           ['=== corpus header ===', 'src ' || source],
                           list_transform(
                             generate_series(0, CAST((len(ws)+5)//6 AS INTEGER)-1),
                             i -> array_to_string(ws[i*6+1 : i*6+6], ' '))),
                         ['--- footer ---']) AS lns
                FROM w),
              l AS (SELECT doc_id,
                           CAST(generate_subscripts(lns, 1) AS BIGINT) AS idx,
                           unnest(lns) AS line
                    FROM sy),
              f AS (SELECT line
                    FROM (SELECT line, COUNT(DISTINCT doc_id) AS df
                          FROM l GROUP BY 1)
                    WHERE df >= 10),
              m AS (SELECT l.doc_id, l.idx, l.line,
                           (f.line IS NOT NULL) AS isb
                    FROM l LEFT JOIN f ON l.line = f.line)
              SELECT doc_id,
                CAST(COUNT(*) AS BIGINT) AS n_lines,
                CAST(SUM(CASE WHEN isb THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                md5(COALESCE(string_agg(line, chr(10) ORDER BY idx)
                               FILTER (WHERE NOT isb), '')) AS clean_md5
              FROM m GROUP BY 1""")),

    // ---- Stupid-Backoff trigram LM scoring (Brants 2007 / the CCNet
    //      perplexity-filter shape): LM trained on the doc_id%5==0
    //      reference slice, scoring the rest, backoff factor 0.4 as the
    //      exact rational (2x) div 5 — integer ppm end to end, so the
    //      oracle replays trigram→bigram→unigram resolution exactly ----
    Q("q176_backoff_lm",
      (s, dir) => NgramLm.backoffScore(
        Tables.load(s, dir, "documents"), "text", "doc_id", trainMod = 5),
      Some("""WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(lower(text)), '\s+') AS ws
                FROM documents WHERE trim(text) <> ''),
              tr AS (SELECT doc_id, ws FROM t WHERE doc_id % 5 = 0),
              sc AS (SELECT doc_id, ws FROM t WHERE doc_id % 5 <> 0),
              tu AS (SELECT unnest(ws) AS w FROM tr),
              c1 AS (SELECT w, CAST(count(*) AS BIGINT) AS c1
                     FROM tu GROUP BY 1),
              n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tu),
              tb AS (SELECT ws[CAST(i.i AS INTEGER)] AS w1,
                            ws[CAST(i.i AS INTEGER) + 1] AS w2
                     FROM tr, LATERAL (
                       SELECT unnest(generate_series(1, len(ws) - 1)) AS i) i
                     WHERE len(ws) >= 2),
              c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
                     FROM tb GROUP BY 1, 2),
              tt AS (SELECT ws[CAST(i.i AS INTEGER)] AS w1,
                            ws[CAST(i.i AS INTEGER) + 1] AS w2,
                            ws[CAST(i.i AS INTEGER) + 2] AS w3
                     FROM tr, LATERAL (
                       SELECT unnest(generate_series(1, len(ws) - 2)) AS i) i
                     WHERE len(ws) >= 3),
              c3 AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c3
                     FROM tt GROUP BY 1, 2, 3),
              sg AS (SELECT doc_id, ws[CAST(i.i AS INTEGER)] AS w1,
                            ws[CAST(i.i AS INTEGER) + 1] AS w2,
                            ws[CAST(i.i AS INTEGER) + 2] AS w3
                     FROM sc, LATERAL (
                       SELECT unnest(generate_series(1, len(ws) - 2)) AS i) i
                     WHERE len(ws) >= 3),
              j AS (
                SELECT sg.doc_id, c3.c3, c12.c2 AS c12, c23.c2 AS c23,
                       c1a.c1 AS c1w2, c1b.c1 AS c1w3, n.n
                FROM sg
                LEFT JOIN c3 ON sg.w1 = c3.w1 AND sg.w2 = c3.w2
                            AND sg.w3 = c3.w3
                LEFT JOIN c2 c12 ON sg.w1 = c12.w1 AND sg.w2 = c12.w2
                LEFT JOIN c2 c23 ON sg.w2 = c23.w1 AND sg.w3 = c23.w2
                LEFT JOIN c1 c1a ON sg.w2 = c1a.w
                LEFT JOIN c1 c1b ON sg.w3 = c1b.w
                CROSS JOIN n),
              p AS (
                SELECT doc_id,
                  CASE WHEN c3 IS NOT NULL THEN c3 * 1000000 // c12
                       WHEN c23 IS NOT NULL
                         THEN (2 * (c23 * 1000000 // c1w2)) // 5
                       ELSE (2 * ((2 * (COALESCE(c1w3, 0) * 1000000 // n))
                             // 5)) // 5 END AS p_ppm,
                  CASE WHEN c3 IS NOT NULL THEN 1 ELSE 0 END AS h3,
                  CASE WHEN c3 IS NULL AND c23 IS NOT NULL
                       THEN 1 ELSE 0 END AS h2,
                  CASE WHEN c3 IS NULL AND c23 IS NULL
                        AND c1w3 IS NOT NULL THEN 1 ELSE 0 END AS h1
                FROM j),
              d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
                           CAST(sum(h3) AS BIGINT) AS n_hit3,
                           CAST(sum(h2) AS BIGINT) AS n_hit2,
                           CAST(sum(h1) AS BIGINT) AS n_hit1,
                           CAST(sum(p_ppm) AS BIGINT) // count(*) AS score_ppm
                    FROM p GROUP BY 1)
              SELECT b.doc_id, COALESCE(n_trigrams, 0) AS n_trigrams,
                     COALESCE(n_hit3, 0) AS n_hit3,
                     COALESCE(n_hit2, 0) AS n_hit2,
                     COALESCE(n_hit1, 0) AS n_hit1, score_ppm
              FROM (SELECT doc_id FROM documents WHERE doc_id % 5 <> 0) b
              LEFT JOIN d USING (doc_id)"""))
  )
}
