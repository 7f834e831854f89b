package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.ops.{CorpusOverlap, Graph, InvertedIndex, Sampling, TextAnalysis => TA}

/** Round-5 third-wave operators: retrieval-index construction and
  * corpus-audit rollups — champion-list inverted index (q130),
  * per-domain quota capping (q131), bottom-k corpus-overlap sketch with
  * exact ground truth (q132), and length-bucket padding-efficiency
  * audit for batch assembly (q133). All four fully oracled.
  */
object IndexQueries {

  val qs: Seq[Q] = Seq(

    // ---- exact positional phrase search: one scan + one keyed
    //      position window; the oracle recomputes positions with list
    //      comprehension, so tokenization, adjacency, occurrence
    //      count, AND the 0-based first position must all agree ----
    Q("q168_phrase_search",
      (s, dir) => InvertedIndex.phraseSearch(
        Tables.load(s, dir, "documents"), "text", "doc_id",
        Seq("stream", "table", "hash")),
      Some("""WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(lower(text)), '\s+') AS ws
                FROM documents),
              hits AS (
                SELECT doc_id,
                       [p FOR p IN generate_series(1, len(ws) - 2)
                         IF ws[CAST(p AS INTEGER)] = 'stream'
                        AND ws[CAST(p + 1 AS INTEGER)] = 'table'
                        AND ws[CAST(p + 2 AS INTEGER)] = 'hash'] AS ps
                FROM t)
              SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_occurrences,
                     CAST(ps[1] - 1 AS INTEGER) AS first_pos
              FROM hits WHERE len(ps) > 0"""),
    ),

    // ---- champion-list inverted index: per term df/cf + the top-5
    //      postings by tf (impact-ordered index pruning). The tf table
    //      shuffles keyed by (term, doc); champion selection is the
    //      two-phase sharded top-k, so stopword-grade terms never
    //      funnel a corpus-sized postings list through one window
    //      task. ----
    Q("q130_inverted_index",
      (s, dir) => {
        InvertedIndex.champion(Tables.load(s, dir, "documents"),
          col("text"), col("doc_id"), k = 5, minDf = 2L)
      },
      Some("""WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
                FROM documents),
              tf AS (
                SELECT t, doc_id, count(*) AS tf
                FROM tok WHERE t <> '' GROUP BY 1, 2),
              stats AS (
                SELECT t, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
                FROM tf GROUP BY 1),
              ch AS (
                SELECT t, doc_id, tf,
                       row_number() OVER (PARTITION BY t
                                          ORDER BY tf DESC, doc_id ASC) AS rn
                FROM tf),
              post AS (
                SELECT t, string_agg(CAST(doc_id AS VARCHAR) || ':'
                                       || CAST(tf AS VARCHAR),
                                     ',' ORDER BY rn) AS postings
                FROM ch WHERE rn <= 5 GROUP BY 1)
              SELECT s.t AS term, s.df, s.cf, p.postings
              FROM stats s JOIN post p USING (t)
              WHERE s.df >= 2""")),

    // ---- per-domain quota cap (Gopher-style "max docs per domain"):
    //      keep the 25 longest docs per source, report per-domain
    //      kept/total volume and an order-pinned digest of the kept
    //      set. Two tiny source-keyed rollups joined co-partitioned;
    //      the only per-doc window is the sharded top-k. kept_ppm uses
    //      BIGINT div on non-negative operands, so Spark's
    //      truncate-toward-zero and DuckDB's floor agree. ----
    Q("q131_domain_cap",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val kept = Sampling.topKPerGroup(d, col("source"),
            Seq(col("n_chars").desc, col("doc_id").asc),
            shardOn = col("doc_id"), k = 25)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_chars")).as("kept_chars"),
            md5(array_join(transform(sort_array(collect_list(col("doc_id"))),
              i => i.cast("string")), ",")).as("kept_md5"))
        val totals = d.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        totals.join(kept, Seq("source"))
          .select(col("source"), col("n_docs"), col("n_kept"),
            col("total_chars"), col("kept_chars"),
            expr("kept_chars * 1000000 div total_chars").as("kept_ppm"),
            col("kept_md5"))
      },
      Some("""WITH r AS (
                SELECT source, doc_id, n_chars,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY n_chars DESC, doc_id ASC) AS rn
                FROM documents),
              kept AS (
                SELECT source, count(*) AS n_kept,
                       CAST(sum(n_chars) AS BIGINT) AS kept_chars,
                       md5(string_agg(CAST(doc_id AS VARCHAR),
                                      ',' ORDER BY doc_id)) AS kept_md5
                FROM r WHERE rn <= 25 GROUP BY 1),
              tot AS (
                SELECT source, count(*) AS n_docs,
                       CAST(sum(n_chars) AS BIGINT) AS total_chars
                FROM documents GROUP BY 1)
              SELECT t.source, t.n_docs, k.n_kept, t.total_chars,
                     k.kept_chars,
                     k.kept_chars * 1000000 // t.total_chars AS kept_ppm,
                     k.kept_md5
              FROM tot t JOIN kept k USING (source)""")),

    // ---- corpus-overlap sketch: bottom-k of md5(vocabulary) between
    //      the even- and odd-numbered source halves, at k = 64/128/256,
    //      with the exact Jaccard alongside — sketch accuracy audited
    //      in the same result. Deterministic hash ranks make the
    //      estimate itself oracle-comparable. ----
    Q("q132_corpus_overlap",
      (s, dir) => {
        val tok = Tables.load(s, dir, "documents")
          .select(
            when(substring(col("source"), 4, 10).cast("int") % 2 === 0,
              lit("a")).otherwise(lit("b")).as("corpus"),
            explode(TA.tokens(lower(col("text")))).as("t"))
          .where(length(col("t")) > 0)
        CorpusOverlap.bottomKOverlap(tok, col("corpus"), col("t"),
          ks = Seq(64, 128, 256))
      },
      Some("""WITH tok AS (
                SELECT CASE WHEN CAST(substr(source, 4, 10) AS INTEGER) % 2 = 0
                            THEN 'a' ELSE 'b' END AS corpus,
                       unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
                FROM documents),
              flags AS (
                SELECT t, bool_or(corpus = 'a') AS in_a,
                       bool_or(corpus = 'b') AS in_b
                FROM tok WHERE t <> '' GROUP BY 1),
              exact AS (
                SELECT count(*) AS n_union,
                       count(*) FILTER (WHERE in_a AND in_b) AS n_both_tot
                FROM flags),
              ranked AS (
                SELECT in_a, in_b,
                       row_number() OVER (ORDER BY md5(t) ASC, t ASC) AS rn
                FROM flags),
              ks AS (SELECT unnest([64, 128, 256]) AS k)
              SELECT ks.k AS k,
                     count(*) AS n_sampled,
                     count(*) FILTER (WHERE in_a AND in_b) AS n_both,
                     count(*) FILTER (WHERE in_a AND in_b) * 1000000
                       // count(*) AS est_ppm,
                     min(e.n_both_tot) * 1000000 // min(e.n_union) AS exact_ppm
              FROM ranked r JOIN ks ON r.rn <= ks.k CROSS JOIN exact e
              GROUP BY 1""")),

    // ---- the q114 band-join workload written NAIVELY — a plain
    //      abs(a − b) ≤ eps join with no equi key, the shape that
    //      plans BroadcastNestedLoopJoin — relying on the
    //      BandJoinRule optimizer rewrite (GraftExtensions) to plan
    //      it as a bucketed equi-join. Same oracle as q114: the rule
    //      must be invisible in results, visible only in the plan. ----
    Q("q134_band_join_auto",
      (s, dir) => {
        val c = Tables.load(s, dir, "events")
          .where(col("event_type") === "click" && col("user_id") % 10 === 0)
          .select(col("event_id"), floor(col("value") * 100).cast("long").as("vc"))
        val a = c.select(col("event_id").as("id_a"), col("vc").as("vc_a"))
        val b = c.select(col("event_id").as("id_b"), col("vc").as("vc_b"))
        a.join(b,
            abs(col("vc_a") - col("vc_b")) <= lit(1L) &&
              col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("vc_a"), col("vc_b"))
      },
      Some("""WITH c AS (
                SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS vc
                FROM events
                WHERE event_type = 'click' AND user_id % 10 = 0)
              SELECT a.event_id AS id_a, b.event_id AS id_b,
                     a.vc AS vc_a, b.vc AS vc_b
              FROM c a JOIN c b
                ON a.event_id < b.event_id AND abs(a.vc - b.vc) <= 1""")),

    // ---- length-bucket padding audit: assign each doc to its
    //      power-of-two token bucket and measure the padding a
    //      bucketed batcher would waste — the "choose your batch
    //      shapes" input. Zero-shuffle map pass + one tiny agg; all
    //      exact ppm arithmetic. ----
    Q("q133_length_buckets",
      (s, dir) => {
        val ntok = TA.tokenCount(col("text"))
        val bucket = Seq(16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
          .foldRight(lit(8192)) { (b, acc) =>
            when(ntok <= b, lit(b)).otherwise(acc)
          }
        Tables.load(s, dir, "documents")
          .select(ntok.cast("long").as("ntok"), bucket.as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ntok")).as("sum_tokens"),
            sum(col("bucket").cast("long")).as("sum_padded"))
          .select(col("bucket"), col("n_docs"), col("sum_tokens"),
            col("sum_padded"),
            expr("(sum_padded - sum_tokens) * 1000000 div sum_padded")
              .as("waste_ppm"))
      },
      Some("""WITH n AS (
                SELECT len(regexp_split_to_array(trim(text), '\s+')) AS ntok
                FROM documents),
              b AS (
                SELECT CAST(ntok AS BIGINT) AS ntok,
                       CASE WHEN ntok <= 16 THEN 16
                            WHEN ntok <= 32 THEN 32
                            WHEN ntok <= 64 THEN 64
                            WHEN ntok <= 128 THEN 128
                            WHEN ntok <= 256 THEN 256
                            WHEN ntok <= 512 THEN 512
                            WHEN ntok <= 1024 THEN 1024
                            WHEN ntok <= 2048 THEN 2048
                            WHEN ntok <= 4096 THEN 4096
                            ELSE 8192 END AS bucket
                FROM n)
              SELECT bucket, count(*) AS n_docs,
                     CAST(sum(ntok) AS BIGINT) AS sum_tokens,
                     CAST(sum(bucket) AS BIGINT) AS sum_padded,
                     (CAST(sum(bucket) AS BIGINT) - CAST(sum(ntok) AS BIGINT))
                       * 1000000 // CAST(sum(bucket) AS BIGINT) AS waste_ppm
              FROM b GROUP BY 1""")),

    // ---- exact triangle count on the part co-occurrence graph
    //      (parts sharing an order): degree-ordered orientation bounds
    //      every wedge fan-out at O(sqrt(m)) — id-ordering would hand
    //      a hub part its whole degree. Equi-joins only. ----
    Q("q135_triangles",
      (s, dir) => {
        // 10% order sample: the full co-purchase graph is near-complete
        // on TPC-H's uniform-random part draws (1.2M edges over 20k
        // parts at sf0.1) — sampling keeps realistic sparsity so the
        // benchmark measures the algorithm, not an adversarial clique
        val l = Tables.load(s, dir, "lineitem")
          .where(col("l_orderkey") % 10 === 0)
          .select(col("l_orderkey"), col("l_partkey"))
        val pairs = l.alias("a").join(l.alias("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
        Graph.triangles(pairs, "p1", "p2")
      },
      Some("""WITH li AS (
                SELECT l_orderkey, l_partkey FROM lineitem
                WHERE l_orderkey % 10 = 0),
              e0 AS (
                SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
                FROM li a JOIN li b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
              deg AS (
                SELECT n, count(*) AS deg
                FROM (SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0)
                GROUP BY 1),
              o AS (
                SELECT CASE WHEN du.deg <= dv.deg THEN e0.u ELSE e0.v END AS s,
                       CASE WHEN du.deg <= dv.deg THEN e0.v ELSE e0.u END AS t
                FROM e0
                JOIN deg du ON du.n = e0.u
                JOIN deg dv ON dv.n = e0.v),
              w AS (
                SELECT x.t AS b, y.t AS c
                FROM o x JOIN o y ON x.s = y.s AND x.t < y.t),
              tri AS (
                SELECT count(*) AS n FROM w
                JOIN e0 ON w.b = e0.u AND w.c = e0.v)
              SELECT (SELECT count(*) FROM deg) AS n_nodes,
                     (SELECT count(*) FROM e0) AS n_edges,
                     (SELECT n FROM tri) AS n_triangles""")),

    // ---- first-order Markov transition matrix over per-user event
    //      sequences: next-event counts + exact-ppm row-normalized
    //      probabilities. One user-keyed window pass, then a 25-row
    //      rollup — the "what do users do next" model input. ----
    Q("q136_markov",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .where(col("user_id").isNotNull && col("ts").isNotNull)
        val nxt = e.select(col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts").asc, col("event_id").asc)).as("to_type"))
        val c = nxt.where(col("to_type").isNotNull)
          .groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        c.select(col("from_type"), col("to_type"), col("n"),
          expr("n * 1000000 div sum(n) OVER (PARTITION BY from_type)")
            .as("p_ppm"))
      },
      Some("""WITH s AS (
                SELECT event_type,
                       lead(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS nxt
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
              c AS (
                SELECT event_type AS from_type, nxt AS to_type,
                       count(*) AS n
                FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
              SELECT from_type, to_type, n,
                     CAST(n * 1000000 // sum(n) OVER (PARTITION BY from_type)
                          AS BIGINT) AS p_ppm
              FROM c""")),

    // ---- per-group OLS trend (closed-form slope/intercept of value
    //      over time): ONE aggregation pass accumulating exact integer
    //      sums (day index × centi-quantized value), then a single
    //      float division per group. The normal-equation products run
    //      in 128-bit exact arithmetic (DECIMAL(38,0) / HUGEINT —
    //      n·Σxy overflows BIGINT at corpus scale), so both engines
    //      divide the same two exact integers: bitwise-identical
    //      slopes. ----
    Q("q137_groupwise_ols",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .where(col("ts").isNotNull && col("value").isNotNull)
          .select(col("event_type"),
            datediff(to_date(col("ts")), to_date(lit("2024-01-01")))
              .cast("long").as("x"),
            floor(col("value") * 100).cast("long").as("vc"))
        e.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("vc")).as("sy"),
            sum(col("x") * col("vc")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n"),
            expr("""CAST(CAST(n AS DECIMAL(38,0)) * sxy
                         - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
                    / CAST(CAST(n AS DECIMAL(38,0)) * sxx
                           - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"""
            ).as("__sc"))
          .select(col("event_type"), col("n"),
            graft.ops.Numeric.roundAway(col("__sc") / 100.0, 6).as("slope"))
      },
      Some("""WITH q AS (
                SELECT event_type,
                       CAST(datediff('day', DATE '2024-01-01',
                                     CAST(ts AS DATE)) AS BIGINT) AS x,
                       CAST(floor(value * 100) AS BIGINT) AS vc
                FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
              a AS (
                SELECT event_type, count(*) AS n,
                       sum(x) AS sx, sum(vc) AS sy,
                       sum(x * vc) AS sxy, sum(x * x) AS sxx
                FROM q GROUP BY 1)
              SELECT event_type, n,
                     round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0,
                           6) AS slope
              FROM a""")),

    // ---- weight-of-evidence binning (credit-scoring feature prep):
    //      quartile bins of n_chars from exact interpolated
    //      percentiles (3 scalars, broadcast back — no global sort,
    //      no ntile single-task window), per-bin WOE with 0.5 Laplace
    //      smoothing and the information-value term. Counts are exact
    //      ints; the one ln per bin runs on identical doubles in both
    //      engines. ----
    Q("q138_woe_binning",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val cuts = d.agg(
          expr("percentile(n_chars, 0.25)").as("c1"),
          expr("percentile(n_chars, 0.5)").as("c2"),
          expr("percentile(n_chars, 0.75)").as("c3"))
        val binned = d.crossJoin(broadcast(cuts))
          .select(
            (lit(1) + (col("n_chars") > col("c1")).cast("int")
              + (col("n_chars") > col("c2")).cast("int")
              + (col("n_chars") > col("c3")).cast("int")).as("bin"),
            (col("lang") === "en").cast("long").as("is_en"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), sum(col("is_en")).as("n_pos"))
          .select(col("bin"), col("n"), col("n_pos"),
            (col("n") - col("n_pos")).as("n_neg"))
        val w = binned.select(col("bin"), col("n"), col("n_pos"), col("n_neg"),
          expr("sum(n_pos) OVER ()").as("__pt"),
          expr("sum(n_neg) OVER ()").as("__nt"))
        w.select(col("bin"), col("n"), col("n_pos"), col("n_neg"),
            expr("""ln(((CAST(n_pos AS DOUBLE) + 0.5) / (CAST(__pt AS DOUBLE) + 2.0))
                    / ((CAST(n_neg AS DOUBLE) + 0.5) / (CAST(__nt AS DOUBLE) + 2.0)))"""
            ).as("__woe"))
          .select(col("bin"), col("n"), col("n_pos"), col("n_neg"),
            graft.ops.Numeric.roundAway(col("__woe"), 6).as("woe"))
      },
      Some("""WITH cuts AS (
                SELECT quantile_cont(n_chars, 0.25) AS c1,
                       quantile_cont(n_chars, 0.5) AS c2,
                       quantile_cont(n_chars, 0.75) AS c3
                FROM documents),
              b AS (
                SELECT 1 + CAST(n_chars > c1 AS INTEGER)
                         + CAST(n_chars > c2 AS INTEGER)
                         + CAST(n_chars > c3 AS INTEGER) AS bin,
                       CAST(lang = 'en' AS BIGINT) AS is_en
                FROM documents, cuts),
              g AS (
                SELECT bin, count(*) AS n,
                       CAST(sum(is_en) AS BIGINT) AS n_pos,
                       count(*) - CAST(sum(is_en) AS BIGINT) AS n_neg
                FROM b GROUP BY 1),
              w AS (
                SELECT bin, n, n_pos, n_neg,
                       sum(n_pos) OVER () AS pt, sum(n_neg) OVER () AS nt
                FROM g)
              SELECT bin, n, n_pos, n_neg,
                     round(ln(((CAST(n_pos AS DOUBLE) + 0.5)
                               / (CAST(pt AS DOUBLE) + 2.0))
                              / ((CAST(n_neg AS DOUBLE) + 0.5)
                                 / (CAST(nt AS DOUBLE) + 2.0))), 6) AS woe
              FROM w""")),

    // ---- q57's as-of workload on the NATIVE physical operator
    //      (AsOfJoinPlan → AsOfJoinStrategy → AsOfJoinExec): one
    //      exchange + sort per side, then a one-pass partition merge
    //      holding a single buffered right row. Same DuckDB ASOF
    //      oracle as the compositional form — the custom operator
    //      must be invisible in results. ----
    Q("q139_asof_native",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val purchases = e.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = e.where(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"),
            col("ts").as("view_ts"))
        graft.ops.Joins.asofJoinNative(purchases, views,
            keys = Seq("user_id"), leftTs = "ts", rightTs = "view_ts")
          .toDF("event_id", "user_id", "ts", "view_id", "__ruser", "view_ts")
          .drop("__ruser")
      },
      Some("""SELECT p.event_id, p.user_id, p.ts,
                     v.event_id AS view_id, v.ts AS view_ts
              FROM (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase') p
              ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events
                              WHERE event_type = 'view') v
                ON p.user_id = v.user_id AND p.ts >= v.ts""")),

    // ---- k-anonymity audit (privacy QA before release): group docs
    //      by quasi-identifiers (lang, source, length band), count
    //      groups below k=5, and the suppression cost of enforcing
    //      k-anonymity by dropping them. Two-level rollup — the QI
    //      grouping is the only corpus-wide shuffle; div/% operands
    //      are non-negative so Spark div == DuckDB // (q81 invariant). ----
    Q("q140_k_anonymity",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("lang"), col("source"),
            expr("n_chars div 500").as("len_band"))
        val groups = d.groupBy(col("lang"), col("source"), col("len_band"))
          .agg(count(lit(1)).as("n"))
        groups.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_groups"),
            count_if(col("n") < 5).as("n_small_groups"),
            sum(col("n")).as("n_docs"),
            sum(when(col("n") < 5, col("n")).otherwise(lit(0L)))
              .as("n_suppressed"))
          .select(col("lang"), col("n_groups"), col("n_small_groups"),
            col("n_docs"), col("n_suppressed"),
            expr("n_suppressed * 1000000 div n_docs").as("suppressed_ppm"))
      },
      Some("""WITH g AS (
                SELECT lang, source, n_chars // 500 AS len_band,
                       count(*) AS n
                FROM documents GROUP BY 1, 2, 3)
              SELECT lang, count(*) AS n_groups,
                     count(*) FILTER (WHERE n < 5) AS n_small_groups,
                     CAST(sum(n) AS BIGINT) AS n_docs,
                     CAST(COALESCE(sum(n) FILTER (WHERE n < 5), 0)
                          AS BIGINT) AS n_suppressed,
                     CAST(COALESCE(sum(n) FILTER (WHERE n < 5), 0)
                          * 1000000 // sum(n) AS BIGINT) AS suppressed_ppm
              FROM g GROUP BY 1""")),

    // ---- temporal proximity join written NAIVELY (clicks within one
    //      hour AFTER any error — no equi key, the BNLJ shape),
    //      rewritten by RangeJoinRule into a banded equi-join with NO
    //      configuration: the `+ INTERVAL 1 HOUR` literal manifests
    //      the interval width, so the rule self-selects binSize 3600
    //      (≤ 2 bins per interval row); the point side bins on
    //      floor-seconds, the interval side explodes its covered bins,
    //      the exact predicate stays as residual. ----
    Q("q141_range_join_auto",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val errors = e.where(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("ts").as("ets"))
        val clicks = e.where(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("ts").as("cts"))
        clicks.join(errors,
            col("cts") >= col("ets") &&
              col("cts") <= col("ets") + expr("INTERVAL 1 HOUR"))
          .select(col("click_id"), col("err_id"),
            (unix_timestamp(col("cts")) - unix_timestamp(col("ets")))
              .as("gap_s"))
      },
      Some("""SELECT c.event_id AS click_id, e.event_id AS err_id,
                     CAST(floor(epoch(c.ts)) - floor(epoch(e.ts)) AS BIGINT)
                       AS gap_s
              FROM (SELECT event_id, ts FROM events
                    WHERE event_type = 'click') c
              JOIN (SELECT event_id, ts FROM events
                    WHERE event_type = 'error') e
                ON c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 1 HOUR""")))
}
