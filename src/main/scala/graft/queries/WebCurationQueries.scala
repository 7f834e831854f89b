package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, Sampling, TextAnalysis => TA, UrlOps}

/** Round-5 web-curation & retrieval operators: canonical-selection
  * dedup (keep the BEST duplicate, not the first), BM25 corpus ranking
  * against seed queries, URL canonicalization + host-level dedup, and
  * CCNet-style repeated-passage removal with in-order reassembly. All
  * four carry full DuckDB oracles.
  */
object WebCurationQueries {

  private def round(c: org.apache.spark.sql.Column, scale: Int) =
    graft.ops.Numeric.roundAway(c, scale)

  val qs: Seq[Q] = Seq(

    // ---- canonical-selection dedup: cluster by vocabulary fingerprint
    //      (md5 of the sorted distinct token set — catches shuffled /
    //      re-ordered copies exact text-hashing misses), keep the
    //      longest copy per cluster, lowest id on ties. One max_by
    //      hash-agg; no window, no join-back. ----
    Q("q96_canonical_dedup",
      (s, dir) => {
        // project to (id, pref, key) BEFORE the pick: max_by carries its
        // whole payload struct through the exchange, and column pruning
        // does not reach inside it — dropping text here keeps the
        // shuffle at three narrow columns per row
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"), md5(array_join(
            array_sort(array_distinct(TA.tokens(trim(lower(col("text")))))), " "))
            .as("__key"))
        Dedup.canonicalPick(d, col("__key"),
            struct(col("n_chars"), -col("doc_id")))
          .select(col("doc_id"), col("n_chars"), col("n_in_cluster"))
      },
      Some("""WITH k AS (
                SELECT doc_id, n_chars,
                       md5(array_to_string(list_sort(list_distinct(
                         regexp_split_to_array(trim(lower(text)), '\s+'))), ' '))
                         AS key
                FROM documents),
              r AS (
                SELECT doc_id, n_chars,
                       row_number() OVER (PARTITION BY key
                                          ORDER BY n_chars DESC, doc_id ASC) AS rn,
                       count(*) OVER (PARTITION BY key) AS n_in_cluster
                FROM k)
              SELECT doc_id, n_chars, n_in_cluster FROM r WHERE rn = 1""")),

    // ---- BM25 corpus ranking against a seed query (quality-by-query
    //      curation): token stream is filtered to the query terms BEFORE
    //      any shuffle, per-doc totals fold in sorted term order so an
    //      external engine reproduces the float sum exactly ----
    Q("q97_bm25",
      (s, dir) => {
        TA.bm25(Tables.load(s, dir, "documents"), "text", "doc_id",
            Seq("spark", "table", "stream"), k1 = 1.2, b = 0.75)
          .select(col("doc_id"), col("n_terms"),
            round(col("score"), 6).as("score"))
      },
      Some("""WITH lens AS (
                SELECT doc_id,
                       len(regexp_split_to_array(trim(lower(text)), '\s+')) AS dl
                FROM documents),
              stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM lens),
              tf AS (
                SELECT doc_id, t, count(*) AS tf
                FROM (SELECT doc_id,
                        unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
                      FROM documents)
                WHERE t IN ('spark', 'table', 'stream')
                GROUP BY 1, 2),
              dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
              contrib AS (
                SELECT tf.doc_id, tf.t,
                       ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                         * (tf.tf * 2.2)
                         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * lens.dl
                             / (CAST(stats.sumdl AS DOUBLE) / stats.n))) AS c
                FROM tf
                JOIN dfreq USING (t)
                JOIN lens USING (doc_id), stats),
              per AS (
                SELECT doc_id, count(*) AS n_terms,
                       sum(c ORDER BY t) AS score
                FROM contrib GROUP BY 1)
              SELECT d.doc_id,
                     COALESCE(per.n_terms, 0) AS n_terms,
                     round(COALESCE(per.score, 0.0), 6) AS score
              FROM documents d LEFT JOIN per USING (doc_id)""")),

    // ---- URL canonicalization + host-level dedup: messy variants
    //      (case, www, default ports, tracking params, fragments,
    //      trailing slash) derived deterministically per doc collapse to
    //      one canonical URL per path class; pure per-row regexp chain,
    //      then one hash-agg on the canonical key ----
    Q("q98_url_canonicalize",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val messy = d.select(col("doc_id"), concat(
          when(col("doc_id") % 2 === 0, lit("HTTPS://WWW.")).otherwise(lit("http://")),
          col("source"), lit(".Example.COM"),
          when(col("doc_id") % 5 === 0,
            when(col("doc_id") % 2 === 0, lit(":443")).otherwise(lit(":80")))
            .otherwise(lit("")),
          lit("/Docs/"), (col("doc_id") % 40).cast("string"),
          when(col("doc_id") % 6 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 4 === 0, lit("?utm_source=feed"))
            .when(col("doc_id") % 4 === 1, lit("?ref=a&utm_campaign=x&page=2"))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit("#frag")).otherwise(lit("")))
          .as("url"))
        messy.select(col("doc_id"), UrlOps.canonicalizeUrl(col("url")).as("curl"))
          .groupBy(col("curl"))
          .agg(count(lit(1)).as("n_urls"), min(col("doc_id")).as("keep_id"))
          .select(col("curl").as("canonical_url"),
            UrlOps.host(col("curl")).as("host"),
            col("n_urls"), col("keep_id"))
      },
      Some("""WITH messy AS (
                SELECT doc_id,
                  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END)
                  || source || '.Example.COM'
                  || (CASE WHEN doc_id % 5 = 0 THEN
                        (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END)
                      ELSE '' END)
                  || '/Docs/' || CAST(doc_id % 40 AS VARCHAR)
                  || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
                  || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed'
                           WHEN doc_id % 4 = 1 THEN '?ref=a&utm_campaign=x&page=2'
                           ELSE '' END)
                  || (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS url
                FROM documents),
              canon AS (
                SELECT doc_id,
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(
                          regexp_replace(
                            regexp_replace(
                              regexp_replace(
                                regexp_replace(
                                  lower(regexp_extract(url, '^([^/]*//[^/]*)', 1))
                                    || regexp_replace(url, '^[^/]*//[^/]*', ''),
                                  '^(https?://)www\.', '\1'),
                                '^(https://[^/:]+):443(/|$)', '\1\2'),
                              '^(http://[^/:]+):80(/|$)', '\1\2'),
                            '#.*$', ''),
                          '(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*&?', '', 'g'),
                        '\?&', '?'),
                      '[?&]+$', ''),
                    '(.)/$', '\1') AS curl
                FROM messy)
              SELECT curl AS canonical_url,
                     regexp_extract(curl, '^[^/]*//([^/:]+)', 1) AS host,
                     count(*) AS n_urls,
                     min(doc_id) AS keep_id
              FROM canon GROUP BY 1, 2""")),

    // ---- repeated-passage scrub (CCNet-style removal, the transform
    //      counterpart of q70's profile): drop 10-word windows whose
    //      corpus frequency exceeds 1, reassemble survivors in document
    //      order; passage text shuffles exactly once, keyed by doc ----
    Q("q99_passage_scrub",
      (s, dir) => {
        Dedup.passageScrub(Tables.load(s, dir, "documents"),
            "text", "doc_id", words = 10, maxFreq = 1L)
          .select(col("doc_id"), col("n_kept"),
            length(col("clean_text")).as("n_chars_clean"),
            md5(col("clean_text")).as("clean_md5"))
      },
      Some("""WITH w AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                FROM documents),
              p AS (
                SELECT doc_id, g.g AS g,
                       array_to_string(ws[g.g*10+1 : g.g*10+10], ' ') AS p
                FROM w, LATERAL (
                  SELECT unnest(generate_series(0, len(ws)//10 - 1)) AS g) g
                WHERE len(ws) >= 10),
              f AS (SELECT md5(p) AS ph, count(*) AS pf FROM p GROUP BY 1),
              k AS (
                SELECT p.doc_id, count(*) AS n_kept,
                       array_to_string(list(p.p ORDER BY p.g), ' ') AS clean
                FROM p JOIN f ON md5(p.p) = f.ph
                WHERE f.pf <= 1 GROUP BY 1)
              SELECT d.doc_id,
                     COALESCE(k.n_kept, 0) AS n_kept,
                     CAST(length(COALESCE(k.clean, '')) AS INTEGER) AS n_chars_clean,
                     md5(COALESCE(k.clean, '')) AS clean_md5
              FROM documents d LEFT JOIN k USING (doc_id)""")),

    // ---- weighted reservoir sample (Efraimidis-Spirakis A-ES): k docs
    //      per language, P ∝ n_chars, deterministic md5-derived draws —
    //      two-phase sharded top-k on the Spark side (low-cardinality
    //      groups never funnel through one task), bit-identical to the
    //      oracle's naive single window ----
    Q("q100_weighted_sample",
      (s, dir) => {
        Sampling.weightedSample(Tables.load(s, dir, "documents"),
            col("lang"), col("n_chars"), col("doc_id"), k = 5, salt = "res1")
          .select(col("lang"), col("rank"), col("doc_id"), col("n_chars"))
      },
      Some("""WITH k AS (
                SELECT lang, doc_id, n_chars,
                       -ln((CAST(CAST(('0x' ||
                            substr(md5(CAST(doc_id AS VARCHAR) || 'res1'), 1, 8))
                            AS UBIGINT) AS DOUBLE) + 0.5) / 4294967296.0)
                         / CAST(greatest(n_chars, 1) AS DOUBLE) AS key
                FROM documents),
              r AS (
                SELECT lang, doc_id, n_chars,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY key ASC, doc_id ASC) AS rank
                FROM k)
              SELECT lang, CAST(rank AS INTEGER) AS rank, doc_id, n_chars
              FROM r WHERE rank <= 5""")))
}
