package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, Sampling, TextAnalysis => TA, UrlOps, WebText}

/** Round-5 web-curation & retrieval operators: canonical-selection
  * dedup (keep the BEST duplicate, not the first), BM25 corpus ranking
  * against seed queries, URL canonicalization + host-level dedup, and
  * CCNet-style repeated-passage removal with in-order reassembly. All
  * four carry full DuckDB oracles.
  */
object WebCurationQueries {

  private def round(c: org.apache.spark.sql.Column, scale: Int) =
    graft.ops.Numeric.roundAway(c, scale)

  /** Shared link-graph fixture (q179/q180): each document page carries
    * an absolute link, a conditional protocol-relative and
    * root-relative link (the root-relative one resolves onto the page's
    * own host — real-web self-edges), a non-href decoy, and an
    * unresolvable mailto:. Returns resolved (doc_id, src_host,
    * dst_host) rows — one per extractable+resolvable anchor.
    */
  private def srcHostCol: org.apache.spark.sql.Column =
    concat(lit("s"), (col("doc_id") % 50).cast("string"),
      lit(".example.org"))

  private def linkFixture(d: org.apache.spark.sql.DataFrame)
    : org.apache.spark.sql.DataFrame = {
    val srcHost = srcHostCol
    val html = concat(
      lit("<html><body><p>"), substring(col("text"), 1, 40),
      lit("</p><a href=\"https://h"), (col("doc_id") % 97).cast("string"),
      lit(".example.com/p/"), col("doc_id").cast("string"),
      lit("\">x</a>"),
      when(col("doc_id") % 3 === 0,
        concat(lit("<a href=\"//m"), (col("doc_id") % 11).cast("string"),
          lit(".example.net/a\">y</a>"))).otherwise(lit("")),
      when(col("doc_id") % 4 === 0,
        concat(lit("<a href=\"/local/"), col("doc_id").cast("string"),
          lit("\">z</a>"))).otherwise(lit("")),
      lit("<img src=\"https://img.example.com/i.png\">"),
      lit("<a href=\"mailto:a@b.c\">m</a></body></html>"))
    d.select(col("doc_id"), srcHost.as("src_host"),
        explode(WebText.extractLinks(html)).as("href"))
      .select(col("doc_id"), col("src_host"),
        WebText.resolveLink(col("href"), col("src_host")).as("url"))
      .where(col("url").isNotNull)
      .select(col("doc_id"), col("src_host"),
        UrlOps.host(col("url")).as("dst_host"))
  }

  /** The q179/q180 fixture replayed as a DuckDB CTE pair: `pages`
    * (doc_id, src_host, html) and `hosts` (doc_id, src_host, dst_host).
    */
  private val linkFixtureSql: String =
    """pages AS (
         SELECT doc_id,
           's' || CAST(doc_id % 50 AS VARCHAR) || '.example.org'
             AS src_host,
           '<html><body><p>' || substr(text, 1, 40)
           || '</p><a href="https://h' || CAST(doc_id % 97 AS VARCHAR)
           || '.example.com/p/' || CAST(doc_id AS VARCHAR) || '">x</a>'
           || (CASE WHEN doc_id % 3 = 0
                 THEN '<a href="//m' || CAST(doc_id % 11 AS VARCHAR)
                      || '.example.net/a">y</a>' ELSE '' END)
           || (CASE WHEN doc_id % 4 = 0
                 THEN '<a href="/local/' || CAST(doc_id AS VARCHAR)
                      || '">z</a>' ELSE '' END)
           || '<img src="https://img.example.com/i.png">'
           || '<a href="mailto:a@b.c">m</a></body></html>' AS html
         FROM documents),
       links AS (
         SELECT doc_id, src_host, u.href AS href
         FROM pages, LATERAL (
           SELECT unnest(regexp_extract_all(html,
             'href="([^"]+)"', 1)) AS href) u),
       resolved AS (
         SELECT doc_id, src_host,
           CASE WHEN regexp_matches(href, '(?i)^https?://') THEN href
                WHEN href LIKE '//%' THEN 'https:' || href
                WHEN href LIKE '/%'
                  THEN 'https://' || src_host || href
                ELSE NULL END AS url
         FROM links),
       hosts AS (
         SELECT doc_id, src_host,
                regexp_extract(url, '^[^/]*//([^/:]+)', 1) AS dst_host
         FROM resolved WHERE url IS NOT NULL)"""

  val qs: Seq[Q] = Seq(

    // ---- canonical-selection dedup: cluster by vocabulary fingerprint
    //      (md5 of the sorted distinct token set — catches shuffled /
    //      re-ordered copies exact text-hashing misses), keep the
    //      longest copy per cluster, lowest id on ties. One max_by
    //      hash-agg; no window, no join-back. ----
    Q("q96_canonical_dedup",
      (s, dir) => {
        // project to (id, pref, key) BEFORE the pick: the pick's final
        // id-keyed join ships every payload column of the winner rows,
        // so dropping text here keeps that join (and the decision
        // cascade) at three narrow columns per row
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"), md5(array_join(
            array_sort(array_distinct(TA.tokens(trim(lower(col("text")))))), " "))
            .as("__key"))
        Dedup.canonicalPick(d, col("__key"), col("doc_id"),
            Seq(col("n_chars")))
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
              FROM r WHERE rank <= 5""")),

    // ---- link-graph construction: href extraction from HTML, relative
    //      resolution against the page host, host-level edge counts —
    //      the raw input of the PageRank quality prior (q104). Fixture
    //      pages carry an absolute link, a conditional protocol-relative
    //      and root-relative link, a non-href decoy, and an
    //      unresolvable mailto: ----
    Q("q179_link_graph",
      (s, dir) => {
        linkFixture(Tables.load(s, dir, "documents"))
          .groupBy(col("src_host"), col("dst_host"))
          .agg(count(lit(1)).as("n_links"))
      },
      Some(s"""WITH $linkFixtureSql
              SELECT src_host, dst_host, count(*) AS n_links
              FROM hosts GROUP BY 1, 2""")),

    // ---- host-centrality quality prior: the Common-Crawl-rank shape.
    //      Distinct host→host edges from the link graph feed 3 rounds
    //      of exact-integer PageRank (the q104 engine, here with REAL
    //      dangling nodes — h*/m* hosts never link out, so their mass
    //      evaporates and the rank table must still cover them), then
    //      every document inherits its host's rank as a curation prior.
    //      Hosts ≪ docs at any corpus size: the rank table broadcasts,
    //      so the doc-side join adds zero exchanges. ----
    Q("q180_host_rank_prior",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val edges = linkFixture(d)
          .select(col("src_host"), col("dst_host")).distinct()
        val ranks = graft.ops.Graph.pageRank(edges, "src_host", "dst_host",
          iterations = 3, assumeDistinct = true)
        // doc side joins by the host EXPRESSION — never re-extracts
        // links, so the HTML pass runs once (review round-12 finding)
        d.select(col("doc_id"), srcHostCol.as("src_host"))
          .join(broadcast(ranks), col("src_host") === col("node"))
          .select(col("doc_id"), col("src_host"),
            col("rank_scaled").as("host_rank"))
      },
      Some(s"""WITH $linkFixtureSql,
              e AS (SELECT DISTINCT src_host AS src, dst_host AS dst
                    FROM hosts),
              nodes AS (SELECT DISTINCT src AS node FROM e
                        UNION SELECT DISTINCT dst FROM e),
              outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS od
                         FROM e GROUP BY 1),
              r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS r
                     FROM nodes),
              c1 AS (SELECT e.dst, CAST(sum((r0.r // od.od)) AS BIGINT) AS s
                     FROM r0 JOIN outdeg od ON r0.node = od.src
                             JOIN e ON r0.node = e.src
                     GROUP BY 1),
              r1 AS (SELECT n.node,
                            (15 * 1000000000000 + 85 * COALESCE(c1.s, 0)) // 100
                              AS r
                     FROM nodes n LEFT JOIN c1 ON n.node = c1.dst),
              c2 AS (SELECT e.dst, CAST(sum((r1.r // od.od)) AS BIGINT) AS s
                     FROM r1 JOIN outdeg od ON r1.node = od.src
                             JOIN e ON r1.node = e.src
                     GROUP BY 1),
              r2 AS (SELECT n.node,
                            (15 * 1000000000000 + 85 * COALESCE(c2.s, 0)) // 100
                              AS r
                     FROM nodes n LEFT JOIN c2 ON n.node = c2.dst),
              c3 AS (SELECT e.dst, CAST(sum((r2.r // od.od)) AS BIGINT) AS s
                     FROM r2 JOIN outdeg od ON r2.node = od.src
                             JOIN e ON r2.node = e.src
                     GROUP BY 1),
              r3 AS (SELECT n.node,
                            (15 * 1000000000000 + 85 * COALESCE(c3.s, 0)) // 100
                              AS r
                     FROM nodes n LEFT JOIN c3 ON n.node = c3.dst)
              SELECT p.doc_id, p.src_host, CAST(r3.r AS BIGINT) AS host_rank
              FROM (SELECT doc_id, src_host FROM pages) p
              JOIN r3 ON p.src_host = r3.node""")))
}
