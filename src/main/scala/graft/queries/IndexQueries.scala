package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{CorpusOverlap, InvertedIndex, Sampling, TextAnalysis => TA}

/** Round-5 third-wave operators: retrieval-index construction and
  * corpus-audit rollups — champion-list inverted index (q130),
  * per-domain quota capping (q131), bottom-k corpus-overlap sketch with
  * exact ground truth (q132), and length-bucket padding-efficiency
  * audit for batch assembly (q133). All four fully oracled.
  */
object IndexQueries {

  val qs: Seq[Q] = Seq(

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
              FROM b GROUP BY 1""")))
}
