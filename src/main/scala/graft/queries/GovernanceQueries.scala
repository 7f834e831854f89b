package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{PiiScan, Versioning}

/** Round-9 corpus-governance operators: content-addressed lineage
  * identity, snapshot-to-snapshot dataset diff (the v7 → v8 changeset
  * a re-curation run must publish), and checksum-validated PII
  * scanning (Luhn). All three under the full DuckDB hash oracle.
  */
object GovernanceQueries {

  val qs: Seq[Q] = Seq(

    // ---- content-addressed row identity + duplicate-content census.
    //      The hash is the row's VERSION-INDEPENDENT identity (what a
    //      dataset-diff keys change detection on); the windowed count
    //      surfaces content collisions across distinct doc_ids. ----
    Q("q158_lineage",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val h = Versioning.rowHash(
          Seq(col("text"), col("lang"), col("source")))
        d.select(col("doc_id"), h.as("content_hash"))
          .withColumn("n_same_content",
            count(lit(1)).over(
              Window.partitionBy(col("content_hash"))))
      },
      Some("""WITH h AS (
                SELECT doc_id,
                       md5(concat_ws(chr(1),
                         coalesce(text, chr(2)),
                         coalesce(lang, chr(2)),
                         coalesce(source, chr(2)))) AS content_hash
                FROM documents)
              SELECT doc_id, content_hash,
                     count(*) OVER (PARTITION BY content_hash)
                       AS n_same_content
              FROM h"""),
    ),

    // ---- snapshot diff: v_old lacks doc_id%19=0 (later additions),
    //      v_new lacks doc_id%23=0 (removals) and mutates text for
    //      doc_id%17=0 (changes). Output is the changeset only —
    //      proportional to change volume, never corpus volume. ----
    Q("q159_corpus_diff",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"), col("source"))
        val vOld = d.where(col("doc_id") % 19 =!= 0)
        val vNew = d.where(col("doc_id") % 23 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 17 === 0,
              replace(col("text"), lit("a"), lit("@")))
              .otherwise(col("text")))
        Versioning.datasetDiff(vOld, vNew, "doc_id",
          Seq("text", "lang", "source"))
      },
      Some("""WITH base AS (
                SELECT doc_id, text, lang, source FROM documents),
              v_old AS (
                SELECT doc_id,
                       md5(concat_ws(chr(1),
                         coalesce(text, chr(2)), coalesce(lang, chr(2)),
                         coalesce(source, chr(2)))) AS h
                FROM base WHERE doc_id % 19 <> 0),
              v_new AS (
                SELECT doc_id,
                       md5(concat_ws(chr(1),
                         coalesce(CASE WHEN doc_id % 17 = 0
                                       THEN replace(text, 'a', '@')
                                       ELSE text END, chr(2)),
                         coalesce(lang, chr(2)),
                         coalesce(source, chr(2)))) AS h
                FROM base WHERE doc_id % 23 <> 0)
              SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                     CASE WHEN o.h IS NULL THEN 'added'
                          WHEN n.h IS NULL THEN 'removed'
                          ELSE 'changed' END AS status
              FROM v_old o FULL OUTER JOIN v_new n USING (doc_id)
              WHERE o.h IS NULL OR n.h IS NULL OR o.h <> n.h"""),
    ),

    // ---- Luhn-validated PAN scan: valid and invalid card numbers
    //      injected deterministically; only the checksum-valid one may
    //      flag. The whole scan (extract + per-candidate Luhn fold) is
    //      higher-order Column expressions — no UDF, no shuffle. ----
    Q("q160_luhn_scan",
      (s, dir) => {
        val t = concat(col("text"),
          when(col("doc_id") % 5 === 0,
            lit(" card 4111111111111111 ok")).otherwise(lit("")),
          when(col("doc_id") % 9 === 0,
            lit(" num 4111111111111112")).otherwise(lit("")))
        val (nCand, nValid, flag) = PiiScan.scan(t)
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), nCand.as("n_candidates"),
            nValid.as("n_valid"), flag.as("has_pan"))
      },
      Some("""WITH m AS (
                SELECT doc_id,
                  text ||
                  CASE WHEN doc_id % 5 = 0
                       THEN ' card 4111111111111111 ok' ELSE '' END ||
                  CASE WHEN doc_id % 9 = 0
                       THEN ' num 4111111111111112' ELSE '' END AS t
                FROM documents),
              c AS (
                SELECT doc_id,
                       regexp_extract_all(t, '[0-9]{13,19}') AS cands
                FROM m),
              v AS (
                SELECT doc_id, cands,
                  [x FOR x IN cands IF
                    list_sum([CASE WHEN i % 2 = 0
                      THEN CASE WHEN 2*CAST(substr(x, length(x)-CAST(i AS INTEGER)+1, 1) AS INTEGER) > 9
                           THEN 2*CAST(substr(x, length(x)-CAST(i AS INTEGER)+1, 1) AS INTEGER) - 9
                           ELSE 2*CAST(substr(x, length(x)-CAST(i AS INTEGER)+1, 1) AS INTEGER) END
                      ELSE CAST(substr(x, length(x)-CAST(i AS INTEGER)+1, 1) AS INTEGER) END
                      FOR i IN generate_series(1, length(x))]) % 10 = 0]
                    AS valids
                FROM c)
              SELECT doc_id, CAST(len(cands) AS BIGINT) AS n_candidates,
                     CAST(len(valids) AS BIGINT) AS n_valid,
                     len(valids) > 0 AS has_pan
              FROM v"""),
    ),

    // ---- time-travel diff: two corpus versions PUBLISHED through the
    //      warehouse's immutable-version + pointer-swap machinery, read
    //      back by version number, diffed with Versioning.datasetDiff.
    //      The oracle predicts the changeset straight from the source
    //      parquet, so a publish that loses rows, a pointer that
    //      resolves to the wrong version, or a lossy parquet round trip
    //      all hash-mismatch. ----
    Q("q161_snapshot_diff",
      (s, dir) => {
        val w = new graft.core.Warehouse(s,
          graft.core.Scratch.dir("q161_snapshot_diff"))
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"), col("source"))
        w.publishVersion(d.where(col("doc_id") % 31 =!= 0), "corpus")
        w.publishVersion(
          d.where(col("doc_id") % 29 =!= 0)
            .withColumn("text",
              when(col("doc_id") % 13 === 0, upper(col("text")))
                .otherwise(col("text"))),
          "corpus")
        Versioning.datasetDiff(
          w.readVersion("corpus", 1), w.readVersion("corpus", 2),
          "doc_id", Seq("text", "lang", "source"))
      },
      Some("""WITH base AS (
                SELECT doc_id, text, lang, source FROM documents),
              v1 AS (
                SELECT doc_id,
                       md5(concat_ws(chr(1),
                         coalesce(text, chr(2)), coalesce(lang, chr(2)),
                         coalesce(source, chr(2)))) AS h
                FROM base WHERE doc_id % 31 <> 0),
              v2 AS (
                SELECT doc_id,
                       md5(concat_ws(chr(1),
                         coalesce(CASE WHEN doc_id % 13 = 0
                                       THEN upper(text) ELSE text END,
                                  chr(2)),
                         coalesce(lang, chr(2)),
                         coalesce(source, chr(2)))) AS h
                FROM base WHERE doc_id % 29 <> 0)
              SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                     CASE WHEN o.h IS NULL THEN 'added'
                          WHEN n.h IS NULL THEN 'removed'
                          ELSE 'changed' END AS status
              FROM v1 o FULL OUTER JOIN v2 n USING (doc_id)
              WHERE o.h IS NULL OR n.h IS NULL OR o.h <> n.h"""),
    ),

    // ---- the dataset card: the per-source summary a corpus release
    //      ships with — sizes, language spread, exact-dup rate, id
    //      range. One hash-aggregate over a narrow projection; at
    //      100 TB this is a single map-side-combined pass. ----
    Q("q167_dataset_card",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("total_chars"),
            countDistinct(col("lang")).as("n_langs"),
            (count(lit(1)) - countDistinct(col("text"))).as("n_dup_texts"),
            min(col("doc_id")).as("min_id"),
            max(col("doc_id")).as("max_id"))
      },
      Some("""SELECT source, count(*) AS n_docs,
                     CAST(sum(length(text)) AS BIGINT) AS total_chars,
                     CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                     CAST(count(*) - count(DISTINCT text) AS BIGINT)
                       AS n_dup_texts,
                     min(doc_id) AS min_id, max(doc_id) AS max_id
              FROM documents GROUP BY source"""),
    ),
  )
}
