package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, TextAnalysis => TA, Windows}

/** Round-4 corpus-curation operators: canonical text normalization,
  * substring-level (stride-1) duplication profiling, sequence packing,
  * temperature-scaled mixture sampling, Z-order layout, incremental
  * batch-vs-store dedup, and a distributed quality classifier.
  */
object CurationQueries {

  private def round(c: org.apache.spark.sql.Column, scale: Int) =
    graft.ops.Numeric.roundAway(c, scale)

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
    //      ctx=512 sequences the doc spans ----
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
              FROM c"""))
  )
}
