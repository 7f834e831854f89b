package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.core.{Export, Tables}
import graft.ops.{TextAnalysis => TA, WebText => WT}

/** Round-9 web-text front-of-pipeline operators: HTML boilerplate
  * removal, sentence segmentation, encoding-damage scoring, and the
  * sharded-JSONL training-data export exercised as a full write →
  * read-back → audit round trip. All four carry full DuckDB oracles —
  * the HTML/sentence/encoding transforms are RE2-subset regex and
  * literal-replace chains that the oracle reproduces verbatim, and the
  * export oracle predicts the round-tripped corpus from the source
  * parquet (so any JSON-escaping loss, shard misassignment, or dropped
  * row hash-mismatches).
  */
object WebTextQueries {

  private def round(c: org.apache.spark.sql.Column, scale: Int) =
    graft.ops.Numeric.roundAway(c, scale)

  /** Deterministic page synthesis shared by q154's two sides: wrap each
    * document in realistic chrome (title, style, script with a tag-like
    * string literal, nav, comment, footer, entities). The fixture corpus
    * has no raw HTML, so both engines derive the page from `text` the
    * same way; the graded behavior is the EXTRACTION.
    */
  private[queries] val pagePrefix =
    "<html><head><title>Doc "
  private[queries] val pageMid =
    "</title><style>p{margin:0}</style>" +
      "<script>var t=\"<p>not text</p>\";</script></head>" +
      "<body><nav>home | about | <b>search</b></nav><!-- begin -->" +
      "<p>"
  private[queries] val pageSuffix =
    "</p><div>&quot;quoted&quot; &amp;amp; tail</div>" +
      "<footer>&#39;footer&#39; boilerplate</footer></body></html>"

  /** The q164 crawl-to-corpus CTE chain (page synthesis -> html clean ->
    * quality gate -> per-sentence first-occurrence ranks), shared with
    * the q186 trainer-feed composite so the two oracles can never
    * drift: q164 finishes it with a per-doc digest, q186 continues the
    * chain into dedup -> mix -> pack -> shard. Ends at `rr`
    * (doc_id, sent_idx, sentence, rn). */
  private[queries] val curationCtes: String = s"""pg AS (
                SELECT doc_id,
                       '$pagePrefix' || CAST(doc_id AS VARCHAR) ||
                       '${pageMid.replace("'", "''")}' || text ||
                       '${pageSuffix.replace("'", "''")}' AS h
                FROM documents),
              a AS (SELECT doc_id,
                      regexp_replace(h, '(?s)<!--.*?-->', ' ', 'g') AS h
                    FROM pg),
              b AS (SELECT doc_id,
                      regexp_replace(regexp_replace(regexp_replace(
                      regexp_replace(regexp_replace(regexp_replace(
                      regexp_replace(h,
                        '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g'),
                        '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g'),
                        '(?is)<nav\\b[^>]*>.*?</nav\\s*>', ' ', 'g'),
                        '(?is)<header\\b[^>]*>.*?</header\\s*>', ' ', 'g'),
                        '(?is)<footer\\b[^>]*>.*?</footer\\s*>', ' ', 'g'),
                        '(?is)<aside\\b[^>]*>.*?</aside\\s*>', ' ', 'g'),
                        '(?is)<noscript\\b[^>]*>.*?</noscript\\s*>', ' ', 'g')
                        AS h
                    FROM a),
              c AS (SELECT doc_id,
                      regexp_replace(h, '(?s)<[^>]*>', ' ', 'g') AS h
                    FROM b),
              d AS (SELECT doc_id,
                      replace(replace(replace(replace(replace(replace(h,
                        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                        '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS h
                    FROM c),
              e AS (SELECT doc_id,
                      trim(regexp_replace(h, '[ \t\n\r]+', ' ', 'g')) AS h
                    FROM d),
              f AS (SELECT doc_id, h,
                      regexp_split_to_array(trim(lower(h)), '\\s+') AS toks,
                      len(regexp_split_to_array(trim(h), '\\s+')) AS n,
                      length(h) AS nc,
                      length(regexp_replace(h, '[^A-Za-z0-9 ]', '', 'g'))
                        AS nstrip
                    FROM e),
              r AS (SELECT doc_id, h,
                      CASE WHEN len(toks) > 0
                           THEN CAST(len(list_filter(toks, t ->
                                  list_contains(['the', 'a', 'of', 'and',
                                    'to', 'in', 'is'], t))) AS DOUBLE)
                                / len(toks)
                           ELSE 0.0 END AS stop_ratio,
                      CASE WHEN nc > 0
                           THEN CAST(nc - nstrip AS DOUBLE) / nc
                           ELSE 0.0 END AS punct_ratio,
                      CAST(n AS DOUBLE) AS nd
                    FROM f),
              g AS (SELECT doc_id, h FROM r
                    WHERE round(greatest(0.0, least(1.0,
                            least(nd / 20.0, 1.0) * 0.4
                            + least(stop_ratio * 5.0, 1.0) * 0.4
                            + (1.0 - punct_ratio) * 0.2)), 6) >= 0.5),
              sp AS (SELECT doc_id,
                       [trim(x) FOR x IN regexp_extract_all(h,
                          '[^.!?]+[.!?]+|[^.!?]+$$')
                         IF trim(x) <> ''] AS ss
                     FROM g),
              u AS (SELECT doc_id,
                       CAST(generate_subscripts(ss, 1) - 1 AS INTEGER)
                         AS sent_idx,
                       unnest(ss) AS sentence
                     FROM sp),
              rr AS (SELECT doc_id, sent_idx, sentence,
                       row_number() OVER (PARTITION BY sentence
                                          ORDER BY doc_id, sent_idx) AS rn
                     FROM u)"""

  val qs: Seq[Q] = Seq(

    // ---- HTML -> visible text (boilerplate removal) ----
    Q("q154_html_extract",
      (s, dir) => {
        val html = concat(lit(pagePrefix), col("doc_id").cast("string"),
          lit(pageMid), col("text"), lit(pageSuffix))
        val clean = WT.htmlToText(html)
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), length(clean).as("n_chars_clean"),
            md5(clean).as("clean_md5"))
      },
      Some(s"""WITH pg AS (
                SELECT doc_id,
                       '$pagePrefix' || CAST(doc_id AS VARCHAR) ||
                       '${pageMid.replace("'", "''")}' || text ||
                       '${pageSuffix.replace("'", "''")}' AS h
                FROM documents),
              a AS (SELECT doc_id,
                      regexp_replace(h, '(?s)<!--.*?-->', ' ', 'g') AS h
                    FROM pg),
              b AS (SELECT doc_id,
                      regexp_replace(regexp_replace(regexp_replace(
                      regexp_replace(regexp_replace(regexp_replace(
                      regexp_replace(h,
                        '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g'),
                        '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g'),
                        '(?is)<nav\\b[^>]*>.*?</nav\\s*>', ' ', 'g'),
                        '(?is)<header\\b[^>]*>.*?</header\\s*>', ' ', 'g'),
                        '(?is)<footer\\b[^>]*>.*?</footer\\s*>', ' ', 'g'),
                        '(?is)<aside\\b[^>]*>.*?</aside\\s*>', ' ', 'g'),
                        '(?is)<noscript\\b[^>]*>.*?</noscript\\s*>', ' ', 'g')
                        AS h
                    FROM a),
              c AS (SELECT doc_id,
                      regexp_replace(h, '(?s)<[^>]*>', ' ', 'g') AS h
                    FROM b),
              d AS (SELECT doc_id,
                      replace(replace(replace(replace(replace(replace(h,
                        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                        '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS h
                    FROM c),
              e AS (SELECT doc_id,
                      trim(regexp_replace(h, '[ \t\n\r]+', ' ', 'g')) AS h
                    FROM d)
              SELECT doc_id, CAST(length(h) AS INTEGER) AS n_chars_clean,
                     md5(h) AS clean_md5
              FROM e"""),
    ),

    // ---- rule-based sentence segmentation (exploded, per-sentence) ----
    Q("q155_sentences",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(WT.sentenceSplit(col("text")))
              .as(Seq("sent_idx", "sentence")))
          .select(col("doc_id"), col("sent_idx"),
            length(col("sentence")).as("n_chars"),
            md5(col("sentence")).as("sent_md5"))
      },
      Some("""WITH sp AS (
                SELECT doc_id,
                       [trim(x) FOR x IN
                         regexp_extract_all(text, '[^.!?]+[.!?]+|[^.!?]+$')
                         IF trim(x) <> ''] AS ss
                FROM documents),
              u AS (
                SELECT doc_id,
                       CAST(generate_subscripts(ss, 1) - 1 AS INTEGER)
                         AS sent_idx,
                       unnest(ss) AS sentence
                FROM sp)
              SELECT doc_id, sent_idx,
                     CAST(length(sentence) AS INTEGER) AS n_chars,
                     md5(sentence) AS sent_md5
              FROM u"""),
    ),

    // ---- encoding-damage (mojibake) scoring; corpus corrupted
    //      deterministically by doc_id so both engines score the same
    //      damaged text (the fixture corpus itself is clean) ----
    Q("q156_encoding_qa",
      (s, dir) => {
        val moji = lit("Ã©") // e-acute mis-decode digraph
        val tail = lit(" �â€™") // U+FFFD + quote trigraph
        val m = when(col("doc_id") % 7 === 0,
            replace(col("text"), lit("e"), moji))
          .when(col("doc_id") % 11 === 0, concat(col("text"), tail))
          .otherwise(col("text"))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), WT.mojibakeCount(m).as("moji_n"),
            WT.nonAsciiCount(m).as("non_ascii"),
            round(WT.asciiRatio(m), 6).as("ascii_ratio"),
            (WT.mojibakeCount(m) > 0).as("damaged"))
      },
      Some("""WITH m AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0
                              THEN replace(text, 'e', 'Ã©')
                            WHEN doc_id % 11 = 0
                              THEN text || ' �â€™'
                            ELSE text END AS t
                FROM documents),
              c AS (
                SELECT doc_id, t,
                  CAST((length(t) - length(replace(t, 'Ã©', ''))) // 2
                     + (length(t) - length(replace(t, 'Ã¨', ''))) // 2
                     + (length(t) - length(replace(t, 'Ã±', ''))) // 2
                     + (length(t) - length(replace(t, 'â€™', ''))) // 3
                     + (length(t) - length(replace(t, 'â€œ', ''))) // 3
                     + (length(t) - length(replace(t, '�', '')))
                     AS BIGINT) AS moji_n,
                  CAST(length(t) -
                       length(regexp_replace(t, '[^\x00-\x7f]', '', 'g'))
                     AS BIGINT) AS non_ascii
                FROM m)
              SELECT doc_id, moji_n, non_ascii,
                     CASE WHEN length(t) = 0 THEN 1.0
                          ELSE round((length(t) - non_ascii) /
                                     CAST(length(t) AS DOUBLE), 6)
                     END AS ascii_ratio,
                     moji_n > 0 AS damaged
              FROM c"""),
    ),

    // ---- corpus-wide sentence dedup (CCNet-style boilerplate kill):
    //      first occurrence of each distinct sentence wins, documents
    //      reassembled from their kept sentences in original order ----
    Q("q163_sentence_dedup",
      (s, dir) => WT.sentenceDedup(
        Tables.load(s, dir, "documents"), "text", "doc_id"),
      Some("""WITH sp AS (
                SELECT doc_id,
                       [trim(x) FOR x IN
                         regexp_extract_all(text, '[^.!?]+[.!?]+|[^.!?]+$')
                         IF trim(x) <> ''] AS ss
                FROM documents),
              u AS (
                SELECT doc_id,
                       CAST(generate_subscripts(ss, 1) - 1 AS INTEGER)
                         AS sent_idx,
                       unnest(ss) AS sentence
                FROM sp),
              r AS (
                SELECT doc_id, sent_idx, sentence,
                       row_number() OVER (PARTITION BY sentence
                                          ORDER BY doc_id, sent_idx) AS rn
                FROM u)
              SELECT doc_id, count(*) AS n_sents,
                     CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept,
                     md5(coalesce(string_agg(
                           CASE WHEN rn = 1 THEN sentence END,
                           ' ' ORDER BY sent_idx), ''))
                       AS clean_md5
              FROM r GROUP BY doc_id"""),
    ),

    // ---- the composite curation pipeline, end to end under ONE hash
    //      oracle: synthesize chrome-wrapped pages -> htmlToText ->
    //      quality gate on the CLEANED text (q31's scoring formula,
    //      rounded before comparison so the gate can't flip on a
    //      sub-6-dp float wobble) -> corpus-wide sentence dedup over
    //      the surviving docs. Each stage is independently oracled
    //      (q154/q31/q163); this query grades their COMPOSITION — the
    //      shape a real crawl-to-corpus run has. ----
    Q("q164_curation_pipeline",
      (s, dir) => {
        val stop = Seq("the", "a", "of", "and", "to", "in", "is")
        val html = concat(lit(pagePrefix), col("doc_id").cast("string"),
          lit(pageMid), col("text"), lit(pageSuffix))
        val cleaned = Tables.load(s, dir, "documents")
          .select(col("doc_id"), WT.htmlToText(html).as("clean"))
        val gated = cleaned.where(
          round(TA.qualityScore(col("clean"), stop), 6) >= 0.5)
        WT.sentenceDedup(gated, "clean", "doc_id")
      },
      Some(s"""WITH $curationCtes
              SELECT doc_id, count(*) AS n_sents,
                     CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept,
                     md5(coalesce(string_agg(
                           CASE WHEN rn = 1 THEN sentence END,
                           ' ' ORDER BY sent_idx), ''))
                       AS clean_md5
              FROM rr GROUP BY doc_id"""),
    ),

    // ---- sharded JSONL export: write -> read-back -> per-shard audit.
    //      The oracle predicts the audit from the SOURCE parquet, so a
    //      lossy JSON escape, a dropped row, or a shard misassignment
    //      hash-mismatches. content_md5 folds per-row hashes in their
    //      own sorted order (engine-portable: no row-order assumption
    //      survives a distributed write). ----
    Q("q157_jsonl_roundtrip",
      (s, dir) => {
        val tmp = graft.core.Scratch.dir("q157_jsonl_roundtrip")
        val ex = new Export(s, tmp)
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            (col("doc_id") % 8).as("shard"))
        ex.writeJsonlShards(docs, "docs", "shard")
        val schema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("text", StringType),
          StructField("shard", LongType)))
        val rowH = md5(concat(col("doc_id").cast("string"),
          lit(":"), col("text")))
        ex.readJsonlShards("docs", schema)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("sum_chars"),
            md5(array_join(array_sort(collect_list(rowH)), ""))
              .as("content_md5"))
      },
      Some("""SELECT doc_id % 8 AS shard,
                     count(*) AS n_docs,
                     CAST(sum(length(text)) AS BIGINT) AS sum_chars,
                     md5(string_agg(md5(CAST(doc_id AS VARCHAR) || ':' || text),
                         '' ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || text)))
                       AS content_md5
              FROM documents GROUP BY 1"""),
    ),

    // ---- Unicode NFC normalization (native codegen expression —
    //      Spark has no built-in): doc_id%3 rows get a DECOMPOSED
    //      suffix (e+U+0301, A+U+030A, o+U+0308 — composes, 3 chars
    //      shorter), doc_id%5 rows an already-COMPOSED one (NFC
    //      identity, changed=false), the rest stay ASCII (fast path
    //      returns the input UTF8String untouched). The md5 of the
    //      normalized text pins byte-exact agreement with DuckDB's
    //      nfc_normalize ----
    Q("q183_nfc_normalize",
      (s, dir) => {
        val dec = lit(" cafe\u0301 A\u030Angstro\u0308m")
        val comp = lit(" caf\u00e9")
        val t = when(col("doc_id") % 3 === 0, concat(col("text"), dec))
          .when(col("doc_id") % 5 === 0, concat(col("text"), comp))
          .otherwise(col("text"))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), t.as("__t"))
          .select(col("doc_id"), col("__t"),
            WT.nfcNormalize(col("__t")).as("__n"))
          .select(col("doc_id"),
            length(col("__t")).as("n_chars_raw"),
            length(col("__n")).as("n_chars_nfc"),
            (col("__n") =!= col("__t")).as("changed"),
            md5(col("__n")).as("nfc_md5"))
      },
      Some("""WITH m AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0
                              THEN text || ' cafe' || chr(769) || ' A'
                                   || chr(778) || 'ngstro' || chr(776) || 'm'
                            WHEN doc_id % 5 = 0
                              THEN text || ' caf' || chr(233)
                            ELSE text END AS t
                FROM documents),
              n AS (SELECT doc_id, t, nfc_normalize(t) AS nf FROM m)
              SELECT doc_id,
                     CAST(length(t) AS INTEGER) AS n_chars_raw,
                     CAST(length(nf) AS INTEGER) AS n_chars_nfc,
                     nf <> t AS changed,
                     md5(nf) AS nfc_md5
              FROM n""")),

    // ---- hard-wrap repair (the pdftotext artifact): the corpus is
    //      deterministically re-wrapped — every "xxx yyy" 3-letter word
    //      boundary becomes a hyphen + line break, and doc_id%5 docs
    //      get sentence-level paragraph breaks — then repaired:
    //      dehyphenate (lowercase continuations only) + reflow (single
    //      breaks → spaces, blank-line runs → one paragraph break).
    //      Both transforms are RE2-portable regex chains the oracle
    //      replays verbatim; md5 pins the repaired bytes ----
    Q("q185_line_repair",
      (s, dir) => {
        val base = when(col("doc_id") % 5 === 0,
          replace(col("text"), lit(". "), lit(".\n\n")))
          .otherwise(col("text"))
        val wrapped =
          regexp_replace(base, "([a-z]{3}) ([a-z]{3})", "$1-\n$2")
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), wrapped.as("__w"))
          .select(col("doc_id"),
            (length(col("__w")) -
              length(replace(col("__w"), lit("\n"), lit("")))).as("n_breaks"),
            WT.reflowLines(WT.dehyphenate(col("__w"))).as("__r"))
          .select(col("doc_id"), col("n_breaks"),
            length(col("__r")).as("n_chars_repaired"),
            md5(col("__r")).as("repaired_md5"))
      },
      Some("""WITH b AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0
                            THEN replace(text, '. ',
                                         '.' || chr(10) || chr(10))
                            ELSE text END AS t
                FROM documents),
              w AS (
                SELECT doc_id,
                       regexp_replace(t, '([a-z]{3}) ([a-z]{3})',
                         '\1-' || chr(10) || '\2', 'g') AS w
                FROM b),
              dh AS (
                SELECT doc_id, w,
                       regexp_replace(w,
                         '([A-Za-z])-[ \t]*\n[ \t]*([a-z])', '\1\2', 'g')
                         AS d
                FROM w),
              rf AS (
                SELECT doc_id, w,
                       replace(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(d, '[ \t]*\n[ \t]*', chr(10), 'g'),
                             '\n\n+', chr(1), 'g'),
                           '\n', ' ', 'g'),
                         chr(1), chr(10) || chr(10)) AS r
                FROM dh)
              SELECT doc_id,
                     CAST(length(w) - length(replace(w, chr(10), ''))
                          AS INTEGER) AS n_breaks,
                     CAST(length(r) AS INTEGER) AS n_chars_repaired,
                     md5(r) AS repaired_md5
              FROM rf""")),
  )
}
