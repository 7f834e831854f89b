package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, Membership, TextAnalysis => TA}

/** Training-data text operators over the `documents` table. */
object TextQueries {

  /** DuckDB-parity double rounding (see graft.ops.Numeric.roundAway). */
  private def round(c: org.apache.spark.sql.Column, scale: Int) =
    graft.ops.Numeric.roundAway(c, scale)

  private val stop = Seq("the", "a", "of", "and", "to", "in", "is")
  private val stopSqlList = stop.map(w => s"'$w'").mkString("[", ", ", "]")

  /** q36's oracle, generated: per-token md5-derived 64-bit hash split
    * into 32-bit halves (BIGINT-safe), 64 ±1 vote sums, signed
    * fingerprint assembly with bit 63 as the negative weight —
    * validated bit-for-bit against the Spark side (PLANS.md round-10).
    */
  private val simhashOracle: String = {
    val bitSums = (0 until 64).map { b =>
      val bit = if (b < 32) s"(lo >> $b) & 1" else s"(hi >> ${b - 32}) & 1"
      s"sum(CASE WHEN (($bit)) = 1 THEN 1 ELSE -1 END) AS b$b"
    }.mkString(",\n                ")
    val fp = (0 until 63).map { b =>
      s"CASE WHEN b$b > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE 0 END"
    }.mkString("\n                + ") +
      "\n                + CASE WHEN b63 > 0 THEN -9223372036854775807 - 1 ELSE 0 END"
    s"""WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
          FROM documents WHERE text IS NOT NULL),
        h AS (
          SELECT doc_id,
                 CAST(CAST(('0x' || substr(md5(t), 1, 8)) AS UBIGINT) AS BIGINT) AS hi,
                 CAST(CAST(('0x' || substr(md5(t), 9, 8)) AS UBIGINT) AS BIGINT) AS lo
          FROM tok),
        s AS (
          SELECT doc_id, $bitSums
          FROM h GROUP BY doc_id)
        SELECT doc_id, $fp AS simhash FROM s
        UNION ALL
        -- Spark's explode_outer keeps a NULL-text doc as one null-token
        -- row whose 64 votes all fall to the -1 branch => fingerprint 0;
        -- unnest(NULL) would drop the doc instead, so emit the 0 branch
        -- explicitly (review finding, round-10)
        SELECT doc_id, 0 AS simhash FROM documents WHERE text IS NULL"""
  }

  /** q150's oracle, generated: 16 minhash families over char 3-gram
    * shingles in the portable Carter-Wegman family (one md5 per
    * shingle, slot k = (h1 + k*h2) mod 2^48 — always positive, so
    * signed and unsigned min orders agree across engines; round-11
    * switched the family from 16 independent md5s, which cost 16x the
    * hashing for no extra LSH power).
    *
    * Caveat (shared with q34, whose oracle pairs the same shingle
    * machinery with DuckDB substr): CharNgramsExpr windows UTF-16 code
    * units while DuckDB's substr windows code points, so the equality
    * holds for BMP text — the fixture contract (ASCII documents)
    * guarantees it; a non-BMP corpus would need a code-point shingler
    * on the Spark side first.
    */
  private val minhashSigOracle: String = {
    val cols = (0 until 16).map { k =>
      f"CAST(min((h1 + $k%d * h2) & 281474976710655) AS BIGINT) AS mh$k%02d"
    }.mkString(",\n               ")
    s"""WITH g AS (
          SELECT doc_id, substr(text, CAST(i.i AS INTEGER), 3) AS sh
          FROM documents, LATERAL (
            SELECT unnest(generate_series(1, length(text) - 2)) AS i) i
          WHERE length(text) >= 3),
        h AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(sh), 1, 12)) AS UBIGINT) AS h1,
                 CAST(('0x' || substr(md5(sh), 13, 12)) AS UBIGINT) | 1 AS h2
          FROM g)
        SELECT doc_id,
               $cols
        FROM h GROUP BY doc_id"""
  }

  /** q35's full-decision oracle, generated: the portable Carter-Wegman
    * minhash family (one md5 per shingle, slot k = (h1 + k*h2) mod 2^48;
    * 8 bands whose keys are the LITERAL 4-slot values) replayed end to
    * end — band buckets → per-band min-id →
    * 3 smallest distinct lower-id candidates per doc → exact distinct
    * char-3-gram Jaccard at 0.5 (int/int division, bit-identical across
    * engines) → smallest passing rep → one pointer-doubling propagation
    * round (`propagationRounds = 2`). Tiered-verify equivalence: Spark
    * only escalates past candidate 1 on failure, but the min-passing
    * candidate is the same as verify-all-upfront, and `bestj` is only
    * read when NO candidate passed — where both sides saw every pair.
    */
  /** Shared fragments of the portable-minhash oracles (q35, q149): the
    * 32 Carter-Wegman slot mins from one md5 per shingle, and the 8
    * four-slot literal band keys — the exact family
    * graft.expressions.PortableMinHashSigExpr computes.
    */
  private[queries] def minhashSlotMins: String = (0 until 32).map { k =>
    f"CAST(min((h1 + $k%d * h2) & 281474976710655) AS BIGINT) AS mh$k%02d"
  }.mkString(",\n               ")

  private[queries] def minhashBandSelects(from: String = "sig"): String =
    (0 until 8).map { b =>
      val slots = (0 until 4).map(r => f"mh${b * 4 + r}%02d").mkString(", ")
      s"SELECT doc_id, concat_ws(',', '$b', $slots) AS key FROM $from"
    }.mkString("\n             UNION ALL ")

  private val minhashDedupOracle: String = {
    val mins = minhashSlotMins
    val bandSelects = minhashBandSelects()
    s"""WITH g AS (
          SELECT doc_id, substr(text, CAST(i.i AS INTEGER), 3) AS sh
          FROM documents, LATERAL (
            SELECT unnest(generate_series(1, length(text) - 2)) AS i) i
          WHERE length(text) >= 3),
        h AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(sh), 1, 12)) AS UBIGINT) AS h1,
                 CAST(('0x' || substr(md5(sh), 13, 12)) AS UBIGINT) | 1 AS h2
          FROM g),
        sig AS (
          SELECT doc_id,
               $mins
          FROM h GROUP BY doc_id),
        bands AS (
             $bandSelects),
        bandmin AS (SELECT key, min(doc_id) AS bmin FROM bands GROUP BY 1),
        cand0 AS (
          SELECT b.doc_id, m.bmin
          FROM bands b JOIN bandmin m USING (key)
          WHERE m.bmin < b.doc_id),
        cands AS (
          SELECT doc_id, list_sort(list_distinct(list(bmin)))[1:3] AS cl
          FROM cand0 GROUP BY 1),
        shs AS (SELECT doc_id, list_distinct(list(sh)) AS s FROM g GROUP BY 1),
        pairs AS (SELECT doc_id, unnest(cl) AS rep FROM cands),
        verified AS (
          SELECT p.doc_id, p.rep,
                 CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.s, b.s))) AS j
          FROM pairs p
          JOIN shs a ON a.doc_id = p.doc_id
          JOIN shs b ON b.doc_id = p.rep),
        best AS (
          SELECT doc_id,
                 min(rep) FILTER (WHERE j >= 0.5) AS prep,
                 min_by(j, rep) FILTER (WHERE j >= 0.5) AS pj,
                 max(j) AS bestj
          FROM verified GROUP BY 1),
        direct AS (
          SELECT d.doc_id,
                 COALESCE(b.prep, d.doc_id) AS rep_id,
                 COALESCE(b.pj, b.bestj) AS jaccard,
                 b.prep IS NOT NULL AS is_dup
          FROM documents d LEFT JOIN best b USING (doc_id))
        SELECT d.doc_id, least(d.rep_id, r.rep_id) AS rep_id,
               round(d.jaccard, 6) AS jaccard, d.is_dup
        FROM direct d JOIN direct r ON d.rep_id = r.doc_id"""
  }

  /** q149's oracle, generated: the portable band family over the
    * doc_id < 600 slice, the cap's bucket census (keys kept at
    * count ≤ 1000 — the cap is REPLAYED, not assumed away), the
    * distinct ordered candidate pair set, and exact shingle-set Jaccard
    * at 0.6. A capped-out bucket, a candidate leak across buckets, or a
    * Jaccard divergence all hash-mismatch.
    */
  private val minhashCappedOracle: String = {
    val mins = minhashSlotMins
    val bandSelects = minhashBandSelects()
    s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 600),
        g AS (
          SELECT doc_id, substr(text, CAST(i.i AS INTEGER), 3) AS sh
          FROM d, LATERAL (
            SELECT unnest(generate_series(1, length(text) - 2)) AS i) i
          WHERE length(text) >= 3),
        h AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(sh), 1, 12)) AS UBIGINT) AS h1,
                 CAST(('0x' || substr(md5(sh), 13, 12)) AS UBIGINT) | 1 AS h2
          FROM g),
        sig AS (
          SELECT doc_id,
               $mins
          FROM h GROUP BY doc_id),
        bands AS (
             $bandSelects),
        kept AS (SELECT key FROM bands GROUP BY key HAVING count(*) <= 1000),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a
          JOIN kept k ON k.key = a.key
          JOIN bands b ON b.key = a.key AND a.doc_id < b.doc_id),
        shs AS (SELECT doc_id, list_distinct(list(sh)) AS s FROM g GROUP BY 1),
        v AS (
          SELECT c.id_a, c.id_b,
                 CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.s, b.s))) AS j
          FROM cand c
          JOIN shs a ON a.doc_id = c.id_a
          JOIN shs b ON b.doc_id = c.id_b)
        SELECT id_a, id_b, round(j, 6) AS jaccard
        FROM v WHERE j >= 0.6"""
  }

  /** q184's oracle, generated: the q149 portable band family (cap
    * replayed) gives the candidate set, an exhaustive shingle-Jaccard
    * pass over the same slice gives ground truth, and the single output
    * row recomputes every count and both ppm quotients — a missed
    * band, a leaked candidate, or an exact-Jaccard divergence all move
    * an integer and hash-mismatch.
    */
  private val minhashRecallOracle: String = {
    val mins = minhashSlotMins
    val bandSelects = minhashBandSelects()
    s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        g AS (
          SELECT doc_id, substr(text, CAST(i.i AS INTEGER), 3) AS sh
          FROM d, LATERAL (
            SELECT unnest(generate_series(1, length(text) - 2)) AS i) i
          WHERE length(text) >= 3),
        h AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(sh), 1, 12)) AS UBIGINT) AS h1,
                 CAST(('0x' || substr(md5(sh), 13, 12)) AS UBIGINT) | 1 AS h2
          FROM g),
        sig AS (
          SELECT doc_id,
               $mins
          FROM h GROUP BY doc_id),
        bands AS (
             $bandSelects),
        kept AS (SELECT key FROM bands GROUP BY key HAVING count(*) <= 1000),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a
          JOIN kept k ON k.key = a.key
          JOIN bands b ON b.key = a.key AND a.doc_id < b.doc_id),
        shs AS (SELECT doc_id, list_distinct(list(sh)) AS s FROM g GROUP BY 1),
        ex AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM shs a JOIN shs b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.6),
        hit AS (SELECT ex.id_a FROM ex
                JOIN cand c ON ex.id_a = c.id_a AND ex.id_b = c.id_b),
        n AS (SELECT
                (SELECT count(*) FROM ex) AS n_exact,
                (SELECT count(*) FROM cand) AS n_candidates,
                (SELECT count(*) FROM hit) AS n_hit)
        SELECT CAST(n_exact AS BIGINT) AS n_exact,
               CAST(n_candidates AS BIGINT) AS n_candidates,
               CAST(n_hit AS BIGINT) AS n_hit,
               CASE WHEN n_exact > 0
                    THEN CAST(n_hit * 1000000 // n_exact AS BIGINT) END
                 AS recall_ppm,
               CASE WHEN n_candidates > 0
                    THEN CAST(n_hit * 1000000 // n_candidates AS BIGINT) END
                 AS candidate_precision_ppm
        FROM n"""
  }

  val qs: Seq[Q] = Seq(

    // ---- token counting (whitespace) + char stats ----
    Q("q30_token_stats",
      (s, dir) => {
        Tables.load(s, dir, "documents").select(col("doc_id"),
          TA.tokenCount(col("text")).as("n_tokens"),
          length(col("text")).as("n_chars_text"),
          round(length(col("text")).cast("double") /
            TA.tokenCount(col("text")).cast("double"), 6).as("chars_per_token"))
      },
      Some("""SELECT doc_id,
                CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens,
                CAST(length(text) AS INTEGER) AS n_chars_text,
                round(length(text) / len(regexp_split_to_array(trim(text), '\s+')), 6)
                  AS chars_per_token
              FROM documents""")),

    // ---- quality scoring: length / stopword / punctuation recipe ----
    Q("q31_quality_score",
      (s, dir) => {
        // ONE TextStatsExpr instance feeds all three signals (round 17):
        // the per-function route planned an independent punct regexp pass
        // plus duplicate stats trees the conditional-rounding CASE hid
        // from subexpression elimination — same values by TextStatsSpec
        // parity (punct_ratio is the identical quotient), one compiled
        // pass per row instead of three
        val st = graft.expressions.TextStatsExprs.stats(col("text"), stop)
        Tables.load(s, dir, "documents").select(col("doc_id"),
          round(st.getField("stop_ratio"), 6).as("stop_ratio"),
          round(st.getField("punct_ratio"), 6).as("punct_ratio"),
          round(st.getField("quality"), 6).as("quality"))
      },
      Some(s"""WITH f AS (
               |  SELECT doc_id,
               |    regexp_split_to_array(trim(lower(text)), '\\s+') AS toks,
               |    len(regexp_split_to_array(trim(text), '\\s+')) AS n,
               |    length(text) AS nc,
               |    length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS nstrip
               |  FROM documents),
               |r AS (
               |  SELECT doc_id,
               |    CASE WHEN len(toks) > 0
               |         THEN CAST(len(list_filter(toks, t -> list_contains($stopSqlList, t))) AS DOUBLE) / len(toks)
               |         ELSE 0.0 END AS stop_ratio,
               |    CASE WHEN nc > 0 THEN CAST(nc - nstrip AS DOUBLE) / nc ELSE 0.0 END AS punct_ratio,
               |    CAST(n AS DOUBLE) AS nd
               |  FROM f)
               |SELECT doc_id, round(stop_ratio, 6) AS stop_ratio,
               |  round(punct_ratio, 6) AS punct_ratio,
               |  round(greatest(0.0, least(1.0,
               |    least(nd / 20.0, 1.0) * 0.4
               |    + least(stop_ratio * 5.0, 1.0) * 0.4
               |    + (1.0 - punct_ratio) * 0.2)), 6) AS quality
               |FROM r""".stripMargin)),

    // ---- language-ID n-gram/marker heuristic ----
    Q("q32_langid",
      (s, dir) => {
        Tables.load(s, dir, "documents").select(col("doc_id"), col("lang"),
          TA.langId(col("text")).as("pred_lang"))
      },
      Some {
        val markers = TA.defaultMarkers
        val scoreCols = markers.map { case (l, ws) =>
          val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
          s"len(list_filter(toks, t -> list_contains($lst, t))) AS s_$l"
        }.mkString(",\n    ")
        val best = markers.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
        val cases = markers.map { case (l, _) =>
          s"WHEN s_$l > 0 AND s_$l = $best THEN '$l'"
        }.mkString("\n    ")
        s"""WITH f AS (
           |  SELECT doc_id, lang,
           |    regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
           |  FROM documents),
           |sc AS (SELECT doc_id, lang,
           |    $scoreCols
           |  FROM f)
           |SELECT doc_id, lang,
           |  CASE $cases ELSE 'und' END AS pred_lang
           |FROM sc""".stripMargin
      }),

    // ---- exact dedup groups ----
    Q("q33_dedup_exact",
      (s, dir) => {
        Dedup.exactGroups(Tables.load(s, dir, "documents"), "text", "doc_id")
          .select(col("text"), col("keep_id"), col("n_dups"))
      },
      Some("""SELECT text, CAST(min(doc_id) AS BIGINT) AS keep_id,
                     count(*) AS n_dups
              FROM documents GROUP BY text""")),

    // ---- exact n-gram Jaccard over adjacent-id pairs ----
    Q("q34_ngram_jaccard",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), TA.charNgrams(col("text"), 3).as("sh"))
        val a = d.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
        val b = d.select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"),
          col("sh").as("sh_b"))
        a.join(b, Seq("id_a"))
          .select(col("id_a"), col("id_b"),
            round(TA.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      },
      Some("""WITH sh AS (
               SELECT doc_id,
                 list_distinct([substr(text, CAST(i AS INTEGER), 3)
                   FOR i IN generate_series(1, greatest(length(text) - 2, 0))]) AS s
               FROM documents)
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                round(CASE WHEN len(a.s) + len(b.s)
                              - len(list_filter(a.s, x -> list_contains(b.s, x))) > 0
                      THEN CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
                           / (len(a.s) + len(b.s)
                              - len(list_filter(a.s, x -> list_contains(b.s, x))))
                      ELSE 1.0 END, 6) AS jaccard
              FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""")),

    // ---- MinHash-LSH near-dup dedup decisions UNDER THE HASH ORACLE
    //      (round-11: the portable md5 family now covers the WHOLE
    //      decision leg, not just q150's signature math — band keys are
    //      literal slot values, so the oracle replays banding → min-id
    //      candidates → tiered verify → propagation from scratch).
    //      Linear output by design: all-pairs at threshold 0.5 is ~2M
    //      rows on the templated sf0.1 corpus (quadratic in cluster
    //      size) — a 100 TB pipeline emits one decision per doc. ----
    Q("q35_minhash_neardups",
      (s, dir) => {
        Dedup.minhashDedup(Tables.load(s, dir, "documents"),
          "text", "doc_id", shingleN = 3, numHashes = 32, bands = 8,
          threshold = 0.5, portable = true)
          .select(col("doc_id"), col("rep_id"), round(col("jaccard"), 6).as("jaccard"),
            col("is_dup"))
      },
      Some(minhashDedupOracle)),

    // ---- the all-pairs MinHash variant with its bucket cap ARMED — the
    //      pattern users should copy (mirror of q144's armed block cap):
    //      a generous-by-measurement cap (max fixture bucket is 246 at
    //      sf0.1 on this slice, 210 at sf0.01 — see PLANS.md) keeps the
    //      result bit-identical to uncapped here, while a degenerate
    //      boilerplate bucket at scale is dropped-and-reported instead
    //      of going quadratic. r11: the portable md5 band family puts
    //      the WHOLE pipeline — banding, the cap's bucket census, the
    //      distinct pair set, exact Jaccard — under the hash oracle;
    //      q147 stays the audit leg asserting zero drops ----
    Q("q149_minhash_capped",
      (s, dir) => {
        // doc_id < 600: covers the whole sf0.01 correctness corpus (500
        // docs) while keeping the sf0.1 bench row's all-pairs output
        // bounded (bucket pair volume grows ~quadratically in slice size)
        Dedup.minhashNearDups(
          Tables.load(s, dir, "documents").where(col("doc_id") < 600),
          "text", "doc_id", shingleN = 3, numHashes = 32, bands = 8,
          threshold = 0.6, maxBucketSize = 1000L, portable = true)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      },
      Some(minhashCappedOracle)),

    // ---- candidate-generation recall of the q149 band family against
    //      exhaustive ground truth on the same audit slice: the recall
    //      floor as an ORACLED MEASUREMENT (n_exact / n_candidates /
    //      n_hit + ppm recall and candidate precision), not a spec
    //      assertion. Exact side is all-pairs BY DESIGN on the bounded
    //      slice — the thresholdCalibration contract ----
    Q("q184_lsh_recall",
      (s, dir) => Dedup.minhashRecallAudit(
        Tables.load(s, dir, "documents").where(col("doc_id") < 300),
        "text", "doc_id", shingleN = 3, numHashes = 32, bands = 8,
        threshold = 0.6, maxBucketSize = 1000L, portable = true),
      Some(minhashRecallOracle)),

    // ---- the audit leg of q149's armed bucket cap: LSH band keys whose
    //      buckets exceed the cap (dropped whole from the self-join).
    //      Runs the SAME portable band family as q149 (an audit over the
    //      other family would report on buckets the dedup never saw).
    //      The ASSERTION — the cap dropped NOTHING on this corpus, so
    //      q149 is bit-identical to its uncapped form — is exactly
    //      "this result is empty", which the oracle states directly.
    //      Non-empty at scale names the degenerate buckets and their
    //      sizes: scrub the boilerplate, don't raise the cap ----
    Q("q147_minhash_audit",
      (s, dir) => Dedup.minhashDroppedBuckets(
        Tables.load(s, dir, "documents").where(col("doc_id") < 600),
        "text", "doc_id", shingleN = 3, numHashes = 32, bands = 8,
        maxBucketSize = 1000L, portable = true),
      Some("""SELECT CAST(NULL AS VARCHAR) AS band, CAST(NULL AS BIGINT) AS n_rows
              WHERE 1 = 0""")),

    // ---- SimHash fingerprints UNDER THE HASH ORACLE (round-10): the
    //      portable md5-derived token-hash family lets DuckDB recompute
    //      the identical ±1 bit votes and fingerprint assembly — a
    //      sign-bit error, a vote-tie mishandling, or a token-split
    //      divergence all hash-mismatch. The XXH64-native family stays
    //      available (portable = false) for hot paths ----
    Q("q36_simhash",
      (s, dir) => {
        Dedup.simhash(Tables.load(s, dir, "documents"), "text", "doc_id",
          portable = true)
      },
      Some(simhashOracle)),

    // ---- order-sensitive rolling fingerprint UNDER THE HASH ORACLE
    //      (round-10): the same (acc<<5) ^ (acc>>59) ^ h(t) fold with
    //      portable token hashes; the oracle emulates Java's wrapping
    //      shifts and arithmetic >> in UBIGINT space, so every bit of
    //      every fingerprint is independently recomputed ----
    Q("q37_fingerprint",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), TA.portableFingerprint(col("text")).as("fp"))
      },
      Some("""WITH tok AS (
                SELECT doc_id,
                       list_transform(regexp_split_to_array(trim(text), '\s+'),
                         t -> CAST(('0x' || substr(md5(t), 1, 16)) AS UBIGINT)) AS hs
                FROM documents)
              SELECT doc_id,
                CASE WHEN u >= CAST(9223372036854775808 AS UBIGINT)
                     THEN CAST(u - CAST(9223372036854775808 AS UBIGINT) AS BIGINT)
                          - 9223372036854775807 - 1
                     ELSE CAST(u AS BIGINT) END AS fp
              FROM (
                SELECT doc_id,
                  list_reduce(list_prepend(CAST(0 AS UBIGINT), hs),
                    (acc, h) -> xor(xor(
                        (acc % CAST(576460752303423488 AS UBIGINT)) * CAST(32 AS UBIGINT),
                        CASE WHEN acc >= CAST(9223372036854775808 AS UBIGINT)
                             THEN xor(acc >> 59, CAST(18446744073709551584 AS UBIGINT))
                             ELSE acc >> 59 END),
                      h)) AS u
                FROM tok) f""")),

    // ---- the q35 signature leg UNDER THE HASH ORACLE (round-10, fills
    //      the q150 numbering gap; round-11: same Carter-Wegman family
    //      q35's full decision leg now runs — one md5 per shingle, 16
    //      pairwise-independent slots from its two 48-bit halves). The
    //      oracle recomputes every signature slot from scratch ----
    Q("q150_minhash_signature",
      (s, dir) => {
        val sig = Tables.load(s, dir, "documents")
          .where(length(col("text")) >= 3)
          .select(col("doc_id"),
            graft.expressions.MinHashExprs.portableMinhashSig(
              TA.charNgrams(col("text"), 3), 16).as("__sig"))
        sig.select(col("doc_id") +: (0 until 16).map(k =>
          element_at(col("__sig"), k + 1).as(f"mh$k%02d")): _*)
      },
      Some(minhashSigOracle)),

    // ---- exact token frequencies: the heavy-hitter ground truth
    //      (explode + groupBy — the full-shuffle baseline) ----
    Q("q46_token_freq",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(explode(TA.tokens(lower(col("text")))).as("token"))
          .where(length(col("token")) > 0)
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .where(col("n") >= 100)
      },
      Some("""SELECT token, count(*) AS n
              FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
                    FROM documents)
              WHERE length(token) > 0
              GROUP BY token HAVING count(*) >= 100""")),

    // ---- SpaceSaving heavy-hitters sketch: bounded-state top-k, one
    //      small summary per partition instead of a full shuffle
    //      (custom typed Aggregator; rows-only — approximate) ----
    Q("q47_heavy_hitters",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("lang"), explode(TA.tokens(lower(col("text")))).as("token"))
          .groupBy(col("lang"))
          .agg(graft.ops.HeavyHitters.topK(32)(col("token")).as("top"))
          .select(col("lang"), explode(col("top")).as("hh"))
          .select(col("lang"), col("hh._1").as("token"),
            col("hh._2").as("est_count"), col("hh._3").as("max_err"))
      },
      None),

    // ---- q47's EXACT TWIN (the q40→q41 anchoring pattern for the
    //      sketch family): per-lang exact top-32 tokens via the full
    //      groupBy + window rank — the ground truth SpaceSaving
    //      approximates, hash-oracled. Deterministic tie-break
    //      (count desc, token asc) so ranks are engine-portable ----
    Q("q189_heavy_hitters_exact",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        Tables.load(s, dir, "documents")
          .select(col("lang"), explode(TA.tokens(lower(col("text")))).as("token"))
          .where(length(col("token")) > 0)
          .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("n"))
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("lang")).orderBy(col("n").desc, col("token"))))
          .where(col("rank") <= 32)
      },
      Some("""WITH t AS (
                SELECT lang, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
                FROM documents),
              c AS (SELECT lang, token, count(*) AS n FROM t
                    WHERE length(token) > 0 GROUP BY 1, 2),
              r AS (SELECT lang, token, n,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY n DESC, token) AS rank
                    FROM c)
              SELECT lang, token, n, CAST(rank AS INTEGER) AS rank
              FROM r WHERE rank <= 32""")),

    // ---- q47's CONTRACT under the driver gate (the q166 empty-audit
    //      pattern): every SpaceSaving guarantee checked against the
    //      exact counts on the SAME token stream q47 consumes —
    //      (a) bounds: true ≤ est ∧ est − err ≤ true for every
    //      reported token; (b) coverage: any token with true count
    //      > N/capacity must appear in the summary (Metwally et al.
    //      2005, both preserved under summary merge). Violations is
    //      the output; the oracle asserts EMPTY, so a sketch
    //      regression hash-mismatches at the driver instead of hiding
    //      behind a rows-only row ----
    Q("q190_hh_guarantee_audit",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("lang"), explode(TA.tokens(lower(col("text")))).as("token"))
          .transform(graft.core.Checkpoints.sessionCk) // 3 consumers: sketch, exact, totals
        val exact = toks.groupBy(col("lang"), col("token"))
          .agg(count(lit(1)).as("n_true"))
        val totals = toks.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
        val hh = toks.groupBy(col("lang"))
          .agg(graft.ops.HeavyHitters.topK(32)(col("token")).as("top"))
          .select(col("lang"), explode(col("top")).as("hh"))
          .select(col("lang"), col("hh._1").as("token"),
            col("hh._2").as("est"), col("hh._3").as("err"))
        val bounds = hh.join(exact, Seq("lang", "token"), "left")
          .withColumn("n_true", coalesce(col("n_true"), lit(0L)))
          .where(col("est") < col("n_true") ||
            col("est") - col("err") > col("n_true"))
          .select(col("lang"), col("token"), lit("bound").as("violation"))
        val coverage = exact.join(totals, "lang")
          .where(col("n_true") * 32 > col("n_total"))
          .join(hh.select(col("lang"), col("token")),
            Seq("lang", "token"), "left_anti")
          .select(col("lang"), col("token"), lit("coverage").as("violation"))
        bounds.unionByName(coverage)
      },
      Some("""SELECT CAST(NULL AS VARCHAR) AS lang,
                     CAST(NULL AS VARCHAR) AS token,
                     CAST(NULL AS VARCHAR) AS violation
              WHERE 1 = 0""")),

    // ---- PII redaction. The synthetic corpus carries no PII, so both
    //      sides seed identical deterministic PII (same concat, same
    //      modular gates) and the gate compares the SCRUBBED text plus
    //      per-pattern counts — regex semantics must agree between Java
    //      regex and RE2 for the hash to match ----
    Q("q39_pii_scrub",
      (s, dir) => {
        val seeded = Tables.load(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 2 === 0,
              concat(lit(" mail user"), col("doc_id"), lit("@test.org")))
              .otherwise(lit("")),
            when(col("doc_id") % 3 === 0,
              concat(lit(" from 192.168."), col("doc_id") % 200, lit(".9")))
              .otherwise(lit("")),
            when(col("doc_id") % 5 === 0,
              concat(lit(" call 555-014-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
              .otherwise(lit(""))).as("seeded"))
        seeded.select(col("doc_id"),
          TA.piiScrub(col("seeded")).as("scrubbed"),
          TA.piiCount(col("seeded"), TA.emailRe).as("n_email"),
          TA.piiCount(col("seeded"), TA.ipv4Re).as("n_ip"),
          TA.piiCount(col("seeded"), TA.phoneRe).as("n_phone"))
      },
      Some("""WITH seeded AS (
                SELECT doc_id, text
                  || CASE WHEN doc_id % 2 = 0
                       THEN ' mail user' || doc_id || '@test.org' ELSE '' END
                  || CASE WHEN doc_id % 3 = 0
                       THEN ' from 192.168.' || (doc_id % 200) || '.9' ELSE '' END
                  || CASE WHEN doc_id % 5 = 0
                       THEN ' call 555-014-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END AS seeded
                FROM documents)
              SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(seeded,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                  '\+?\d{3}[- ]\d{3}[- ]\d{4}', '<PHONE>', 'g') AS scrubbed,
                CAST(len(regexp_extract_all(seeded,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                CAST(len(regexp_extract_all(seeded,
                  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
                CAST(len(regexp_extract_all(seeded,
                  '\+?\d{3}[- ]\d{3}[- ]\d{4}')) AS BIGINT) AS n_phone
              FROM seeded""")),

    // ---- benchmark contamination: docs sharing ≥ minHits distinct
    //      char 12-grams with the "benchmark" slice (doc_id < 20) ----
    Q("q48_contamination",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        TA.contamination(d.where(col("doc_id") >= 20), d.where(col("doc_id") < 20),
          "text", "doc_id", n = 12, minHits = 30L)
      },
      Some("""WITH sh AS (
                SELECT doc_id,
                  list_distinct([substr(text, CAST(i AS INTEGER), 12)
                    FOR i IN generate_series(1, greatest(length(text) - 11, 0))]) AS s
                FROM documents),
              bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 20),
              docg AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id >= 20)
              SELECT d.doc_id, count(DISTINCT d.g) AS n_hits
              FROM docg d JOIN bench b ON d.g = b.g
              GROUP BY d.doc_id
              HAVING count(DISTINCT d.g) >= 30""")),

    // ---- span-level decontamination (q48's transform counterpart):
    //      excise word 8-grams appearing verbatim in the benchmark
    //      slice (doc_id < 20), reassemble survivors in order; only
    //      (doc, start) hit pairs ever shuffle ----
    Q("q112_decontaminate",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        TA.decontaminate(d.where(col("doc_id") >= 20), d.where(col("doc_id") < 20),
          "text", "doc_id", n = 8)
      },
      Some("""WITH w AS (SELECT doc_id,
                     regexp_split_to_array(trim(text), '\s+') AS ws
                   FROM documents),
              g AS (SELECT doc_id, CAST(i.i AS INTEGER) AS s,
                       array_to_string(
                         ws[CAST(i.i AS INTEGER):CAST(i.i + 7 AS INTEGER)],
                         ' ') AS gram
                    FROM w, LATERAL (SELECT unnest(generate_series(1,
                        greatest(len(ws) - 7, 0))) AS i) i),
              bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20),
              hits AS (SELECT g.doc_id, g.s FROM g JOIN bench USING (gram)
                       WHERE g.doc_id >= 20),
              bad AS (SELECT doc_id, list(DISTINCT s) AS ss,
                             CAST(count(DISTINCT s) AS BIGINT) AS n_spans
                      FROM hits GROUP BY 1)
              SELECT w.doc_id, COALESCE(b.n_spans, 0) AS n_spans,
                     CAST(len([w.ws[CAST(p AS INTEGER)]
                          FOR p IN generate_series(1, len(w.ws))
                          IF len(list_filter(COALESCE(b.ss, []),
                               s -> s <= p AND p < s + 8)) = 0]) AS BIGINT)
                       AS n_tokens_kept,
                     md5(COALESCE(array_to_string([w.ws[CAST(p AS INTEGER)]
                          FOR p IN generate_series(1, len(w.ws))
                          IF len(list_filter(COALESCE(b.ss, []),
                               s -> s <= p AND p < s + 8)) = 0], ' '), ''))
                       AS clean_md5
              FROM w LEFT JOIN bad b USING (doc_id)
              WHERE w.doc_id >= 20""")),

    // ---- overlapping chunk windows (training-sample prep) ----
    Q("q49_chunking",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(TA.chunks(col("text"), size = 256, stride = 192))
              .as(Seq("chunk_idx", "chunk")))
          .select(col("doc_id"), col("chunk_idx"),
            length(col("chunk")).as("n_chars"), md5(col("chunk")).as("chunk_md5"))
      },
      Some("""WITH c AS (
                SELECT doc_id,
                  [substr(text, CAST(s AS INTEGER), 256)
                    FOR s IN generate_series(1, greatest(length(text), 1), 192)] AS chunks
                FROM documents),
              u AS (
                SELECT doc_id,
                  CAST(generate_subscripts(chunks, 1) - 1 AS INTEGER) AS chunk_idx,
                  unnest(chunks) AS chunk
                FROM c)
              SELECT doc_id, chunk_idx, CAST(length(chunk) AS INTEGER) AS n_chars,
                     md5(chunk) AS chunk_md5
              FROM u""")),

    // ---- deterministic engine-portable train/val split (md5 bucket,
    //      stable under re-runs, resharding, and engine migration) ----
    Q("q53_train_split",
      (s, dir) => {
        val b = TA.hashBucket(col("text"), "split1")
        Tables.load(s, dir, "documents").select(col("doc_id"), b.as("bucket"),
          when(b < 90, "train").otherwise("val").as("split"))
      },
      Some("""SELECT doc_id,
                CAST(CAST(('0x' || substr(md5(text || 'split1'), 1, 8)) AS UBIGINT)
                     % 100 AS BIGINT) AS bucket,
                CASE WHEN CAST(('0x' || substr(md5(text || 'split1'), 1, 8)) AS UBIGINT)
                          % 100 < 90
                     THEN 'train' ELSE 'val' END AS split
              FROM documents""")),

    // ---- within-doc n-gram repetition (C4/Gopher boilerplate signal) ----
    Q("q54_repetition",
      (s, dir) => {
        Tables.load(s, dir, "documents").select(col("doc_id"),
          round(TA.repetition(col("text"), 8), 6).as("rep_frac"))
      },
      Some("""SELECT doc_id,
                round(CASE WHEN length(text) - 7 <= 0 THEN 0.0
                  ELSE 1.0 - CAST(len(list_distinct(
                         [substr(text, CAST(i AS INTEGER), 8)
                          FOR i IN generate_series(1, greatest(length(text) - 7, 0))]))
                       AS DOUBLE) / (length(text) - 7) END, 6) AS rep_frac
              FROM documents""")),

    // ---- top-k characteristic terms per doc: tf-idf shape with a
    //      RATIONAL idf (tf·(N+1)/(df+1), no log) so the score is exact
    //      integer arithmetic until one final IEEE division — log()'s
    //      last-ulp behavior differs between libm builds and would
    //      poison a cross-engine hash ----
    // ---- per-GROUP characteristic terms (c-TF-IDF, the BERTopic
    //      cluster-labeling step): q56's per-doc scorer lifted to
    //      groups — term share within the group × rational
    //      inverse-group-frequency, DECIMAL(38,0) exact, top-5 per
    //      group. The per-group window shuffles only the (group, term)
    //      count table, never tokens ----
    Q("q121_group_terms",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val toks = d.select(col("lang"),
          explode(TA.tokens(lower(col("text")))).as("term"))
          .where(length(col("term")) > 0)
        val tf = toks.groupBy(col("lang"), col("term"))
          .agg(count(lit(1)).as("tf"))
          .transform(graft.core.Checkpoints.sessionCk) // feeds totals, group-df, AND the score
        val tot = tf.groupBy(col("lang")).agg(sum(col("tf")).as("tot"))
        val gdf = tf.groupBy(col("term")).agg(count(lit(1)).as("gdf"))
        val ng = tf.select(col("lang")).distinct()
          .agg(count(lit(1)).as("ng"))
        val scored = tf.join(tot, Seq("lang")).join(gdf, Seq("term"))
          .crossJoin(broadcast(ng))
          .select(col("lang"), col("term"), col("tf"),
            expr("""CAST(tf AS DECIMAL(38,0)) * (ng + 1) * 1000000
                    div (CAST(tot AS DECIMAL(38,0)) * (gdf + 1))""")
              .as("score_ppm"))
        scored.withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
              .orderBy(col("score_ppm").desc, col("term").asc)))
          .where(col("rank") <= 5)
          .select(col("lang"), col("rank"), col("term"), col("tf"),
            col("score_ppm"))
      },
      Some("""WITH toks AS (
                SELECT lang, unnest(regexp_split_to_array(trim(lower(text)),
                         '\s+')) AS term
                FROM documents),
              tf AS (
                SELECT lang, term, CAST(count(*) AS BIGINT) AS tf
                FROM toks WHERE length(term) > 0 GROUP BY 1, 2),
              tot AS (SELECT lang, CAST(sum(tf) AS BIGINT) AS tot
                      FROM tf GROUP BY 1),
              gdf AS (SELECT term, CAST(count(*) AS BIGINT) AS gdf
                      FROM tf GROUP BY 1),
              ng AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS ng FROM tf),
              scored AS (
                SELECT tf.lang, tf.term, tf.tf,
                       CAST(CAST(tf.tf AS HUGEINT) * (ng.ng + 1) * 1000000
                            // (CAST(tot.tot AS HUGEINT) * (gdf.gdf + 1))
                         AS BIGINT) AS score_ppm
                FROM tf JOIN tot USING (lang) JOIN gdf USING (term), ng),
              ranked AS (
                SELECT lang, term, tf, score_ppm,
                       row_number() OVER (PARTITION BY lang
                         ORDER BY score_ppm DESC, term ASC) AS rank
                FROM scored)
              SELECT lang, CAST(rank AS INTEGER) AS rank, term, tf, score_ppm
              FROM ranked WHERE rank <= 5""")),

    Q("q56_tfidf_topterms",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val toks = d.select(col("doc_id"),
          explode(TA.tokens(lower(col("text")))).as("term"))
        val tf = toks.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = d.agg(count(lit(1)).as("n"))
        val scored = tf.join(broadcast(dfreq), Seq("term")).crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"),
            (col("tf").cast("double") * (col("n") + 1) / (col("df") + 1)).as("score"))
        scored
          .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))))
          .where(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("term"),
            round(col("score"), 6).as("score"))
      },
      Some("""WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
                FROM documents),
              tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
              dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
              n AS (SELECT count(*) AS n FROM documents),
              scored AS (
                SELECT tf.doc_id, tf.term,
                       CAST(tf.tf AS DOUBLE) * (n.n + 1) / (dfreq.df + 1) AS score
                FROM tf JOIN dfreq USING (term), n),
              ranked AS (
                SELECT doc_id, term, score,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, term) AS rank
                FROM scored)
              SELECT doc_id, CAST(rank AS INTEGER) AS rank, term,
                     round(score, 6) AS score
              FROM ranked WHERE rank <= 3""")),

    // ---- EXACT similarity join via prefix filtering — same answer as
    //      the quadratic definition (which IS the oracle, on a 300-doc
    //      slice so the O(n²) oracle stays tractable; the Spark side
    //      never builds the cross product at any n) ----
    Q("q59_similarity_join",
      (s, dir) => {
        // 3-gram shingles at t=0.7: the corpus's near-dup tail clears
        // the bar at every sf (4-gram jaccard tops out below 0.5 at
        // sf0.1, which would make the query vacuous there). Both
        // vocabulary-contract enforcements are armed: the default
        // saturation guard (this slice's candidate volume is ~0.8M,
        // far under the 150M budget), and a generous posting cap —
        // bit-identical here (posting lists are bounded by the 300-doc
        // slice, so 2000 never trips; q148 is the audit leg asserting
        // nothing was dropped) while a saturated corpus at scale gets
        // drop-and-report instead of a silent cliff ----
        Dedup.similarityJoinPrefix(
          Tables.load(s, dir, "documents").where(col("doc_id") < 300),
          "text", "doc_id", shingleN = 3, threshold = 0.7,
          maxPostings = 2000L)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
              sh AS (
                SELECT doc_id,
                  list_distinct([substr(text, CAST(i AS INTEGER), 3)
                    FOR i IN generate_series(1, greatest(length(text) - 2, 0))]) AS s
                FROM d),
              pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  len(list_filter(a.s, x -> list_contains(b.s, x))) AS inter,
                  len(a.s) + len(b.s)
                    - len(list_filter(a.s, x -> list_contains(b.s, x))) AS uni
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
              SELECT id_a, id_b,
                     round(CAST(inter AS DOUBLE) / uni, 6) AS jaccard
              FROM pairs
              WHERE uni > 0 AND CAST(inter AS DOUBLE) / uni >= 0.7""")),

    // ---- the audit leg of q59's armed posting-list cap: shingle tokens
    //      whose global posting lists exceed the cap (excluded from
    //      candidate generation). Empty here — the oracled assertion
    //      that q59's cap dropped NOTHING, so its result is
    //      bit-identical to the uncapped form; non-empty at scale means
    //      "the vocabulary is saturating: raise shingleN / use word
    //      shingles", with the offending tokens and counts in hand ----
    Q("q148_similarity_audit",
      (s, dir) => Dedup.similarityJoinDroppedTokens(
        Tables.load(s, dir, "documents").where(col("doc_id") < 300),
        "text", shingleN = 3, maxPostings = 2000L),
      Some("""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
              sh AS (
                SELECT doc_id,
                  unnest(list_distinct([substr(text, CAST(i AS INTEGER), 3)
                    FOR i IN generate_series(1, greatest(length(text) - 2, 0))])) AS token
                FROM d)
              SELECT token, count(*) AS n_postings
              FROM sh GROUP BY token HAVING count(*) > 2000""")),

    // ---- deflate compression ratio (engine-internal codec → rows-only) ----
    Q("q55_compression_ratio",
      (s, dir) => {
        Tables.load(s, dir, "documents").select(col("doc_id"),
          round(TA.compressionRatio(col("text")), 6).as("compress_ratio"),
          (TA.compressionRatio(col("text")) < 0.35).as("boilerplate_flag"))
      },
      None),

    // ---- q55's CONTRACT under the driver gate (the q166 empty-audit
    //      pattern; q54's dup-gram fraction is the oracled portable
    //      compressibility sibling): raw deflate's worst case is the
    //      stored-block path — ≤ 5 overhead bytes per 64 KiB block —
    //      so every ratio must sit in (0, 1 + 16/octet_len]. The
    //      output is the violating docs; the oracle asserts EMPTY, so
    //      a codec-plumbing regression (truncated buffers, wrong
    //      level, charset drift) flips the driver gate red instead of
    //      hiding behind q55's rows-only row ----
    Q("q194_compress_bounds_audit",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            TA.compressionRatio(col("text")).as("compress_ratio"),
            octet_length(col("text")).as("n_bytes"))
          .where(col("n_bytes") > 0 &&
            (col("compress_ratio") <= 0 ||
             col("compress_ratio") > lit(1.0) + lit(16.0) / col("n_bytes")))
      },
      Some("""SELECT CAST(NULL AS BIGINT) AS doc_id,
                     CAST(NULL AS DOUBLE) AS compress_ratio,
                     CAST(NULL AS INTEGER) AS n_bytes
              WHERE 1 = 0""")),

    // ---- passage-level exact dedup (sub-document boilerplate) ----
    Q("q70_passage_dedup",
      (s, dir) => {
        Dedup.passageDupStats(Tables.load(s, dir, "documents"),
          "text", "doc_id", words = 10)
      },
      Some("""WITH w AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                FROM documents),
              p AS (
                SELECT doc_id,
                       md5(array_to_string(ws[g.g*10+1 : g.g*10+10], ' ')) AS ph
                FROM w, LATERAL (
                  SELECT unnest(generate_series(0, len(ws)//10 - 1)) AS g) g
                WHERE len(ws) >= 10),
              f AS (SELECT ph, count(*) AS pf FROM p GROUP BY 1),
              d AS (
                SELECT p.doc_id, count(*) AS n_passages,
                       CAST(sum(CASE WHEN f.pf > 1 THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_dup_passages
                FROM p JOIN f USING (ph) GROUP BY 1)
              SELECT doc_id,
                     COALESCE(d.n_passages, 0) AS n_passages,
                     COALESCE(d.n_dup_passages, 0) AS n_dup_passages
              FROM documents LEFT JOIN d USING (doc_id)""")),

    // ---- cross-doc bigram novelty (curation-ordering signal): how much
    // of a doc's distinct-bigram vocabulary first appears in THIS doc
    // (corpus-wide min doc_id)? Shuffles carry (doc_id, md5) only.
    // r16 plan rework (was the largest non-exempt ×100 row at 80 s):
    // per-doc dedup moves INSIDE the row — array_distinct over the
    // hashed bigram array before the explode — which deletes the
    // corpus-wide distinct() shuffle of the widest intermediate
    // entirely (dedup by (doc_id, h) needs no cross-row data), and the
    // min-doc_id join collapses into an unbounded window aggregate, so
    // the full (doc_id, h) stream crosses the wire ONCE (by h) instead
    // of three times (distinct, groupBy h, join probe). Semantics are
    // bit-identical: dedup on the md5 value, exactly DISTINCT (doc_id,
    // md5(bg)) — the within-row array_distinct shrinks the explode, and
    // the dropDuplicates below closes the cross-row half (two documents
    // rows sharing a doc_id — r16 advice) for FREE: it sits after the
    // window, whose HashPartitioning(h) already satisfies the (doc_id,
    // h) clustering requirement, so no exchange is added (one in-place
    // hash-aggregate pass; first_doc is functionally dependent on h, so
    // the kept row's value is unaffected) ----
    Q("q76_ngram_novelty",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val bg = docs.select(col("doc_id"),
          explode(array_distinct(transform(TA.wordBigrams(col("text")),
            b => md5(b.cast("binary"))))).as("h"))
        val per = bg
          .withColumn("first_doc",
            min(col("doc_id")).over(Window.partitionBy(col("h"))))
          .dropDuplicates("doc_id", "h")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
              .as("n_novel"))
        docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      },
      Some("""WITH w AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                FROM documents),
              bg AS (
                SELECT DISTINCT doc_id,
                       md5(ws[i.i] || ' ' || ws[i.i+1]) AS h
                FROM w, LATERAL (
                  SELECT unnest(generate_series(1, len(ws) - 1)) AS i) i
                WHERE len(ws) >= 2),
              f AS (SELECT h, min(doc_id) AS first_doc FROM bg GROUP BY 1),
              per AS (
                SELECT bg.doc_id, count(*) AS n_bigrams,
                       CAST(sum(CASE WHEN f.first_doc = bg.doc_id
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
                FROM bg JOIN f USING (h) GROUP BY 1)
              SELECT doc_id,
                     COALESCE(per.n_bigrams, 0) AS n_bigrams,
                     COALESCE(per.n_novel, 0) AS n_novel
              FROM documents LEFT JOIN per USING (doc_id)""")),

    // ---- DSIR-style target-coverage importance score (hashable ints) ----
    Q("q72_importance_weights",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val toks = docs.select(col("doc_id"), col("lang"),
          explode(TA.tokens(col("text"))).as("tok"))
        val top = toks.where(col("lang") === "de")
          .groupBy(col("tok")).agg(count(lit(1)).as("f"))
          .withColumn("r", row_number().over(
            Window.orderBy(col("f").desc, col("tok").asc)))
          .where(col("r") <= 10).select(col("tok"))
        val scored = toks
          .join(broadcast(top.withColumn("hit", lit(1L))), Seq("tok"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(coalesce(col("hit"), lit(0L))).as("target_hits"))
        scored.select(col("doc_id"), col("n_tokens"), col("target_hits"),
          expr("target_hits * 1000000 div n_tokens").as("score_ppm"))
      },
      Some("""WITH toks AS (
                SELECT doc_id, lang,
                       unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                FROM documents),
              top AS (
                SELECT tok FROM (
                  SELECT tok, count(*) AS f FROM toks WHERE lang = 'de' GROUP BY 1)
                QUALIFY row_number() OVER (ORDER BY f DESC, tok ASC) <= 10),
              scored AS (
                SELECT doc_id, count(*) AS n_tokens,
                       CAST(sum(CASE WHEN tok IN (SELECT tok FROM top)
                                     THEN 1 ELSE 0 END) AS BIGINT) AS target_hits
                FROM toks GROUP BY 1)
              SELECT doc_id, n_tokens, target_hits,
                     target_hits * 1000000 // n_tokens AS score_ppm
              FROM scored""")),

    // ---- deterministic per-stratum sampling (portable md5 buckets) ----
    Q("q75_stratified_sample",
      (s, dir) => {
        val b = TA.hashBucket(col("text"), "strat")
        Tables.load(s, dir, "documents")
          .withColumn("bucket", b)
          .where(col("bucket") <
            when(col("lang") === "en", 10).otherwise(50))
          .select(col("doc_id"), col("lang"), col("bucket"))
      },
      Some("""SELECT doc_id, lang,
                CAST(CAST(('0x' || substr(md5(text || 'strat'), 1, 8)) AS UBIGINT)
                     % 100 AS BIGINT) AS bucket
              FROM documents
              WHERE CAST(CAST(('0x' || substr(md5(text || 'strat'), 1, 8)) AS UBIGINT)
                         % 100 AS BIGINT)
                    < CASE WHEN lang = 'en' THEN 10 ELSE 50 END""")),

    // ---- cross-corpus membership, EXACT path: "seen" = md5(text) hit
    // in the reference slice. Both sides reduce to 32-byte hashes
    // before the join shuffle — documents never move. ----
    Q("q77_cross_corpus_seen",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val ref = d.where(col("doc_id") % 5 === 0)
        Membership.markSeen(
          d.where(col("doc_id") % 5 =!= 0).select(col("doc_id"), md5(col("text")).as("k")),
          ref, col("k"), md5(col("text")), flag = "seen")
          .select(col("doc_id"), col("seen"))
      },
      Some("""WITH ref AS (
                SELECT DISTINCT md5(text) AS k FROM documents WHERE doc_id % 5 = 0)
              SELECT d.doc_id, (r.k IS NOT NULL) AS seen
              FROM documents d LEFT JOIN ref r ON md5(d.text) = r.k
              WHERE d.doc_id % 5 <> 0""")),

    // ---- cross-corpus membership, SKETCH path: Bloom filter built in
    // one distributed pass over the reference slice, probed map-side
    // (zero shuffle on the probe corpus). Engine-specific hash family →
    // rows-only; MembershipSpec pins no-false-negative vs q77. ----
    Q("q78_bloom_seen",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val ref = d.where(col("doc_id") % 5 === 0)
        val bloom = Membership.bloomOfKeys(
          ref, col("text"), expectedItems = math.max(ref.count(), 1L), fpp = 0.01)
        d.where(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"), Membership.seenBloom(col("text"), bloom).as("maybe_seen"))
      },
      None),

    // ---- q78's CONTRACT under the driver gate (the q166 empty-audit
    //      pattern; MembershipSpec pins the same law at spec level):
    //      a Bloom filter has NO false negatives, so every probe doc
    //      the exact path (q77) marks seen must read maybe_seen =
    //      true. The output is the false-negative set; the oracle
    //      asserts EMPTY — a hash family regression flips the driver
    //      gate red instead of hiding behind q78's rows-only row ----
    Q("q193_bloom_fn_audit",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val ref = d.where(col("doc_id") % 5 === 0)
        val bloom = Membership.bloomOfKeys(
          ref, col("text"), expectedItems = math.max(ref.count(), 1L), fpp = 0.01)
        Membership.markSeen(
          d.where(col("doc_id") % 5 =!= 0)
            .select(col("doc_id"), col("text"), md5(col("text")).as("k")),
          ref, col("k"), md5(col("text")), flag = "seen")
          .where(col("seen") &&
            !Membership.seenBloom(col("text"), bloom))
          .select(col("doc_id"))
      },
      Some("SELECT CAST(NULL AS BIGINT) AS doc_id WHERE 1 = 0")),

    // ---- multimodal: opaque binary column + typed metadata ----
    Q("q38_multimodal_binary",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .withColumn("payload", col("text").cast("binary"))
          .select(col("doc_id"),
            length(col("payload")).as("n_bytes"),
            sha2(col("payload"), 256).as("sha"))
      },
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
                     sha256(text) AS sha
              FROM documents"""))
  )
}
