package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram-Jaccard verification.
  *
  * Scale design: exact dedup is one hash-shuffle on the text hash (not
  * the text itself — 64-bit keys move, documents don't). MinHash-LSH
  * shuffles (band, bandHash) pairs — O(docs × bands) small rows — and
  * only candidate pairs ever co-locate two documents; nothing is
  * quadratic. SimHash is a single narrow projection.
  */
object Dedup {

  /** PPJoin positional-filter witness packing. The candidate groupBy
    * must carry the pair's first-common-token rank pair (hi, lo) — but
    * `min(struct(hi, lo))` has an immutable aggregation buffer and
    * plans as a SortAggregate, which sorts the ENTIRE pre-filter
    * candidate stream per partition (measured at ×100 as a task-memory
    * query-killer; commit 10ad36b). Packing both ranks into ONE long
    * keeps the aggregate a HashAggregate with map-side partial combine.
    *
    * Invariant (asserted here, relied on at every call site): both
    * ranks are `row_number`s over a single document's token list, so
    * they are ≥ 1 and far below 2³¹ — a document would need 2³¹
    * distinct shingles to overflow the packing. Because both are
    * non-negative and lo < 2³¹, the numeric order of
    * `hi·2³¹ + lo` IS the lexicographic order of (hi, lo).
    */
  private[ops] val RankPackWidth = 31
  private[ops] val RankPackModulus = 1L << RankPackWidth // 2^31

  /** Pack two row_number ranks (each < 2³¹) into one order-preserving long. */
  private[ops] def packRanks(hi: Column, lo: Column): Column =
    shiftleft(hi.cast("long"), RankPackWidth) + lo.cast("long")

  /** First component of a [[packRanks]] value. */
  private[ops] def packedHi(pk: Column): Column = shiftright(pk, RankPackWidth)

  /** Second component of a [[packRanks]] value. */
  private[ops] def packedLo(pk: Column): Column = pk % lit(RankPackModulus)

  /** Exact duplicate groups: one row per distinct text with the keeper
    * id (min) and the duplicate count. Grouping key is the TEXT itself,
    * not its hash: variable-length group KEYS hash-aggregate fine (only
    * aggregation BUFFERS must be mutable fixed-width types), whereas the
    * previous `groupBy(xxhash64(text)).agg(min(text))` put a string in
    * the buffer and planned as a keyed SortAggregate — a per-partition
    * sort of the whole corpus WITH text payloads (round-14 tripwire).
    * Wire cost is identical either way: partial aggregation collapses
    * duplicates map-side, and the text crossed the exchange once per
    * (distinct text, partition) in both shapes — as the min-buffer
    * before, as the key now. The 64-bit digest is derived on the
    * already-reduced output rows.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(xxhash64(col(textCol)).as("text_hash"), col("keep_id"),
        col("n_dups"), col(textCol))

  /** Keep one row per distinct `textCol` (the min-id row). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.join(df.groupBy(col(textCol)).agg(min(col(idCol)).as(idCol)),
      Seq(textCol, idCol), "left_semi")

  /** Canonical-selection dedup: cluster rows by `keyCol` and keep, per
    * cluster, the row that lexicographically maximizes `prefs` (ties
    * broken by the SMALLEST `idCol`) — curation's "keep the BEST
    * duplicate", vs [[exactDedup]]'s arbitrary keep-first. With
    * `prefs = Seq(quality)` the survivor is the highest-quality copy,
    * not whichever arrived first. `idCol` must be unique per row.
    *
    * Scale shape: a cascade of hash aggregates over the NARROW decision
    * columns (key, id, prefs), never the payload — per pref level, a
    * per-cluster max and a co-partitioned join keep only the rows still
    * tied for best (everything after the first exchange stays
    * partitioned by cluster key, so the cascade adds no exchanges and
    * AQE skew-splits a hot cluster at the joins); one final id-keyed
    * join hands the winning rows their payload, which crosses the wire
    * exactly once. The obvious one-pass alternative —
    * `max_by(struct(allCols), pref)` — puts a struct in the aggregation
    * buffer and plans as a keyed SortAggregate: a per-partition sort of
    * the whole corpus WITH payloads (round-14 tripwire; the task-memory
    * failure class of commit 10ad36b). That is also why `idCol` and
    * every pref must be of a mutable-buffer aggregate type (numeric /
    * boolean / date / timestamp), enforced here: a string pref would
    * silently re-plan the cascade's min/max as SortAggregates. Encode
    * string preferences ordinally first (e.g. a parsed timestamp, or
    * `conv(substring(md5(c), 1, 15), 16, 10)` for an arbitrary stable
    * tiebreak).
    */
  def canonicalPick(df: DataFrame, keyCol: Column, idCol: Column,
                    prefs: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.types._
    val d0 = df.select(keyCol.as("__ck") +: idCol.as("__cid") +:
      prefs.zipWithIndex.map { case (p, i) => p.as(s"__p$i") }: _*)
    d0.schema.fields.filter(_.name != "__ck").foreach { f =>
      require(f.dataType.isInstanceOf[NumericType] ||
          f.dataType.isInstanceOf[BooleanType] ||
          f.dataType.isInstanceOf[DateType] ||
          f.dataType.isInstanceOf[TimestampType] ||
          f.dataType.isInstanceOf[TimestampNTZType],
        s"canonicalPick: ${if (f.name == "__cid") "idCol" else "pref"} " +
          s"resolves to ${f.dataType.simpleString}, which cannot ride a " +
          "hash-aggregate buffer (the min/max would plan as a keyed " +
          "SortAggregate over the full corpus). Encode it ordinally " +
          "first — parse dates, or conv(substring(md5(c),1,15),16,10).")
    }
    val sizes = d0.groupBy(col("__ck")).agg(count(lit(1)).as("n_in_cluster"))
    val survivors = prefs.indices.foldLeft(d0) { (cur, i) =>
      val m = cur.groupBy(col("__ck")).agg(max(col(s"__p$i")).as("__m"))
      cur.join(m, Seq("__ck")).where(col(s"__p$i") <=> col("__m")).drop("__m")
    }
    val winners = survivors.groupBy(col("__ck")).agg(min(col("__cid")).as("__cid"))
      .join(sizes, Seq("__ck"))
      .select(col("__cid"), col("n_in_cluster"))
    df.join(winners, idCol === col("__cid")).drop("__cid")
  }

  /** MinHash signature: for each of `numHashes` hash families, the
    * minimum hash over the document's shingles. Native Catalyst
    * expression (graft.expressions.MinHashSigExpr) — one compiled pass
    * per row; the composable nested-transform formulation runs
    * interpreted and is ~100× slower on real corpora.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    graft.expressions.MinHashExprs.minhashSig(shingles, numHashes)

  /** LSH band keys from a signature: `bands` hashes of `rowsPerBand`
    * consecutive signature slots. Docs sharing any band key are
    * candidate near-duplicates.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    graft.expressions.MinHashExprs.bandKeys(signature, bands, rowsPerBand)

  /** The portable (md5-derived) minhash banding pipeline shared by
    * [[minhashDedup]] and [[minhashNearDups]]: one compiled pass per row
    * (graft.expressions.PortableMinHashSigExpr — slot k = min over
    * shingles of (h1 + k·h2) mod 2^48 from ONE md5 per shingle), band
    * keys as the LITERAL slot values (bucket equality is all LSH needs,
    * and literal values are what an external engine reproduces exactly).
    * Shingle-less docs are dropped: their all-NULL slot mins would alias
    * into one giant spurious bucket. It is deliberately NOT exposed as
    * an array-building Column helper: the composable
    * `array(transform(...))` formulation evaluates its lambdas
    * INTERPRETED — a round-11 ×100 board run spent 20+ minutes inside
    * ArrayTransform.eval before the shape was flattened to this
    * codegen'd form (the same trap the native minhashSignature scaladoc
    * documents).
    */
  private def portableBanded(sh: DataFrame, idCol: String,
                             numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandArr = array((0 until bands).map { b =>
      concat_ws(",", (lit(b.toString) +: (0 until rowsPerBand).map(r =>
        element_at(col("__sig"), b * rowsPerBand + r + 1).cast("string"))): _*)
    }: _*)
    sh.where(size(col("__sh")) > 0)
      .select(col(idCol),
        graft.expressions.MinHashExprs.portableMinhashSig(
          col("__sh"), numHashes).as("__sig"))
      .select(col(idCol), explode(bandArr).as("__band"))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → minhash → band →
    * bucket self-join → exact-Jaccard verification at `threshold`.
    * Returns candidate pairs (id_a < id_b) with their exact Jaccard.
    *
    * Shuffle discipline for 100 TB: the band self-join moves ONLY
    * (band, id) pairs — 16-byte rows — never shingle arrays; candidate
    * pairs are made distinct BEFORE verification so exact Jaccard runs
    * once per pair, not once per shared band; shingle sets are attached
    * to the (small) candidate set by two hash joins at the end. The
    * shingle frame is computed once and reused for both sides.
    *
    * `maxBucketSize` is the safety valve for a degenerate LSH bucket —
    * the same drop-and-report contract as [[fuzzyMatchPairs]]'s block
    * cap. Degenerate buckets are a measured real-corpus phenomenon, not
    * a hypothetical: when a min-hash slot is dominated by a shingle
    * common to much of the corpus (punctuation/digit shingles,
    * boilerplate templates), one band value can collect thousands of
    * docs (the ×5 scaling probe measured a 2,277-doc bucket against an
    * average of 7 — see PLANS.md), and the bucket self-join is quadratic
    * in bucket size. Buckets above the cap are dropped whole BEFORE the
    * self-join and enumerable via [[minhashDroppedBuckets]]; pairs that
    * also share a non-degenerate band still surface, which is exactly
    * the LSH recall contract (any one band hit suffices). The
    * registry's dedup path ([[minhashDedup]]) is immune by construction
    * — its per-band min-id candidate scheme is O(bucket), not
    * O(bucket²) — so the cap lives only on this all-pairs variant.
    */
  /** The banding → bucket-cap → bucket-self-join → distinct candidate
    * pipeline shared by [[minhashNearDups]] and [[minhashRecallAudit]]:
    * from a shingled frame (idCol, __sh) to ordered candidate id pairs.
    * The cap is band-keyed like the self-join, so it adds an agg but no
    * new partitioning, and is skipped entirely when uncapped.
    */
  private def bandedCandidatePairs(sh: DataFrame, idCol: String,
                                   numHashes: Int, bands: Int,
                                   maxBucketSize: Long,
                                   portable: Boolean): DataFrame = {
    val rowsPerBand = numHashes / bands
    val banded0 = if (portable) portableBanded(sh, idCol, numHashes, bands)
    else sh
      .select(col(idCol), explode(
        lshBandKeys(minhashSignature(col("__sh"), numHashes), bands, rowsPerBand))
        .as("__band"))
    val banded = if (maxBucketSize == Long.MaxValue) banded0 else banded0.join(
      banded0.groupBy(col("__band")).agg(count(lit(1)).as("__bn"))
        .where(col("__bn") <= maxBucketSize)
        .drop("__bn"),
      Seq("__band"))
    banded.select(col("__band"), col(idCol).as("id_a"))
      .join(banded.select(col("__band"), col(idCol).as("id_b")), Seq("__band"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Candidate-generation RECALL of the banded-LSH family, measured
    * against exhaustive ground truth — the audit that turns "the recall
    * floor is a spec assertion" into a number the oracle replays:
    * exact pairs = every pair at shingle-Jaccard ≥ `threshold` in the
    * audit slice, candidates = the banding's distinct pair set (cap
    * applied, exactly as [[minhashNearDups]] would see them), and one
    * row reports n_exact / n_candidates / n_hit with integer-ppm recall
    * (hits over exact) and candidate precision (hits over candidates —
    * how much verification work the bands waste).
    *
    * Ground truth comes from [[similarityJoinPrefix]] — the
    * recall-EXACT prefix-filter join — so the audit is NOT quadratic:
    * it costs one banding pass plus one PPJoin pass, both production
    * paths. (The DuckDB oracle replays the exact side as literal
    * all-pairs, which is the same set by the prefix principle — the
    * oracle checks semantics, not the algorithm.) Callers still pass a
    * bounded audit slice: the interesting number is the ratio, not a
    * corpus-wide census.
    */
  def minhashRecallAudit(df: DataFrame, textCol: String, idCol: String,
                         shingleN: Int = 3, numHashes: Int = 32,
                         bands: Int = 8, threshold: Double = 0.6,
                         maxBucketSize: Long = Long.MaxValue,
                         portable: Boolean = false): DataFrame = {
    val sh = df.select(col(idCol),
      TextAnalysis.charNgrams(col(textCol), shingleN).as("__sh"))
      .where(size(col("__sh")) > 0)
      .transform(graft.core.Checkpoints.sessionCk) // shingle once: banding + both exact sides
    val cand =
      bandedCandidatePairs(sh, idCol, numHashes, bands, maxBucketSize, portable)
    val exact = similarityJoinPrefix(df, textCol, idCol,
        shingleN = shingleN, threshold = threshold)
      .select(col("id_a"), col("id_b"))
    exact
      .join(cand.select(col("id_a"), col("id_b"), lit(1L).as("__c")),
        Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("__c")), lit(0L)).as("n_hit"))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .select(col("n_exact"), col("n_candidates"), col("n_hit"),
        when(col("n_exact") > 0, expr("n_hit * 1000000 div n_exact"))
          .as("recall_ppm"),
        when(col("n_candidates") > 0,
          expr("n_hit * 1000000 div n_candidates"))
          .as("candidate_precision_ppm"))
  }

  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      shingleN: Int = 3, numHashes: Int = 32,
                      bands: Int = 8, threshold: Double = 0.6,
                      maxBucketSize: Long = Long.MaxValue,
                      portable: Boolean = false): DataFrame = {
    require(maxBucketSize >= 2, s"maxBucketSize must be >= 2, got $maxBucketSize")
    val sh = df.select(col(idCol),
      TextAnalysis.charNgrams(col(textCol), shingleN).as("__sh"))
      .transform(graft.core.Checkpoints.sessionCk) // shingle once: banding + both verify sides
    // portable = true swaps the XXH64 band family for the md5-derived
    // one ([[portableBanded]]): candidates, cap behavior, and the exact
    // Jaccard verification all become externally replayable (the q149
    // hash oracle), at the cost of one extra (id, 32 longs) shuffle.
    val candidates =
      bandedCandidatePairs(sh, idCol, numHashes, bands, maxBucketSize, portable)
    candidates
      .join(sh.select(col(idCol).as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        TextAnalysis.jaccard(col("__sh_a"), col("__sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** The audit leg of [[minhashNearDups]]'s bucket cap: the LSH band
    * keys whose buckets exceeded `maxBucketSize` and were dropped whole,
    * with their row counts. Run with the same shingle/hash/band
    * arguments as the paired [[minhashNearDups]] call. A non-empty
    * result at a generous cap means the corpus has boilerplate mass
    * worth scrubbing before dedup, not that the cap should be raised.
    */
  def minhashDroppedBuckets(df: DataFrame, textCol: String, idCol: String,
                            shingleN: Int = 3, numHashes: Int = 32,
                            bands: Int = 8,
                            maxBucketSize: Long,
                            portable: Boolean = false): DataFrame = {
    // no default: a Long.MaxValue cap makes the filter unsatisfiable and
    // the audit a silent no-op that reads as "nothing dropped"
    require(maxBucketSize >= 2 && maxBucketSize < Long.MaxValue,
      s"maxBucketSize must be a real cap in [2, Long.MaxValue), got $maxBucketSize")
    val rowsPerBand = numHashes / bands
    val sh = df.select(col(idCol),
      TextAnalysis.charNgrams(col(textCol), shingleN).as("__sh"))
    // run with the same `portable` as the paired minhashNearDups call —
    // the two families bucket differently, so an audit over the wrong
    // one reports on buckets the dedup never saw
    val banded = if (portable) portableBanded(sh, idCol, numHashes, bands)
    else sh.select(col(idCol),
      explode(lshBandKeys(minhashSignature(col("__sh"), numHashes),
        bands, rowsPerBand)).as("__band"))
    banded.select(col("__band").as("band"))
      .groupBy(col("band")).agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > maxBucketSize)
  }

  /** EXACT set-similarity join via prefix filtering (the AllPairs/
    * PPJoin family): all pairs with shingle-Jaccard ≥ `threshold` —
    * the same answer as the quadratic all-pairs definition, found
    * without the cross product. Order every doc's shingles by ascending
    * global frequency (rarest first); a pair with Jaccard ≥ t must
    * share a token inside each side's first |s|−⌈t·|s|⌉+1 tokens, so
    * the candidate join fans out only on those rare prefix tokens. A
    * length filter (t·|a| ≤ |b| ≤ |a|/t) prunes size-mismatched
    * candidates before verification.
    *
    * Complements MinHash-LSH: exact recall (no banding misses) at the
    * cost of a frequency pass; prefer it when the threshold is high
    * (prefixes shrink as t grows). Shuffles carry (token, id) pairs and
    * (id_a, id_b) candidates — never documents; docs with empty shingle
    * sets (shorter than the shingle) emit no pairs by definition.
    *
    * VOCABULARY CONTRACT (measured, PLANS.md round-8 probe): prefix
    * filtering is only selective while the token vocabulary is large
    * relative to the corpus — "rarest tokens first" needs tokens that
    * are actually rare. Char 3-grams live in a ≤ ~19k-token universe,
    * so once the corpus saturates it every prefix token carries a huge
    * posting list and candidate generation degenerates toward Σ p²
    * (measured: 5,000 docs run in seconds at shingleN ≥ 5 but >100×
    * longer at shingleN = 3). At corpus scale use shingleN ≥ 5 (or
    * word-level shingles), or [[minhashDedup]] when the threshold is
    * loose enough for LSH.
    *
    * The contract is ENFORCED, not just documented, by two mechanisms
    * (round-9; calibration table in PLANS.md):
    *
    *  - '''Saturation guard''' (on by default): before returning, the
    *    operator computes the EXACT size of the candidate self-join's
    *    output, Σ over prefix tokens of (prefix-posting-list length)² —
    *    one tiny aggregate over the prefix table, which is
    *    localCheckpoint-materialized for the self-join anyway, so the
    *    eager driver action costs one small job that would have run
    *    moments later regardless (the same bounded-action pattern as
    *    [[graft.ops.Similarity]]'s centroid collects) — and
    *    raises a `SATURATED VOCABULARY` error with the remedies when it
    *    exceeds `maxCandidateVolume`, at CALL time, before any
    *    degenerate join streams. The default (150M) is calibrated
    *    against the round-8 probe: both measured ~8 s configurations
    *    (2,400 docs @ shingleN=3 → 52M; 5,000 docs @ shingleN=5 → 79M)
    *    clear it ~2×, the measured >300 s cliff (5,000 docs @
    *    shingleN=3 → 226M) trips it, and healthy corpora sit 3–4 orders
    *    of magnitude below. On a large cluster raise the budget
    *    deliberately — the point is that crossing the cliff is a
    *    decision, never a silent default. `Long.MaxValue` disarms.
    *
    *  - '''Posting-list cap''' (opt-in `maxPostings`): tokens whose
    *    GLOBAL posting list (number of docs containing the shingle)
    *    exceeds the cap are dropped from candidate generation — the
    *    same drop-and-report contract as [[fuzzyMatchPairs]]'s block
    *    cap and [[minhashNearDups]]'s bucket cap. Recall loss is
    *    exactly the pairs whose ONLY shared prefix token is that hot;
    *    dropped tokens are enumerable via
    *    [[similarityJoinDroppedTokens]] with the same arguments. The
    *    cap filter runs AFTER prefix ranking (membership in the prefix
    *    window is decided by the full global ordering first), so it
    *    never adds candidates, only removes them.
    */
  def similarityJoinPrefix(df: DataFrame, textCol: String, idCol: String,
                           shingleN: Int = 4, threshold: Double = 0.7,
                           maxPostings: Long = Long.MaxValue,
                           maxCandidateVolume: Long = 150000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The shingle table feeds three consumers (token explode + both sides
    // of the verification join) and the prefix table self-joins; without
    // materialization Catalyst clones the whole shingle→freq→window
    // pipeline per consumer (6 scans observed). At cluster scale this
    // intermediate would be written to durable storage; localCheckpoint is
    // the single-JVM equivalent (lazy: materializes on first use).
    val sh = df.select(col(idCol),
      TextAnalysis.charNgrams(col(textCol), shingleN).as("__sh"))
      .transform(graft.core.Checkpoints.sessionCk)
    val toks = sh.select(col(idCol), size(col("__sh")).as("__len"),
      explode(col("__sh")).as("__tok"))
    val freq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__freq"))
    require(maxPostings >= 1, s"maxPostings must be >= 1, got $maxPostings")
    val prefix0 = toks.join(freq, Seq("__tok"))
      .withColumn("__r", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("__freq").asc, col("__tok").asc)))
      // t*len can land epsilon above an integer in doubles (e.g. 0.7*10);
      // ceil would then over-shoot and shorten the prefix, dropping exact pairs
      .where(col("__r") <= col("__len") - ceil(lit(threshold) * col("__len") - lit(1e-9)) + 1)
      // cap AFTER ranking: prefix membership is decided by the full global
      // ordering, then hot tokens are removed — never adds candidates
      .where(col("__freq") <= maxPostings)
      .select(col("__tok"), col(idCol), col("__len"), col("__r"))
      .transform(graft.core.Checkpoints.sessionCk) // self-joined below: run freq+window once
    // Saturation guard: Σ pf² over prefix tokens IS the candidate-join
    // output size (pre length-filter). Checked EAGERLY at call time —
    // the prefix table just materialized for the self-join anyway, so
    // this is one small extra agg job, zero per-row plan cost, and the
    // failure arrives before any degenerate join streams.
    val prefix = prefix0
    if (maxCandidateVolume != Long.MaxValue) {
      val cost = prefix.groupBy(col("__tok")).agg(count(lit(1)).as("__pf"))
        .agg(coalesce(sum(col("__pf") * col("__pf")), lit(0L)))
        .head().getLong(0)
      require(cost <= maxCandidateVolume,
        s"similarityJoinPrefix: SATURATED VOCABULARY — estimated candidate " +
          s"volume $cost exceeds maxCandidateVolume=$maxCandidateVolume " +
          s"(shingleN=$shingleN). Remedies: raise shingleN (>=5) or use " +
          "word-level shingles; set maxPostings to drop-and-report hot " +
          "tokens (audit: similarityJoinDroppedTokens); use minhashDedup " +
          "if the threshold tolerates LSH; or raise maxCandidateVolume " +
          "deliberately for a larger cluster.")
    }
    // PPJoin positional filter (Xiao et al. 2008): the aggregation picks
    // each pair's FIRST common prefix token (min rank — sound because
    // both docs order tokens by one global (freq, tok) order, so an
    // earlier common token would itself be a prefix-prefix match with a
    // smaller rank). At that token the total overlap is bounded by
    // 1 + min(la − ra, lb − rb); pairs that cannot reach the Jaccard
    // equi-overlap bar α = ⌈t·(la+lb)/(1+t)⌉ are pruned BEFORE the
    // shingle-array verification join — same shuffle as the plain
    // distinct (groupBy on the pair key), strictly fewer survivors.
    // The lexicographic (ra, rb) min rides ONE [[packRanks]] long
    // (common tokens appear in the same relative order on both sides,
    // so ra and rb are co-monotonic and the lexicographic min is the
    // first common token on BOTH sides) and the lengths are pair
    // constants recovered by max — all three hash-aggregable, so this
    // groupBy stays a HashAggregate like the distinct it replaces.
    val candidates = prefix.select(col("__tok"), col(idCol).as("id_a"),
        col("__len").as("__la"), col("__r").as("__ra"))
      .join(prefix.select(col("__tok"), col(idCol).as("id_b"),
        col("__len").as("__lb"), col("__r").as("__rb")),
        Seq("__tok"))
      .where(col("id_a") < col("id_b") &&
        col("__lb") >= lit(threshold) * col("__la") - lit(1e-9) &&
        col("__la") >= lit(threshold) * col("__lb") - lit(1e-9))
      // per-ROW positional prune before the pair aggregate — same
      // result-identity argument as incrementalDedup's (the bound uses
      // only this row's ranks and the pair-constant lengths; a pair the
      // post-agg filter admits keeps its first-common-token witness)
      .where(lit(1) +
        least(col("__la") - col("__ra"), col("__lb") - col("__rb")) >=
        ceil(lit(threshold / (1.0 + threshold)) *
          (col("__la") + col("__lb")) - lit(1e-9)))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(packRanks(col("__ra"), col("__rb"))).as("__pk"),
        max(col("__la")).as("__la"), max(col("__lb")).as("__lb"))
      .where(lit(1) +
        least(col("__la") - packedHi(col("__pk")),
          col("__lb") - packedLo(col("__pk"))) >=
        ceil(lit(threshold / (1.0 + threshold)) *
          (col("__la") + col("__lb")) - lit(1e-9)))
      .select(col("id_a"), col("id_b"))
    candidates
      .join(sh.select(col(idCol).as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        TextAnalysis.jaccard(col("__sh_a"), col("__sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** The audit leg of [[similarityJoinPrefix]]'s posting-list cap: the
    * shingle tokens whose GLOBAL posting lists (number of documents
    * containing the shingle) exceed `maxPostings` and were therefore
    * excluded from candidate generation, with their posting counts. Run
    * with the same `shingleN` as the paired join call. A non-empty
    * result at a generous cap means the corpus's shingle vocabulary is
    * saturating — raise `shingleN` or switch to word shingles — not
    * that the cap should be raised. `maxPostings` must be a real cap: a
    * Long.MaxValue default would make the filter unsatisfiable and the
    * audit a silent no-op, which reads as "nothing dropped".
    */
  def similarityJoinDroppedTokens(df: DataFrame, textCol: String,
                                  shingleN: Int, maxPostings: Long): DataFrame = {
    require(maxPostings >= 1 && maxPostings < Long.MaxValue,
      s"maxPostings must be a real cap in [1, Long.MaxValue), got $maxPostings")
    df.select(explode(TextAnalysis.charNgrams(col(textCol), shingleN)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_postings"))
      .where(col("n_postings") > maxPostings)
  }

  /** EXACT containment join — the asymmetric cousin of
    * [[similarityJoinPrefix]]: all pairs with
    * containment = |A∩B| / min(|A|,|B|) ≥ threshold. Symmetric Jaccard
    * misses near-SUBSETS (a short doc embedded verbatim in a long one
    * scores low Jaccard but containment ≈ 1), which is exactly the
    * quote/aggregation/expansion duplication mode in web corpora.
    *
    * Prefix principle on the SMALLER side: if |A∩B| ≥ ⌈t·|A|⌉ and A's
    * first |A| − ⌈t·|A|⌉ + 1 rarest tokens (global frequency order)
    * share nothing with B, at most ⌈t·|A|⌉ − 1 of A's tokens can be in
    * B — contradiction. So candidates are generated by joining the
    * smaller side's prefix against the larger side's FULL token list
    * (containment puts no lower bound on the larger side, so there is
    * no length filter and no larger-side prefix — the price of
    * asymmetry, which is why this op fans out more than the Jaccard
    * join and the threshold should stay high). The prefix bound is
    * computed in exact integer arithmetic (ppm threshold), and the
    * outputs are integer ppm — fully engine-portable.
    *
    * Returns (id_a < id_b, containment_ppm, jaccard_ppm) for pairs
    * clearing the containment bar. Shuffles carry (token, id) pairs and
    * (id_a, id_b) candidates — never documents.
    *
    * The [[similarityJoinPrefix]] VOCABULARY CONTRACT applies with more
    * force here (the asymmetric join already fans out more): prefix
    * selectivity requires a token universe large relative to the
    * corpus, so at corpus scale use shingleN ≥ 5 / word shingles —
    * char 3-grams saturate and degenerate toward posting-list².
    */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
                       shingleN: Int = 3,
                       thresholdPpm: Long = 700000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = df.select(col(idCol),
      TextAnalysis.charNgrams(col(textCol), shingleN).as("__sh"))
      .transform(graft.core.Checkpoints.sessionCk) // feeds ranking + both verify sides
    val toks = sh.select(col(idCol), size(col("__sh")).cast("long").as("__len"),
      explode(col("__sh")).as("__tok"))
    val freq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__freq"))
    val ranked = toks.join(freq, Seq("__tok"))
      .withColumn("__r", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("__freq").asc, col("__tok").asc)))
      .select(col("__tok"), col(idCol), col("__len"), col("__r"))
      .transform(graft.core.Checkpoints.sessionCk) // consumed twice: prefix side + full side
    // integer ceil: ⌈len·t⌉ = (len·tPpm + 999999) div 1e6 — no float eps
    val prefix = ranked.where(col("__r") <=
      col("__len") - expr(s"(__len * $thresholdPpm + 999999) div 1000000") + 1)
    // Positional filter (the [[similarityJoinPrefix]] PPJoin bound,
    // containment flavor): at a pair's first common ranked token —
    // min (rs, ro) over the candidate stream; sound because both sides
    // rank by the one global (freq, tok) order, so any earlier common
    // token yields a lexicographically smaller row in the SAME stream
    // (it is in the smaller side's prefix whenever the matched token
    // is, and always in the larger side's full list) — total overlap
    // ≤ 1 + min(ls−rs, lo−ro). Pairs that cannot reach the containment
    // bar ⌈t·ls⌉ never enter the shingle-array verification join. The
    // groupBy replaces the plain pair distinct: same shuffle key,
    // strictly fewer survivors, recall unchanged — EXACT. (Equal-length
    // pairs can arrive in both orientations; each row's (rs, ls, ro,
    // lo) is internally consistent and the min over the union is still
    // a first-common-token witness, so the bound holds for whichever
    // row wins.) Per-row __ls/__lo are the pair's smaller/larger
    // lengths in EVERY orientation, so they are pair constants
    // recovered by max; the lexicographic (rs, ro) min rides one packed
    // long. All three aggregates are hash-aggregable — the groupBy
    // stays a HashAggregate like the distinct it replaces (a struct min
    // would plan as SortAggregate and sort the whole candidate stream).
    val candidates = prefix
      .select(col("__tok"), col(idCol).as("__is"),
        col("__len").as("__ls"), col("__r").as("__rs"))
      .join(ranked.select(col("__tok"), col(idCol).as("__io"),
        col("__len").as("__lo"), col("__r").as("__ro")),
        Seq("__tok"))
      // smaller side carries the prefix; equal lengths dedupe by id order
      .where(col("__ls") < col("__lo") ||
        (col("__ls") === col("__lo") && col("__is") =!= col("__io")))
      .groupBy(least(col("__is"), col("__io")).as("id_a"),
        greatest(col("__is"), col("__io")).as("id_b"))
      .agg(min(packRanks(col("__rs"), col("__ro"))).as("__pk"),
        max(col("__ls")).as("__ls"), max(col("__lo")).as("__lo"))
      .where(lit(1L) +
        least(col("__ls") - packedHi(col("__pk")),
          col("__lo") - packedLo(col("__pk"))) >=
        expr(s"(__ls * $thresholdPpm + 999999) div 1000000"))
      .select(col("id_a"), col("id_b"))
    candidates
      .join(sh.select(col(idCol).as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        // count-only native intersection: no per-pair array allocation
        graft.expressions.MinHashExprs.intersectCount(
          col("__sh_a"), col("__sh_b")).as("__inter"),
        size(col("__sh_a")).cast("long").as("__la"),
        size(col("__sh_b")).cast("long").as("__lb"))
      .select(col("id_a"), col("id_b"),
        expr("__inter * 1000000 div least(__la, __lb)").as("containment_ppm"),
        expr("__inter * 1000000 div (__la + __lb - __inter)").as("jaccard_ppm"))
      .where(col("containment_ppm") >= thresholdPpm)
  }

  /** MinHash-LSH dedup DECISION — the 100 TB shape. All-pairs output
    * (minhashNearDups) is quadratic in cluster size and explodes on
    * templated corpora; what a training-data pipeline actually needs is
    * one decision per document. Per band bucket take the min id as
    * representative; per doc verify the `verifyCandidates` smallest
    * DISTINCT band-mins with exact Jaccard and keep the smallest
    * passing edge — ≤ k·N verify rows end to end, never all-pairs.
    * (k > 1 matters with narrow bands: a single-minhash bucket catches
    * js≈0.01 strangers often enough that the one smallest candidate can
    * be a stranger whose verification fails, shadowing the true
    * near-dup edge.) Then min-propagate over the VERIFIED edges so
    * chains collapse to their cluster root (propagation before
    * verification would pair docs with transitively-reached roots they
    * aren't directly similar to). `propagationRounds` bounds the
    * pointer-chasing (rep := rep's rep is pointer doubling, so chain
    * depth halves per round); `propagationRounds = -1` iterates to
    * fixpoint — full connected components, O(log longest-chain) rounds.
    *
    * Lineage discipline: the verified decision frame is materialized
    * with `localCheckpoint` BEFORE any propagation round, so the
    * corpus-wide shingle→minhash→verify pipeline executes once — not
    * once per round-side of every self-join (at 100 TB, recomputing the
    * corpus MinHash per round is the scale-killer). Each round's output
    * is checkpointed too: the self-join references its input twice, so
    * un-truncated lineage doubles per round.
    *
    * Returns (id, rep_id, jaccard, is_dup): `jaccard` is the verified
    * direct-edge similarity; is_dup = false means the doc keeps itself.
    */
  def minhashDedup(df: DataFrame, textCol: String, idCol: String,
                   shingleN: Int = 3, numHashes: Int = 32,
                   bands: Int = 8, threshold: Double = 0.6,
                   propagationRounds: Int = 2,
                   verifyCandidates: Int = 3,
                   portable: Boolean = false): DataFrame = {
    val rowsPerBand = numHashes / bands
    // referenced by the banding pipeline and twice per verify tier:
    // shingle once, serve everyone (a durable intermediate at cluster scale)
    val sh = df.select(col(idCol),
      TextAnalysis.charNgrams(col(textCol), shingleN).as("__sh"))
      .transform(graft.core.Checkpoints.sessionCk)
    // `portable = true` swaps BOTH hash legs for the md5-derived
    // Carter-Wegman family (graft.expressions.PortableMinHashSigExpr: ONE
    // md5 per shingle, slot k = (h1 + k*h2) mod 2^48) with
    // literal-value band keys, so the whole candidate/decision pipeline — not just the
    // signature math — is reproducible by an external engine (the q35
    // hash oracle). Two round-11 performance findings are baked into
    // this shape: the signature is explode + groupBy — every expression
    // codegen'd — NOT an array(transform(...)) projection whose
    // interpreted lambdas measured ~30× slower at ×100; and the family
    // is pairwise-independent slots from ONE md5, not numHashes
    // independent md5s — the other 32× of avoidable hashing. One extra
    // (id, 32 longs) shuffle vs the native single-pass expression is
    // the price of portability. Shingle-less docs are dropped from
    // banding explicitly: their slot mins would be all-NULL and alias
    // into one giant spurious bucket. (Known mode divergence on
    // DEGENERATE input: the native expression gives empty docs an
    // all-MaxValue signature, so empties dedup to each other —
    // jaccard(∅,∅) = 1; portable mode leaves them singletons. Both are
    // defensible; no fixture doc is shingle-less.)
    val banded = (if (portable) {
      // single compiled pass per row (PortableMinHashSigExpr, via
      // [[portableBanded]]): the explode + groupBy formulation was
      // codegen'd but still paid a corpus-sized explode/agg for what is
      // one in-row loop (3.3 s vs 1.2 s native at sf0.1), and the
      // array(transform(...)) one ran its lambdas interpreted (20+ min
      // at ×100). Band keys are the LITERAL slot values, concat'd by
      // plain codegen'd expressions.
      portableBanded(sh, idCol, numHashes, bands)
    } else sh
      .select(col(idCol), explode(
        lshBandKeys(minhashSignature(col("__sh"), numHashes), bands, rowsPerBand))
        .as("__band")))
    val bandMin = banded.groupBy(col("__band")).agg(min(col(idCol)).as("__bmin"))
    // the k smallest distinct lower-id candidates per doc (collect_set
    // bounded by `bands`); narrow (id, ≤k longs) frame referenced by
    // both verify tiers — checkpointed so the shingle→minhash→band
    // pipeline runs ONCE
    val cands = banded.join(bandMin, Seq("__band"))
      .where(col("__bmin") < col(idCol))
      .groupBy(col(idCol))
      .agg(slice(array_sort(collect_set(col("__bmin"))), 1, verifyCandidates)
        .as("__cands"))
      .transform(graft.core.Checkpoints.sessionCk) // lazy: truncates the plan, materializes
                              // inside the next job (no blocking barrier)
    def verify(pairs: DataFrame): DataFrame = pairs
      .join(sh.select(col(idCol), col("__sh")), Seq(idCol))
      .join(sh.select(col(idCol).as("__rep"), col("__sh").as("__sh_r")), Seq("__rep"))
      .select(col(idCol), col("__rep"),
        TextAnalysis.jaccard(col("__sh"), col("__sh_r")).as("jaccard"))
    // tiered verification: tier 1 checks ONLY the smallest candidate —
    // one pair per doc, exactly the round-1 volume — and on the typical
    // corpus almost every doc stops there. Only docs whose smallest
    // candidate FAILED (usually a banding stranger) escalate to
    // candidates 2..k, so the extra robustness joins run over a frame
    // that is tiny at any scale. The outcome is identical to verifying
    // all k upfront: the smallest passing candidate wins either way.
    val v1 = verify(cands.select(col(idCol), col("__cands").getItem(0).as("__rep")))
      .transform(graft.core.Checkpoints.sessionCk) // referenced twice (pass + escalation filter)
    val failed1 = v1.where(col("jaccard") < threshold).select(col(idCol))
    val tier2 = cands.where(size(col("__cands")) > 1)
      .join(failed1, Seq(idCol), "leftsemi")
      .select(col(idCol),
        explode(slice(col("__cands"), 2, verifyCandidates - 1)).as("__rep"))
    val verified =
      if (verifyCandidates <= 1) v1 else v1.unionByName(verify(tier2))
    // per doc: smallest PASSING edge wins (min over a struct ignores
    // NULLs, so failing candidates only surface via __bestj)
    val best = verified.groupBy(col(idCol)).agg(
      min(when(col("jaccard") >= threshold,
        struct(col("__rep"), col("jaccard")))).as("__pass"),
      max(col("jaccard")).as("__bestj"))
    val direct = df.select(col(idCol)).join(best, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__pass.__rep"), col(idCol)).as("rep_id"),
        coalesce(col("__pass.jaccard"), col("__bestj")).as("jaccard"),
        col("__pass").isNotNull.as("is_dup"))
    if (propagationRounds == 1) direct
    else propagate(direct, idCol, propagationRounds)
  }

  /** One pointer-doubling round: rep := min(rep, rep's rep) over the
    * verified edges; `__moved` marks rows whose rep changed this round
    * (the fixpoint signal).
    */
  private def propagateStep(r: DataFrame, idCol: String): DataFrame =
    r.join(r.select(col(idCol).as("rep_id"), col("rep_id").as("__rep2")),
      Seq("rep_id"), "left")
      .select(col(idCol),
        least(col("rep_id"), coalesce(col("__rep2"), col("rep_id"))).as("rep_id"),
        col("jaccard"), col("is_dup"),
        (least(col("rep_id"), coalesce(col("__rep2"), col("rep_id"))) =!= col("rep_id"))
          .as("__moved"))

  /** Min-propagate rep pointers over verified edges. `rounds > 1` runs
    * exactly rounds−1 doubling steps; `rounds = -1` iterates until no
    * row's rep changes (connected components to fixpoint). Input is
    * localCheckpoint'd so the upstream pipeline runs once; every round
    * is checkpointed so the twice-referenced self-join lineage stays
    * flat.
    */
  private def propagate(direct: DataFrame, idCol: String, rounds: Int): DataFrame = {
    var (cur, relCur) = graft.core.Checkpoints.localCk(direct)
    var round = 1
    var moved = true
    // pointer doubling halves chain depth per round: 64 rounds covers
    // chains of ~2^64 — a safety bound, never the stop condition
    val maxRounds = if (rounds == -1) 64 else rounds - 1
    while (moved && round <= maxRounds) {
      val (next, relNext) = graft.core.Checkpoints.localCk(
        propagateStep(cur, idCol))
      if (rounds == -1) {
        // the fixpoint probe materializes `next` — the previous round's
        // snapshot is unreachable; release it (fixpoint runs otherwise
        // pin O(rounds) snapshots). Fixed-round runs stay a fully-lazy
        // chain (no per-round action), so their snapshots must stay
        // pinned until the caller's terminal action.
        moved = !next.where(col("__moved")).isEmpty
        relCur(); relCur = relNext
      } else {
        moved = true
        relCur = graft.core.Checkpoints.noRelease
      }
      cur = next.drop("__moved")
      round += 1
    }
    cur
  }

  /** SimHash 64-bit fingerprint over token hashes: per bit, the sign of
    * the ±1 vote sum across tokens. Implemented with explode + 64
    * conditional sums (pure codegen aggregation, one shuffle on id).
    * `portable = true` swaps the XXH64 token hash for
    * [[TextAnalysis.portableHash64]] (md5-derived), making the
    * fingerprints reproducible from any md5-capable engine — the q36
    * hash oracle runs the identical computation in DuckDB.
    */
  def simhash(df: DataFrame, textCol: String, idCol: String,
              out: String = "simhash", portable: Boolean = false): DataFrame = {
    val tok = df.select(col(idCol),
      explode_outer(TextAnalysis.tokens(col(textCol))).as("__t"))
      .withColumn("__h",
        if (portable) TextAnalysis.portableHash64(col("__t"))
        else xxhash64(col("__t")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("__h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"__b$b")
    }
    val agg = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map { b =>
      when(col(s"__b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col(idCol), fp.as(out))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Passage-level exact-duplication profile (the sub-document variant of
    * exact dedup: boilerplate headers/footers and syndicated passages
    * recur across documents that are NOT whole-doc duplicates — cf. the
    * reference's row-level scrubs vs whole-snapshot diffs). Splits each
    * text into non-overlapping `words`-token windows, md5-keys each
    * window, and reports per document how many of its full windows occur
    * more than once corpus-wide. Shuffles carry only (id, 32-char md5)
    * rows — never passage text — and the md5 keying is engine-portable,
    * so an external system (or the DuckDB oracle) reproduces the exact
    * same buckets. Documents shorter than one window report 0/0.
    */
  def passageDupStats(df: DataFrame, textCol: String, idCol: String,
                      words: Int = 10): DataFrame = {
    require(words > 0, s"words must be positive, got $words")
    val withWords = df.select(col(idCol),
      split(trim(col(textCol)), "\\s+").as("__w"))
    val passages = withWords
      .select(col(idCol),
        explode(when(size(col("__w")) >= words,
          sequence(lit(0), floor(size(col("__w")) / words).cast("int") - 1))
          .otherwise(array().cast("array<int>"))).as("__g"),
        col("__w"))
      .select(col(idCol),
        md5(array_join(slice(col("__w"), col("__g") * words + 1, lit(words)), " "))
          .as("__ph"))
    val freq = passages.groupBy(col("__ph")).agg(count(lit(1)).as("__pf"))
    val perDoc = passages.join(freq, Seq("__ph"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("__pf") > 1, 1L).otherwise(0L)).as("n_dup_passages"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_passages"), lit(0L)).as("n_passages"),
        coalesce(col("n_dup_passages"), lit(0L)).as("n_dup_passages"))
  }

  /** Passage-level scrub — the REMOVAL counterpart of
    * [[passageDupStats]] (CCNet-style repeated-passage elimination,
    * Wenzek et al. 2020, arXiv:1911.00359 §3.1: drop text units that
    * recur across the corpus, keep the rest of the document). Splits
    * each text into non-overlapping `words`-token windows, keeps only
    * windows whose md5 occurs at most `maxFreq` times corpus-wide, and
    * reassembles the survivors in original document order.
    *
    * Scale shape: the frequency pass shuffles 32-char md5 keys only,
    * and the survivor filter is an anti-join against the DUPLICATED
    * hash set (freq > maxFreq — tiny in a real corpus, so it
    * broadcasts). Passage text crosses exactly one exchange: the
    * per-doc rebuild, partitioned by document id, where the in-order
    * reassembly is a `sort_array` over each doc's own (idx, text)
    * pairs — never a global sort. Documents shorter than one window
    * (or with every window scrubbed) come back as the empty string
    * with 0 kept.
    */
  def passageScrub(df: DataFrame, textCol: String, idCol: String,
                   words: Int = 10, maxFreq: Long = 1L): DataFrame = {
    require(words > 0, s"words must be positive, got $words")
    val withWords = df.select(col(idCol),
      split(trim(col(textCol)), "\\s+").as("__w"))
    val passages = withWords
      .select(col(idCol),
        explode(when(size(col("__w")) >= words,
          sequence(lit(0), floor(size(col("__w")) / words).cast("int") - 1))
          .otherwise(array().cast("array<int>"))).as("__g"),
        col("__w"))
      .select(col(idCol), col("__g"),
        array_join(slice(col("__w"), col("__g") * words + 1, lit(words)), " ")
          .as("__p"))
      .withColumn("__ph", md5(col("__p")))
    // anti-join against the DUPLICATED hash set, not an inner join
    // against the full frequency table: the bad set is tiny in a real
    // corpus (only hashes with freq > maxFreq), so it broadcasts, and
    // passage text crosses exactly one exchange — the per-doc rebuild
    val dups = passages.select(col("__ph"))
      .groupBy(col("__ph")).agg(count(lit(1)).as("__pf"))
      .where(col("__pf") > maxFreq)
      .select(col("__ph"))
    val perDoc = passages.join(dups, Seq("__ph"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          sort_array(collect_list(struct(col("__g"), col("__p")))),
          s => s("__p")), " ").as("clean_text"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Substring-level duplication profile — the hashed stand-in for
    * suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499):
    * every OVERLAPPING stride-1 window of `words` tokens is keyed by
    * md5; a window position counts as duplicated when its key occurs
    * more than once corpus-wide (covers both cross-document boilerplate
    * and within-document repetition — any repeated `words`-token
    * substring is caught at every position it spans). Reports per doc
    * the window count, duplicated-window count, and the duplicated
    * fraction in ppm (integer, engine-exact).
    *
    * vs [[passageDupStats]]: non-overlapping windows miss duplicate
    * passages that straddle a window boundary; stride-1 windows detect a
    * shared `words`-token run at ANY alignment, at `words`× the window
    * volume. Shuffles carry (id, 32-char md5) rows only — text never
    * moves; volume is O(total tokens), the same order as tokenization.
    */
  def substringDupStats(df: DataFrame, textCol: String, idCol: String,
                        words: Int = 8): DataFrame = {
    require(words > 0, s"words must be positive, got $words")
    val withWords = df.select(col(idCol),
      split(trim(col(textCol)), "\\s+").as("__w"))
    val windows = withWords
      .select(col(idCol),
        explode(when(size(col("__w")) >= words,
          sequence(lit(1), size(col("__w")) - words + 1))
          .otherwise(array().cast("array<int>"))).as("__i"),
        col("__w"))
      .select(col(idCol),
        md5(array_join(slice(col("__w"), col("__i"), lit(words)), " ")).as("__wh"))
    val freq = windows.groupBy(col("__wh")).agg(count(lit(1)).as("__f"))
    val perDoc = windows.join(freq, Seq("__wh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("__f") > 1, 1L).otherwise(0L)).as("n_dup_windows"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(expr("n_dup_windows * 1000000 div n_windows"), lit(0L))
          .as("dup_ppm"))
  }

  /** Incremental batch-vs-store near-dup check — the nightly shape of
    * [[similarityJoinPrefix]]: a new batch arrives, the historical store
    * is already deduplicated, and the question is only "is each NEW doc
    * a duplicate of the STORE" — never store×store again. Exact-recall
    * prefix filtering with one asymmetry: candidate pairs are built
    * new-prefix ⋈ old-prefix, so the fan-out is proportional to the
    * batch, not the corpus. Token frequencies (the prefix ordering) are
    * computed over the union — both sides must rank tokens identically
    * for the prefix principle to hold. Returns one row per new doc:
    * whether its exact text (md5) already exists in the store, and its
    * best store match at `threshold` (highest Jaccard, ties to the
    * smallest store id), NULL when nothing clears the bar. Batch and
    * store ids are independent sequences and MAY collide: every internal
    * step keys on (id, side), so a reused id never mixes the two docs.
    *
    * The [[similarityJoinPrefix]] VOCABULARY CONTRACT applies verbatim
    * and is ENFORCED by the same two mechanisms (round 14 — the honest
    * bench caught the gap: the count()-era ×100 boards had eliminated
    * this operator's candidate pipeline entirely, and the first
    * materializing measurement found the candidate stream growing
    * superlinearly on a saturated 3-gram vocabulary — ×1 → ×10 took
    * the new-prefix ⋈ old-prefix join from 20M to 579M rows because
    * corpus-common shingles connect every batch doc to every replica
    * of the store):
    *
    *  - '''Saturation guard''' (`maxCandidateVolume`, default 150M —
    *    the [[similarityJoinPrefix]] calibration): the EXACT candidate
    *    join output size, Σ over prefix tokens of (new postings ×
    *    store postings), computed eagerly on the already-materialized
    *    prefix table, raising the SATURATED VOCABULARY error with
    *    remedies BEFORE any degenerate join streams. A nightly whose
    *    arrivals are bounded sits orders of magnitude below the
    *    default; crossing it is a decision, never a silent cliff.
    *  - '''Posting-list cap''' (opt-in `maxPostings`): tokens whose
    *    union posting list exceeds the cap drop from candidate
    *    generation (drop-and-report; enumerable via
    *    [[similarityJoinDroppedTokens]] on the union corpus).
    */
  def incrementalDedup(newBatch: DataFrame, store: DataFrame,
                       textCol: String, idCol: String,
                       shingleN: Int = 3, threshold: Double = 0.7,
                       maxPostings: Long = Long.MaxValue,
                       maxCandidateVolume: Long = 150000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxPostings >= 1, s"maxPostings must be >= 1, got $maxPostings")
    val tagged = newBatch.select(col(idCol), col(textCol), lit(true).as("__new"))
      .unionByName(store.select(col(idCol), col(textCol), lit(false).as("__new")))
    val sh = tagged.select(col(idCol), col("__new"),
      TextAnalysis.charNgrams(col(textCol), shingleN).as("__sh"))
      .transform(graft.core.Checkpoints.sessionCk) // feeds the token explode + both verify sides
    val toks = sh.select(col(idCol), col("__new"), size(col("__sh")).as("__len"),
      explode(col("__sh")).as("__tok"))
    val freq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__freq"))
    val prefix = toks.join(freq, Seq("__tok"))
      // partition by (id, side): a doc_id reused across batch and store
      // must not share one prefix window, or row_number interleaves the
      // two docs' tokens and truncates/mixes their prefixes
      .withColumn("__r", row_number().over(Window.partitionBy(col(idCol), col("__new"))
        .orderBy(col("__freq").asc, col("__tok").asc)))
      .where(col("__r") <= col("__len") - ceil(lit(threshold) * col("__len") - lit(1e-9)) + 1)
      // cap AFTER ranking (the similarityJoinPrefix contract): prefix
      // membership is decided by the full global ordering, then hot
      // tokens are removed — never adds candidates
      .where(col("__freq") <= maxPostings)
      .select(col("__tok"), col(idCol), col("__new"), col("__len"), col("__r"))
      .transform(graft.core.Checkpoints.sessionCk) // joined twice below: run freq+window once
    // Saturation guard (the similarityJoinPrefix mechanism, asymmetric
    // flavor): Σ over tokens of (new-side prefix postings × old-side
    // prefix postings) IS the candidate-join output size. The prefix
    // table just materialized for the self-join, so this is one tiny
    // agg job, and the failure arrives at CALL time with remedies
    // instead of a degenerate join at task time.
    if (maxCandidateVolume != Long.MaxValue) {
      val cost = prefix.groupBy(col("__tok"))
        .agg(sum(when(col("__new"), 1L).otherwise(0L)).as("__pn"),
          sum(when(col("__new"), 0L).otherwise(1L)).as("__po"))
        .agg(coalesce(sum(col("__pn") * col("__po")), lit(0L)))
        .head().getLong(0)
      require(cost <= maxCandidateVolume,
        s"incrementalDedup: SATURATED VOCABULARY — estimated candidate " +
          s"volume $cost exceeds maxCandidateVolume=$maxCandidateVolume " +
          s"(shingleN=$shingleN). Remedies: raise shingleN (>=5) or use " +
          "word-level shingles; bound the batch (the nightly contract " +
          "is a fixed-size arrival set against the growing store); set " +
          "maxPostings to drop-and-report hot tokens; use minhashDedup " +
          "if the threshold tolerates LSH; or raise maxCandidateVolume " +
          "deliberately for a larger cluster.")
    }
    // Candidate pruning = the same PPJoin positional filter as
    // [[similarityJoinPrefix]] (Xiao et al. 2008), valid asymmetrically
    // because BOTH sides rank tokens by the one union-frequency global
    // order: for a pair's FIRST common prefix token (min rank — an
    // earlier common token would itself be a smaller-rank prefix-prefix
    // match on both sides), total overlap ≤ 1 + min(ln−rn, lo−ro).
    // Pairs that cannot reach the Jaccard equi-overlap bar
    // α = ⌈t·(ln+lo)/(1+t)⌉ never enter the shingle-array verification
    // join. Same shuffle as the plain pair distinct (groupBy on the
    // pair key), strictly fewer survivors, recall unchanged — EXACT.
    // The lexicographic (rn, ro) min rides ONE packed long (ranks are
    // row_numbers, far below 2³¹) and the side lengths are pair
    // constants recovered by max — all three hash-aggregable, so the
    // groupBy stays a HashAggregate exactly like the distinct it
    // replaces (a min over a STRUCT would plan as SortAggregate and
    // sort the entire candidate stream per partition — measured as a
    // memory-exhaustion failure at ×100).
    val candidates = prefix.where(col("__new"))
      .select(col("__tok"), col(idCol).as("__nid"),
        col("__len").as("__ln"), col("__r").as("__rn"))
      .join(prefix.where(!col("__new"))
        .select(col("__tok"), col(idCol).as("__oid"),
          col("__len").as("__lo"), col("__r").as("__ro")),
        Seq("__tok"))
      .where(col("__lo") >= lit(threshold) * col("__ln") - lit(1e-9) &&
        col("__ln") >= lit(threshold) * col("__lo") - lit(1e-9))
      // Per-ROW positional prune (round 17, guide §2.3 "shuffle fewer
      // bytes"): the pair bound below depends only on (rank, rank) and
      // the pair-constant lengths, so a row whose OWN ranks cannot
      // reach the equi-overlap bar can be dropped before the pair
      // aggregate ever hashes it. Result-identical: a surviving pair's
      // first-common-token row passes this filter (its bound is the
      // pair bound, ≥ α), so the min-packed witness is unchanged for
      // every pair the post-agg filter admits; a pair whose witness
      // row is pruned can only re-enter via a LATER common token and
      // then faces the exact-Jaccard verification join, which decides
      // membership — never the other way around.
      .where(lit(1) +
        least(col("__ln") - col("__rn"), col("__lo") - col("__ro")) >=
        ceil(lit(threshold / (1.0 + threshold)) *
          (col("__ln") + col("__lo")) - lit(1e-9)))
      .groupBy(col("__nid"), col("__oid"))
      .agg(min(packRanks(col("__rn"), col("__ro"))).as("__pk"),
        max(col("__ln")).as("__ln"), max(col("__lo")).as("__lo"))
      .where(lit(1) +
        least(col("__ln") - packedHi(col("__pk")),
          col("__lo") - packedLo(col("__pk"))) >=
        ceil(lit(threshold / (1.0 + threshold)) *
          (col("__ln") + col("__lo")) - lit(1e-9)))
      .select(col("__nid"), col("__oid"))
    val verified = candidates
      .join(sh.where(col("__new"))
        .select(col(idCol).as("__nid"), col("__sh").as("__sh_n")), Seq("__nid"))
      .join(sh.where(!col("__new"))
        .select(col(idCol).as("__oid"), col("__sh").as("__sh_o")), Seq("__oid"))
      .select(col("__nid"), col("__oid"),
        TextAnalysis.jaccard(col("__sh_n"), col("__sh_o")).as("jaccard"))
      .where(col("jaccard") >= threshold)
    // best store match per new doc: max Jaccard, ties to the min old id
    // (max over a struct compares fields in order; negate the id so the
    // lexicographic max prefers SMALLER store ids on Jaccard ties)
    val best = verified.groupBy(col("__nid"))
      .agg(max(struct(col("jaccard"), (-col("__oid")).as("__noid"))).as("__b"))
      .select(col("__nid").as(idCol),
        (-col("__b.__noid")).as("best_old_id"),
        col("__b.jaccard").as("best_jaccard"))
    val storeKeys = store.select(md5(col(textCol)).as("__k")).distinct()
    newBatch.select(col(idCol), md5(col(textCol)).as("__k"))
      .join(storeKeys.withColumn("__hit", lit(true)), Seq("__k"), "left")
      .select(col(idCol), coalesce(col("__hit"), lit(false)).as("exact_dup"))
      .join(best, Seq(idCol), "left")
  }

  /** Dedup-threshold calibration sweep: exact pairwise Jaccard over a
    * deterministic SAMPLE of the corpus, histogrammed by similarity
    * decile, with a reverse-cumulative pair count per bucket — "if I
    * set the near-dup threshold at t, how many pairs (per sampled
    * pair) does it catch?" This is the sweep every dedup rollout runs
    * before committing to a threshold; production dedup then runs the
    * LSH path ([[minhashDedup]]) at the chosen t.
    *
    * All-pairs is QUADRATIC BY DESIGN and must stay on a BOUNDED
    * sample: `sampleMod` keeps 1/sampleMod of docs (deterministic id
    * filter, so every engine sees the same sample), and `maxSample`
    * then caps the sample ABSOLUTELY by taking the first `maxSample`
    * docs in md5(id) order — a proportional sample alone re-grows with
    * the corpus (at 100 TB a 1/20 sample is still 5 TB, and its
    * all-pairs is 10⁹× the calibration anyone needs; measured: the
    * uncapped ×10 fixture pays ~8× at the bench while 500 capped docs'
    * 125k pairs answer the same 10-bucket histogram in 1.8 s at ANY
    * corpus size). Hash order is engine-portable and stable under
    * corpus growth for the ids it retains.
    * Similarity is exact integer ppm (|A∩B|·1e6 div |A∪B|) — no float
    * thresholds, engines agree on every bucket edge.
    *
    * Scale shape: the sampled shingle frame is checkpointed and
    * broadcast as the build side of the pair join (bounded by
    * `maxSample`); the histogram reduces behind a partial-agg pair and
    * the reverse cumsum runs over ≤ 11 rows.
    */
  def thresholdCalibration(df: DataFrame, textCol: String, idCol: String,
                           shingleN: Int = 3, sampleMod: Long = 20L,
                           maxSample: Int = 500): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")
    require(maxSample >= 2, s"maxSample must be >= 2, got $maxSample")
    val sh = df.where(pmod(col(idCol), lit(sampleMod)) === 0)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
      .limit(maxSample)
      // a global limit collapses to ONE partition — re-spread before the
      // quadratic work or the pair join runs single-threaded (measured:
      // 2.6× slower than the uncapped form at ×10 without this)
      .repartition(col(idCol))
      .select(col(idCol), TextAnalysis.charNgrams(col(textCol), shingleN).as("__sh"))
      .where(size(col("__sh")) > 0)
      .transform(graft.core.Checkpoints.sessionCk) // both sides of the pair join: shingle once
    val pairs = sh.select(col(idCol).as("__ia"), col("__sh").as("__sa"))
      .join(broadcast(sh.select(col(idCol).as("__ib"), col("__sh").as("__sb"))),
        col("__ia") < col("__ib"))
      .select(
        // count-only native intersection: no per-pair array allocation
        graft.expressions.MinHashExprs.intersectCount(
          col("__sa"), col("__sb")).as("__i"),
        (size(col("__sa")) + size(col("__sb"))).cast("long").as("__ab"))
      // |A∪B| = |A|+|B|−|A∩B| (shingle sets are distinct-element), so
      // the union scan is free. `div`, not `/`: Column./ on BIGINT is
      // double division; operands are non-negative so truncating div
      // == DuckDB's flooring `//`
      .select(expr("__i * 1000000 div (__ab - __i)").as("__jppm"))
    val hist = pairs
      .select(least(expr("__jppm div 100000"), lit(9L)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
    // reverse cumulative over <= 10 rows: deliberate single-task window
    hist.withColumn("n_pairs_at_or_above",
        sum(col("n_pairs")).over(
          Window.orderBy(col("bucket").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("bucket"), col("n_pairs"), col("n_pairs_at_or_above"))
  }

  /** Blocked edit-distance entity resolution — the STRING-metric member
    * of the dedup family (everything else here is set-based: shingles,
    * MinHash, SimHash). Classic record-linkage shape: a cheap BLOCKING
    * key bounds the candidate pairs (only rows sharing a block ever
    * meet), then the expensive metric — Levenshtein — verifies inside
    * each block. Recall is exactly "matches that share a block": the
    * caller picks block columns the way an ER pipeline picks blocking
    * predicates (sorted-neighborhood, phonetic keys, attribute equality
    * — all expressible as `blockCols` expressions).
    *
    * Scale shape: one shuffle on the block key; pair fan-out is
    * Σ n_b·(n_b−1)/2 over block sizes — the blocking key's quality IS
    * the cost model, and a hot block is visible in the exchange's key
    * histogram before it burns CPU. The verify uses Spark's
    * threshold-banded Levenshtein (O(len·maxDist) per pair, early-exit
    * −1 above the bound), not the full O(len²) matrix.
    *
    * `maxBlockSize` is the safety valve for a degenerate blocking key
    * (the empty-phonetic-code block, the NULL-attribute block): blocks
    * with more than `maxBlockSize` rows are dropped whole before the
    * self-join — same drop-and-report move as [[Winnow.copyClusters]]'s
    * stop-fingerprint cap — so one hot block can't turn the job
    * quadratic. Dropped blocks are enumerable via
    * [[fuzzyMatchDroppedBlocks]] with the same arguments.
    *
    * Returns (id_a < id_b, dist ≤ maxDist) pairs.
    */
  def fuzzyMatchPairs(df: DataFrame, textCol: String, idCol: String,
                      blockCols: Seq[Column], maxDist: Int,
                      maxBlockSize: Long = Long.MaxValue): DataFrame = {
    require(blockCols.nonEmpty, "fuzzyMatchPairs needs >= 1 blocking column")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(maxBlockSize >= 2, s"maxBlockSize must be >= 2, got $maxBlockSize")
    val bcols = blockCols.zipWithIndex.map { case (c, i) => c.as(s"__b$i") }
    val bnames = blockCols.indices.map(i => s"__b$i")
    val n0 = df.select((col(idCol) +: col(textCol).as("__t") +: bcols): _*)
    // the cap join is block-keyed like everything downstream, so it
    // adds an agg but no new partitioning; skipped entirely when uncapped
    val n = if (maxBlockSize == Long.MaxValue) n0 else n0.join(
      n0.groupBy(bnames.map(col): _*).agg(count(lit(1)).as("__bn"))
        .where(col("__bn") <= maxBlockSize)
        .drop("__bn"),
      bnames)
    val a = n.select(
      (col(idCol).as("id_a") +: col("__t").as("__ta") +: bnames.map(col)): _*)
    val b = n.select(
      (col(idCol).as("id_b") +: col("__t").as("__tb") +: bnames.map(col)): _*)
    a.join(b, bnames)
      .where(col("id_a") < col("id_b"))
      // banded form: -1 above the threshold, so the filter keeps only
      // real distances and never pays the unbanded matrix
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__ta"), col("__tb"), maxDist).cast("long").as("dist"))
      .where(col("dist") >= 0)
  }

  /** The audit leg of [[fuzzyMatchPairs]]'s block cap: the blocking-key
    * values (original caller expressions, named `block_0..block_k`) whose
    * blocks exceeded `maxBlockSize` and were therefore dropped whole,
    * with their row counts. A non-empty result is the signal to fix the
    * blocking predicate, not to raise the cap.
    */
  def fuzzyMatchDroppedBlocks(df: DataFrame, blockCols: Seq[Column],
                              maxBlockSize: Long): DataFrame = {
    require(blockCols.nonEmpty, "fuzzyMatchDroppedBlocks needs >= 1 blocking column")
    val bcols = blockCols.zipWithIndex.map { case (c, i) => c.as(s"block_$i") }
    df.select(bcols: _*)
      .groupBy(blockCols.indices.map(i => col(s"block_$i")): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > maxBlockSize)
  }
}
