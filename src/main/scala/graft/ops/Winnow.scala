package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * algorithm): hash every k-gram, slide a w-wide window over the hash
  * sequence, and keep each window's MINIMUM hash. The selected set is a
  * position-robust fingerprint — any shared substring of length
  * ≥ k + w − 1 is guaranteed to contribute at least one common
  * fingerprint, which makes it the classic sub-document copy-detection
  * signal (the guarantee threshold).
  *
  * Hashes are md5-derived (first 8 hex chars → BIGINT), NOT xxhash64 —
  * md5 is engine-portable, so an external system (and the DuckDB
  * oracle) selects the exact same fingerprints. The window minimum is a
  * plain SQL window function; everything shuffles (doc, pos, 8-byte
  * hash) rows — never text.
  *
  * Scale note: one shuffle to order each doc's positions (partitioned
  * by doc — no skew beyond doc length, which is bounded), one
  * fingerprint-key shuffle for the corpus-wide sharing counts. The
  * per-doc window is w-bounded, so state is O(w).
  */
object Winnow {

  /** Per-document winnowing profile. Output: idCol, n_grams (k-gram
    * positions), n_fp (distinct selected fingerprints), n_shared_fp
    * (selected fingerprints that are also selected by ≥ 1 OTHER doc —
    * the copy-detection signal). Docs shorter than k chars: 0/0/0.
    */
  /** The selection core shared by [[fingerprints]] and [[copyClusters]]:
    * distinct (idCol, __fp) rows of winnowing-selected k-gram hashes.
    */
  private def selectedFps(df: DataFrame, textCol: String, idCol: String,
                          k: Int, w: Int): DataFrame = {
    require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")
    // Selection runs INSIDE the scan via the native expression — hash,
    // window-minimize and dedupe in one compiled pass per doc — so only
    // (doc, fingerprint) survivors ever reach an exchange. The
    // composable form (explode every position → md5 → partitioned
    // window min → filter to full windows) shuffles ~|text| rows per
    // doc to discard all but ~1/w of them; WinnowSelectSpec pins the
    // two formulations equal on random inputs.
    df.select(col(idCol),
      explode(graft.expressions.MinHashExprs
        .winnowFps(col(textCol), k, w)).as("__fp"))
  }

  def fingerprints(df: DataFrame, textCol: String, idCol: String,
                   k: Int = 8, w: Int = 4): DataFrame = {
    val selected = selectedFps(df, textCol, idCol, k, w)
    // (id, fp) rows are UNIQUE by construction — WinnowFpsExpr emits the
    // DISTINCT selected set per doc — so count(*) ≡ count(DISTINCT id)
    // per fingerprint, without the two-phase distinct-aggregate expand
    // the countDistinct planned (round 17; QualityOpsSpec pins the counts)
    val sharing = selected.groupBy(col("__fp"))
      .agg(count(lit(1)).as("__ndocs"))
    val perDoc = selected.join(sharing, Seq("__fp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_fp"),
        sum(when(col("__ndocs") > 1, 1L).otherwise(0L)).as("n_shared_fp"))
    val nGrams = df.select(col(idCol),
      greatest(length(col(textCol)) - k + 1, lit(0)).cast("long").as("n_grams"))
    nGrams.join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        coalesce(col("n_shared_fp"), lit(0L)).as("n_shared_fp"))
  }

  /** Copy-clusters from shared winnowing fingerprints — the grouping
    * that makes a train/val split LEAKAGE-SAFE: two docs are linked
    * when their selected-fingerprint overlap clears `minSharePpm` of
    * the SMALLER side's fingerprint count (asymmetric, so a chunk
    * pasted into a larger doc still links), and clusters are the
    * connected components of that link graph. Splitting by a hash of
    * the CLUSTER root then puts every copy-related doc on the same
    * side — per-doc hashing (q53) cannot do that for near-copies, and
    * splitting near-copies across train and eval is the classic
    * contamination bug.
    *
    * Scale shape: fingerprints shuffle as (fp, id) longs; candidate
    * pairs come from the postings self-join, whose fan-out is bounded
    * by dropping "stop fingerprints" selected by more than
    * `maxPostings` docs (a fingerprint every doc shares identifies
    * boilerplate, not copying — same move as the prefix filter's
    * rare-token ordering). The pair aggregation is a partial-agg
    * count; the component collapse is [[Graph.connectedComponents]]
    * (min-label + pointer doubling, O(log n) rounds). Nothing
    * text-sized crosses any exchange after the first scan.
    *
    * Returns one row per input doc: (idCol, cluster_root) —
    * singletons (including docs too short to fingerprint) root at
    * themselves.
    */
  def copyClusters(df: DataFrame, textCol: String, idCol: String,
                   k: Int = 8, w: Int = 4, minSharePpm: Long = 500000L,
                   maxPostings: Long = 64L): DataFrame = {
    require(minSharePpm >= 1, s"minSharePpm must be >= 1, got $minSharePpm")
    require(maxPostings >= 2, s"maxPostings must be >= 2, got $maxPostings")
    val sel = selectedFps(df, textCol, idCol, k, w)
      .transform(graft.core.Checkpoints.sessionCk) // feeds per-doc counts AND both pair sides
    val nf = sel.groupBy(col(idCol)).agg(count(lit(1)).as("__nfp"))
    val keep = sel.join(
      sel.groupBy(col("__fp")).agg(count(lit(1)).as("__posting")),
      Seq("__fp"))
      .where(col("__posting") <= maxPostings)
      .select(col("__fp"), col(idCol))
      .transform(graft.core.Checkpoints.sessionCk) // both sides of the pair self-join
    val ov = keep.select(col("__fp"), col(idCol).as("__x"))
      .join(keep.select(col("__fp"), col(idCol).as("__y")), Seq("__fp"))
      .where(col("__x") < col("__y"))
      .groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("__shared"))
    val edges = ov
      .join(nf.select(col(idCol).as("__x"), col("__nfp").as("__na")), Seq("__x"))
      .join(nf.select(col(idCol).as("__y"), col("__nfp").as("__nb")), Seq("__y"))
      .where(col("__shared") * lit(1000000L) >=
        lit(minSharePpm) * least(col("__na"), col("__nb")))
      .select(col("__x"), col("__y"))
    val comp = Graph.connectedComponents(edges, "__x", "__y")
    df.select(col(idCol))
      .join(comp.select(col("node").as(idCol), col("comp")), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("comp"), col(idCol)).as("cluster_root"))
  }
}
