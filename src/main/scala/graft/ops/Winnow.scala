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
  def fingerprints(df: DataFrame, textCol: String, idCol: String,
                   k: Int = 8, w: Int = 4): DataFrame = {
    require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")
    import org.apache.spark.sql.expressions.Window
    val grams = df
      .select(col(idCol),
        explode(when(length(col(textCol)) >= k,
          sequence(lit(1), length(col(textCol)) - k + 1))
          .otherwise(array().cast("array<int>"))).as("__p"),
        col(textCol))
      .select(col(idCol), col("__p"),
        // md5 → first 8 hex chars → BIGINT: portable across engines
        conv(substring(md5(col(textCol).substr(col("__p"), lit(k))), 1, 8), 16, 10)
          .cast("long").as("__h"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("__p"))
      .rowsBetween(Window.currentRow, w - 1)
    val nPos = Window.partitionBy(col(idCol))
    val selected = grams
      .withColumn("__wmin", min(col("__h")).over(win))
      .withColumn("__npos", count(lit(1)).over(nPos))
      // only full windows select (pos ≤ P − w + 1); short docs with
      // 0 < P < w still select their single global min (standard
      // degenerate-case handling: the whole doc is one window)
      .where(col("__p") <= greatest(col("__npos") - w + 1, lit(1)))
      .select(col(idCol), col("__wmin").as("__fp"))
      .distinct()
    val sharing = selected.groupBy(col("__fp"))
      .agg(countDistinct(col(idCol)).as("__ndocs"))
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
}
