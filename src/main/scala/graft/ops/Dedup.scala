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

  /** Exact duplicate groups: one row per distinct text with the keeper
    * id (min) and the duplicate count. Grouping key is xxhash64(text) so
    * the shuffle moves 8-byte keys; the text survives via `min` only for
    * the final (already-reduced) row.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"),
        min(col(textCol)).as(textCol))

  /** Keep one row per distinct `textCol` (the min-id row). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.join(df.groupBy(col(textCol)).agg(min(col(idCol)).as(idCol)),
      Seq(textCol, idCol), "left_semi")

  /** MinHash signature: for each of `numHashes` seeded hash families,
    * the minimum xxhash64 over the document's shingles.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, sh => xxhash64(i, sh))))

  /** LSH band keys from a signature: `bands` hashes of `rowsPerBand`
    * consecutive signature slots. Docs sharing any band key are
    * candidate near-duplicates.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, concat_ws(",",
        transform(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")))))

  /** Full MinHash-LSH near-dup pipeline: shingle → minhash → band →
    * bucket self-join → exact-Jaccard verification at `threshold`.
    * Returns candidate pairs (id_a < id_b) with their exact Jaccard.
    */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      shingleN: Int = 3, numHashes: Int = 32,
                      bands: Int = 8, threshold: Double = 0.6): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sh = df.select(col(idCol), col(textCol),
      TextAnalysis.charNgrams(col(textCol), shingleN).as("__sh"))
    val banded = sh
      .withColumn("__band", explode(
        lshBandKeys(minhashSignature(col("__sh"), numHashes), bands, rowsPerBand)))
      .select(col(idCol), col("__sh"), col("__band"))
    val a = banded.select(col("__band"), col(idCol).as("id_a"), col("__sh").as("__sh_a"))
    val b = banded.select(col("__band"), col(idCol).as("id_b"), col("__sh").as("__sh_b"))
    a.join(b, Seq("__band"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextAnalysis.jaccard(col("__sh_a"), col("__sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** SimHash 64-bit fingerprint over token hashes: per bit, the sign of
    * the ±1 vote sum across tokens. Implemented with explode + 64
    * conditional sums (pure codegen aggregation, one shuffle on id).
    */
  def simhash(df: DataFrame, textCol: String, idCol: String,
              out: String = "simhash"): DataFrame = {
    val tok = df.select(col(idCol),
      explode_outer(TextAnalysis.tokens(col(textCol))).as("__t"))
      .withColumn("__h", xxhash64(col("__t")))
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
}
