package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level overlap estimation: the bottom-k sketch (Cohen &
  * Kaplan 2007, "Summarizing data using bottom-k sketches") over a
  * deterministic hash of the corpus vocabulary, with the exact Jaccard
  * computed alongside as ground truth — the "how much does snapshot B
  * share with snapshot A" question answered at sketch cost, plus the
  * audit row that proves the sketch's accuracy on this corpus.
  *
  * Determinism: ranks come from md5(token) (term asc tiebreak), so the
  * sampled vocabulary — and therefore every output number — is stable
  * across runs, partitionings, and engines. Exact integer arithmetic
  * (ppm via BIGINT floor-div on non-negative operands) keeps the
  * estimate itself oracle-comparable, not just the counts.
  *
  * Scale shape: one vocabulary aggregation (token-keyed shuffle behind
  * a partial-agg pair, carrying two booleans per distinct token); the
  * global bottom-max(k) selection is two-phase — per-shard local top-k
  * windows, then one window over ≤ shards·max(k) survivors — so no
  * task ever sorts the full vocabulary. The exact counts reuse the
  * same vocabulary aggregate. Membership flags ride as booleans, never
  * as per-corpus row copies.
  */
object CorpusOverlap {

  /** Bottom-k overlap of `tokenCol` vocabularies between the two values
    * of binary `corpusCol` (labels 'a' and 'b'): one row per k in `ks`
    * with the sampled union size, the sampled intersection size, the
    * sketch estimate est_ppm = n_both·10⁶ div n_sampled, and the exact
    * exact_ppm = |A∩B|·10⁶ div |A∪B| for comparison.
    */
  def bottomKOverlap(df: DataFrame, corpusCol: Column, tokenCol: Column,
                     ks: Seq[Int], shards: Int = 32): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), s"ks must be positive, got $ks")
    val kMax = ks.max
    val spark = df.sparkSession
    val flags = df
      .select(corpusCol.as("__c"), tokenCol.as("__t"))
      .groupBy(col("__t"))
      .agg(max(col("__c") === "a").as("in_a"),
        max(col("__c") === "b").as("in_b"))
    // tiny exact rollup (one row), referenced once per k — pin it
    val exact = flags.agg(
      count(lit(1)).as("__n_union"),
      count_if(col("in_a") && col("in_b")).as("__n_both_tot"))
    val local = flags
      .withColumn("__h", md5(col("__t")))
      .withColumn("__shard", pmod(xxhash64(col("__t")), lit(shards.toLong)))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("__shard"))
          .orderBy(col("__h").asc, col("__t").asc)))
      .where(col("__r") <= kMax)
    val ranked = local
      .withColumn("__rn", row_number().over(
        Window.orderBy(col("__h").asc, col("__t").asc)))
      .where(col("__rn") <= kMax)
    import spark.implicits._
    val kDf = ks.toDF("k")
    ranked.join(broadcast(kDf), col("__rn") <= col("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_sampled"),
        count_if(col("in_a") && col("in_b")).as("n_both"))
      .crossJoin(broadcast(exact))
      .select(col("k"), col("n_sampled"), col("n_both"),
        expr("n_both * 1000000 div n_sampled").as("est_ppm"),
        expr("__n_both_tot * 1000000 div __n_union").as("exact_ppm"))
  }
}
