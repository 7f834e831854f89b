package graft.ops

import graft.expressions.BloomExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Cross-corpus membership — "have we trained on this before?"
  *
  * The canonical decontamination / incremental-ingest primitive: given a
  * reference corpus of already-seen keys (a benchmark set, a previous
  * training snapshot), flag which rows of a new corpus were seen.
  * Reference behavior: the pipeline's dedup-against-warehouse reads
  * (anti-join of fresh sensor days against already-loaded dates,
  * `_pull_data.R`); generalized here to content keys at LLM-data scale.
  *
  * Two paths, both shuffle-lean:
  *  - EXACT (`markSeen`): distinct seen keys ⟕ probe keys. Both sides
  *    reduce to their key columns before the exchange, so the shuffle
  *    carries hashes, never documents. The right answer when the seen
  *    set is itself 100 TB-scale.
  *  - SKETCH (`bloomOfKeys` + `seenBloom`): one distributed aggregation
  *    pass builds a Bloom filter over the seen keys (mergeable partials,
  *    driver holds only the final ~1.2 MB/M-key sketch), then the probe
  *    is a map-side codegen'd expression — ZERO shuffle on the probe
  *    corpus. No false negatives; `fpp` false positives. The right
  *    answer when seen-keys fit a few GB of bits (≲ billions of keys)
  *    and the probe side is the big one.
  */
object Membership {

  /** Flag each probe row with whether `key` appears in `seen`'s
    * `seenKey` set (exact, NULL-safe: NULL keys are never seen).
    */
  def markSeen(probe: DataFrame, seen: DataFrame, key: Column,
               seenKey: Column, flag: String = "seen"): DataFrame = {
    val keys = seen.select(seenKey.as("__seen_k")).where(col("__seen_k").isNotNull).distinct()
    probe.join(keys, key === col("__seen_k"), "left")
      .withColumn(flag, col("__seen_k").isNotNull)
      .drop("__seen_k")
  }

  /** Build a Bloom filter over xxhash64(`key`) of the seen corpus.
    * Distributed build (tree-aggregated partials); only the final
    * sketch reaches the driver.
    */
  def bloomOfKeys(seen: DataFrame, key: Column,
                  expectedItems: Long, fpp: Double = 0.01): BloomFilter = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    seen.select(xxhash64(key).as("__h")).stat.bloomFilter("__h", expectedItems, fpp)
  }

  /** Map-side membership probe against a [[bloomOfKeys]] sketch. */
  def seenBloom(key: Column, bloom: BloomFilter): Column =
    BloomExprs.mightContain(xxhash64(key), bloom)
}
