package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement — Efraimidis & Spirakis 2006
  * ("Weighted random sampling with a reservoir", IPL 97(5)): each row
  * draws key = −ln(u)/w (an Exp(w) variate); the k smallest keys per
  * group are a weighted sample without replacement.
  *
  * Determinism: u comes from the first 8 hex chars of
  * md5(id ‖ salt) — the [[TextAnalysis.hashBucket]] family — mapped to
  * the exact dyadic rational (v + 0.5) / 2^32 ∈ (0,1). No RNG state:
  * the sample is stable under re-runs, repartitioning, AND engine
  * migration (md5 and IEEE division agree everywhere; ln is the one
  * correctly-rounded-modulo-1ulp step, and keys are far apart with
  * probability 1). Changing the salt draws an independent sample.
  *
  * Scale shape: a group is often low-cardinality (languages, sources),
  * and a single `row_number` window over it funnels the whole corpus
  * through one task. The selection therefore runs in two phases:
  * per-(group, shard) local top-k over `shards` hash shards — parallel,
  * bounded state — then a global top-k over the ≤ shards·k survivors
  * per group. Top-k of the union of local top-ks IS the global top-k,
  * so the answer is bit-identical to the naive single window (which is
  * what the oracle runs).
  */
object Sampling {

  /** `k` rows per `groupCol`, P(row) ∝ `weightCol` (≥ 1 enforced),
    * without replacement; emits `rank` (1-based selection order — the
    * A-ES key order) alongside the input columns.
    */
  def weightedSample(df: DataFrame, groupCol: Column, weightCol: Column,
                     idCol: Column, k: Int, salt: String = "",
                     shards: Int = 32): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(shards > 0, s"shards must be positive, got $shards")
    val v = conv(substring(md5(concat(idCol.cast("string"), lit(salt))), 1, 8),
      16, 10).cast("long")
    val u = (v.cast("double") + 0.5) / 4294967296.0
    val key = -log(u) / greatest(weightCol, lit(1L)).cast("double")
    val keyed = df.withColumn("__key", key)
    val local = keyed
      .withColumn("__shard", pmod(xxhash64(idCol), lit(shards.toLong)))
      .withColumn("__r", row_number().over(
        Window.partitionBy(groupCol, col("__shard"))
          .orderBy(col("__key").asc, idCol.asc)))
      .where(col("__r") <= k)
      .drop("__r", "__shard")
    local
      .withColumn("rank", row_number().over(
        Window.partitionBy(groupCol).orderBy(col("__key").asc, idCol.asc)))
      .where(col("rank") <= k)
      .drop("__key")
  }
}
