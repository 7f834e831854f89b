package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed inverted-index construction with champion lists — the
  * retrieval-side counterpart of the BM25 scorer ([[TextAnalysis.bm25]]):
  * per term, document frequency, collection frequency, and the top-k
  * postings by term frequency ("champion lists" / impact-ordered index
  * pruning, Manning et al., IIR §7.1.3) serialized in rank order.
  *
  * Scale shape: the term-frequency table shuffles once keyed by
  * (term, doc) behind a partial-agg pair; both downstream consumers
  * (term stats, champion selection) re-key by term. Champion selection
  * is the two-phase sharded top-k ([[Sampling.weightedSample]]'s
  * pattern): a per-(term, doc-shard) local prune bounds any one task's
  * window state even for stopword-grade terms whose full postings list
  * is corpus-sized, then the global top-k runs over ≤ shards·k
  * survivors per term. Top-k of a union of local top-ks is the global
  * top-k, so the result is bit-identical to the naive single window the
  * oracle runs.
  */
object InvertedIndex {

  /** Champion-list index over whitespace tokens of `textCol` (lowercased,
    * empty tokens dropped): one row per term with `df`, `cf`, and
    * `postings` = "doc:tf,doc:tf,…" ordered by (tf desc, doc asc),
    * capped at `k` entries. Terms with df < `minDf` are dropped.
    */
  def champion(df: DataFrame, textCol: Column, idCol: Column,
               k: Int, minDf: Long = 1L, shards: Int = 32): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = df
      .select(idCol.as("__doc"),
        explode(TextAnalysis.tokens(lower(textCol))).as("__t"))
      .where(length(col("__t")) > 0)
      .groupBy(col("__t"), col("__doc"))
      .agg(count(lit(1)).as("__tf"))
    val stats = tf.groupBy(col("__t"))
      .agg(count(lit(1)).as("df"), sum(col("__tf")).as("cf"))
      .where(col("df") >= minDf)
    val local = tf
      .withColumn("__shard", pmod(xxhash64(col("__doc")), lit(shards.toLong)))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("__t"), col("__shard"))
          .orderBy(col("__tf").desc, col("__doc").asc)))
      .where(col("__r") <= k)
    val champions = local
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__t"))
          .orderBy(col("__tf").desc, col("__doc").asc)))
      .where(col("__rn") <= k)
      .groupBy(col("__t"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__rn"),
          concat(col("__doc").cast("string"), lit(":"),
            col("__tf").cast("string")).as("__p")))),
        e => e.getField("__p")), ",").as("postings"))
    // both sides arrive hash-partitioned on the term key from their own
    // aggregations, so the join itself adds no exchange
    stats.join(champions, Seq("__t"))
      .select(col("__t").as("term"), col("df"), col("cf"), col("postings"))
  }
}
