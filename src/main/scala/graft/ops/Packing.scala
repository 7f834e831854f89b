package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-window assembly: the two shapes every LLM data pipeline runs
  * between curation and the trainer — overlapping token-window chunking
  * (retrieval/eval windows with provenance) and concat-and-chunk
  * sequence packing (fill fixed context-length sequences with no
  * padding waste; the GPT-style "concatenate the corpus in a
  * deterministic order, cut every maxTokens" policy).
  *
  * Both are exact integer/string operations — no floats, no RNG — so
  * they sit fully under the DuckDB hash oracle (q171/q172).
  *
  * Scale posture:
  *  - [[chunkWindows]] is a pure per-row scan → explode: zero shuffles,
  *    embarrassingly parallel at any corpus size.
  *  - [[packSequences]] needs a GLOBAL prefix sum over the pack order —
  *    the classic scale-killer if written as `sum() OVER (ORDER BY ...)`
  *    (Spark plans that as a single-partition window: one task owns
  *    100 TB). It rides [[Windows.globalRunningSum]]'s two-phase
  *    range-partitioned form instead: the only serial step is over
  *    #partitions rows. Pack ids are BIGINT arithmetic on token
  *    cumulative positions — bit-identical across engines and across
  *    re-runs (the order key is the unique doc id, not partition luck).
  */
object Packing {

  /** Exact integer division for non-negative longs via double division
    * (exact while quotient < 2^53: a 100 TB corpus is ~2×10^13 tokens,
    * 400× inside the bound).
    */
  private def idiv(c: Column, n: Long): Column =
    floor(c / lit(n.toDouble)).cast("long")

  /** Overlapping token windows over each document: window `windowTokens`
    * tokens, advancing `windowTokens - overlapTokens` per chunk, last
    * chunk short. Emits (id, chunk_id, tok_start, n_chunk_tokens,
    * chunk_text) with full provenance; token = whitespace token (the
    * engine-wide convention, TextAnalysis.tokens). Token-empty documents
    * produce no chunks.
    */
  def chunkWindows(df: DataFrame, textCol: String, idCol: String,
                   windowTokens: Int, overlapTokens: Int): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be > 0, got $windowTokens")
    require(overlapTokens >= 0 && overlapTokens < windowTokens,
      s"need 0 <= overlapTokens < windowTokens, got $overlapTokens")
    val stride = windowTokens - overlapTokens
    // trim-empty guard, not size>0: split(trim(""), "\\s+") is [""], a
    // phantom single token — the same convention the oracle replays
    val toks = df.where(length(trim(col(textCol))) > 0)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
    toks
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__n") - 1, lit(stride))).as("__start"))
      .select(col(idCol),
        (col("__start") / stride).cast("int").as("chunk_id"),
        col("__start").cast("int").as("tok_start"),
        least(lit(windowTokens), col("__n") - col("__start")).cast("int")
          .as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(windowTokens)),
          " ").as("chunk_text"))
  }

  /** Concat-and-chunk sequence packing: documents are concatenated in
    * ascending `idCol` order and the token stream is cut every
    * `maxTokens`; a document may span packs. Emits one row per
    * (document, pack) incidence: (pack_id, id, tok_start — offset of the
    * slice within the DOCUMENT, n_pack_tokens, pack_offset — position of
    * the slice within the PACK). Every pack except the last is exactly
    * full — zero padding waste, the property this policy exists for.
    * Token-empty documents are dropped (they occupy no stream positions).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    maxTokens: Long): DataFrame = {
    val counted = df.where(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__n"))
    packCounted(counted, idCol, "__n", maxTokens)
      .select(col("pack_id"), col(idCol), col("tok_start"),
        col("n_pack_tokens"), col("pack_offset"))
  }

  /** [[packSequences]] over PRE-COUNTED units: one input row per unit
    * with a positive token count in `nCol` and a globally-unique
    * numeric order key in `orderCol` (the concatenation order). All
    * other input columns ride through to the emitted segments — the
    * form a composed pipeline needs when a unit is not a bare document
    * (an epoch-mixed (id, copy) pair, a conversation, a chunk) and its
    * text/count was already computed upstream. Same two-phase
    * range-partitioned prefix sum as [[packSequences]]; same output
    * segment math.
    */
  def packCounted(df: DataFrame, orderCol: String, nCol: String,
                  maxTokens: Long): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be > 0, got $maxTokens")
    val keep = df.columns.map(col)
    val cum = Windows.globalRunningSum(df, orderCol, nCol, "__ca")
      .withColumn("__cb", col("__ca") - col(nCol))
    cum
      .select(keep :+ col("__cb") :+
        explode(sequence(idiv(col("__cb"), maxTokens),
          idiv(col("__ca") - 1, maxTokens))).as("pack_id"): _*)
      .withColumn("__ts", greatest(col("pack_id") * maxTokens - col("__cb"), lit(0L)))
      .select(keep :+ col("pack_id") :+
        col("__ts").as("tok_start") :+
        (least((col("pack_id") + 1) * maxTokens - col("__cb"), col(nCol)) -
          col("__ts")).as("n_pack_tokens") :+
        (col("__cb") + col("__ts") - col("pack_id") * maxTokens).as("pack_offset"): _*)
  }
}
