package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §7 risk 6). AQE's skew-join splitting
  * handles join skew at runtime; for AGGREGATION skew — one giant group
  * swamping a reducer — the standard fix is two-phase salted
  * aggregation: hash-partial on (key, salt), then final on key. Only
  * additive/mergeable aggregates compose this way, so the caller
  * supplies both phases.
  */
object Skew {

  /** Two-phase salted aggregation: partial `innerAggs` on
    * (keys, salt 0..salts-1), final `outerAggs` on keys. The salt is
    * derived from a hash of the whole row (deterministic, no RNG) so
    * repeated runs shuffle identically.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                innerAggs: Seq[Column], outerAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(innerAggs.head, innerAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(outerAggs.head, outerAggs.tail: _*)
  }
}
