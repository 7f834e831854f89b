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
    require(salts > 0, s"salts must be positive, got $salts")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(innerAggs.head, innerAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(outerAggs.head, outerAggs.tail: _*)
  }

  /** Salted skew JOIN: the skewed fact side gets a deterministic salt
    * in [0, salts); the dimension side replicates `salts`× so every
    * (key, salt) bucket finds its match — one hot key spreads over
    * `salts` reducers at the cost of a `salts`× blow-up of the SMALL
    * side only. AQE's runtime skew split is preferred when sizes are
    * discoverable; this is the explicit form for KNOWN pathological
    * keys (a null/default sensor id, a boilerplate document hash) and
    * for sort-merge joins AQE declines to split. Equi-keys; inner or
    * left ('big' side preserved) semantics.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    require(salts > 0, s"salts must be positive, got $salts")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
