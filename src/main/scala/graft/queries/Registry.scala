package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central query registry backing SparkEntry: every implemented operator
  * from SURVEY.md §2 (plus the large-scale training-data ops) appears
  * here as a named query over the driver's TPC-H-ish tables, paired —
  * when SQL-expressible — with a DuckDB oracle that must hash-match.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[Q] =
    Relational.qs ++ TextQueries.qs ++ SimilarityQueries.qs ++
      ModelQueries.qs ++ CurationQueries.qs ++ QualityQueries.qs ++
      WebCurationQueries.qs ++ PipelineQueries.qs ++ IndexQueries.qs ++
      WebTextQueries.qs ++ GovernanceQueries.qs

  /** Bench action: write to Spark's `noop` sink, which evaluates EVERY
    * output column of every row and discards the bytes — the cost model
    * of a real consumer, with no filesystem cost polluting the timing.
    *
    * History: rounds ≤ 12 used `count()` with a hand-maintained
    * `materialize` tag routing five known scan-shaped rows to the noop
    * sink. Round 13's structural audit (BenchActionSpec's detector run
    * over the whole registry) showed the voided-work class was far
    * wider than the tag: count() erases windows whose output is unused
    * (rolling/rank suites), eliminates unique-key joins (the rewritten
    * sentence-dedup keep join — the operator under measurement never
    * ran), collapses second-stage aggregates, and reduces ~20 pure
    * projection rows (deflate, PII regexes, HRW hashing) to bare scans.
    * Hand-tagging 60+ rows would leave the same silent hole for the
    * next query; materializing everything closes the class BY
    * CONSTRUCTION. Cross-round note: BENCH_r13 re-bases the board —
    * rows whose work count() used to void rise to their honest cost
    * (protocol-stamped in the artifact; deltas tabled in PLANS.md).
    */
  def consume(name: String, df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
