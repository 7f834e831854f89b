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
    oracle: Option[String],
    // Scan-shaped rows whose REAL cost lives in the output projection:
    // under a count() bench action Catalyst prunes every unused column
    // (correct at any scale — a count-shaped consumer never pays for
    // unused work), so their board rows measured the scan, not the
    // operator (q71's dedup subtree, q176's backoff join, q180's doc
    // leg, q183/q185's normalize/repair projections — three rounds of
    // bench-honesty notes). Tagged rows get a fully-materializing
    // action instead (round-11 verdict ask #1).
    materialize: Boolean = false)

object Registry {
  def all: Seq[Q] =
    Relational.qs ++ TextQueries.qs ++ SimilarityQueries.qs ++
      ModelQueries.qs ++ CurationQueries.qs ++ QualityQueries.qs ++
      WebCurationQueries.qs ++ PipelineQueries.qs ++ IndexQueries.qs ++
      WebTextQueries.qs ++ GovernanceQueries.qs

  /** Names of the scan-shaped rows benched with the materializing
    * action (see [[Q.materialize]]). */
  lazy val materialized: Set[String] =
    all.collect { case q if q.materialize => q.name }.toSet

  /** Bench action: consume a query's result the way its cost model
    * demands. Default `count()` (comparable across rounds, and for
    * agg/join-shaped plans the aggregation itself is the cost);
    * tagged scan-shaped rows instead write to Spark's `noop` sink,
    * which evaluates EVERY output column of every row and discards
    * the bytes — count-elimination cannot void the operator's work,
    * and no filesystem cost pollutes the timing. */
  def consume(name: String, df: DataFrame): Unit =
    if (materialized(name)) df.write.format("noop").mode("overwrite").save()
    else df.count(): Unit

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql), _) => n -> sql }.toMap
}
