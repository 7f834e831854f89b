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

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
