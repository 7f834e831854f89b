package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.types.TimestampType

/** Guards on the driver-facing contract: the registry is the surface
  * the driver smoke/correctness/bench gates consume.
  */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and well-formed") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(names.forall(_.matches("q\\d+[a-z]?_[a-z0-9_]+")), "bad name shape")
  }

  test("every oracle key has a query; no orphaned SQL") {
    val qNames = Registry.queries.keySet
    val oNames = Registry.oracleSql.keySet
    assert(oNames.subsetOf(qNames), s"orphans: ${oNames -- qNames}")
  }

  test("oracle SQL references only fixture tables that exist") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    Registry.oracleSql.foreach { case (name, sql) =>
      // crude but effective: any FROM/JOIN word must be a known table,
      // a CTE defined in the query, or a derived-table paren
      // CTE names, with or without a column list or materialization
      // hint: `x AS (` / `x(a, b) AS (` / `x AS MATERIALIZED (`
      val ctes = "(?i)(\\w+)\\s*(?:\\([^)]*\\))?\\s+AS\\s*(?:MATERIALIZED\\s*)?\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = "(?i)(?<!DISTINCT )\\b(?:FROM|JOIN)\\b\\s+([a-z_][a-z0-9_]*)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- tables.toSet -- ctes - "read_parquet"
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }

  test("events source: parquet timestamps surface as timestamps") {
    // the fixture's events.parquet has shipped as both TIMESTAMP(NANOS)
    // (vectorized reader rejects it) and TIMESTAMP(MICROS)/NTZ across
    // generations — Tables.events normalizes either to µs TimestampType
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    assert(e.schema("ts").dataType == TimestampType)
    assert(e.count() == 1000)
  }

  test("entry() runs against the smoke fixture with rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
