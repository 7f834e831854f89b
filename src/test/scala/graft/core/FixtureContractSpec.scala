package graft.core

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Pins the NORMALIZED schema `Tables.load` presents for every driver
  * fixture table — the contract the whole query registry compiles
  * against.
  *
  * Motivation (round 8): a fixture regeneration silently changed
  * events.ts from TIMESTAMP(NANOS) to TIMESTAMP(MICROS), which broke 39
  * events-backed queries with a cryptic per-query analysis error each.
  * This spec turns the next physical-encoding drift into ONE loud,
  * named failure at the reader boundary. It asserts the post-normalize
  * logical types (what operators actually see), not the parquet
  * physical encoding (which the driver may legitimately change).
  */
class FixtureContractSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def typesOf(name: String): Map[String, DataType] =
    Tables.load(spark, dir, name).schema.fields
      .map(f => f.name -> f.dataType).toMap

  test("events: ts normalizes to TimestampType under any fixture encoding") {
    val t = typesOf("events")
    assert(t("ts") == TimestampType,
      s"events.ts must normalize to TimestampType, got ${t("ts")} — " +
        "if the fixture encoding changed again, extend Tables.events")
    assert(t("event_type") == StringType && t("user_id") == LongType)
  }

  test("events: the TIMESTAMP(NANOS) legacy branch still decodes (committed fixture)") {
    // the regenerated driver fixtures dropped the nanos encoding, which
    // would leave Tables.events' nanos-as-long branch dead-untested;
    // this committed 3-row parquet (timestamp[ns]) keeps it covered
    val tmp = java.nio.file.Files.createTempDirectory("nanos_fixture")
    val res = getClass.getResourceAsStream("/events_nanos.parquet")
    assert(res != null, "events_nanos.parquet test resource missing")
    java.nio.file.Files.copy(res, tmp.resolve("events.parquet"))
    val e = Tables.events(spark, tmp.toString)
    assert(e.schema("ts").dataType == TimestampType)
    val ts = e.orderBy("user_id").select("ts").collect()
      .map(_.getTimestamp(0).toInstant.toString)
    // nanos truncate to µs: ...000000001ns → ...000000µs, ...123456789ns → ...123456µs
    assert(ts.toSeq == Seq("2023-11-14T22:13:20Z", "2023-11-14T22:13:20.123456Z",
      "2023-11-14T23:13:20.999999Z"), ts.toSeq.toString)
  }

  test("documents: id/text/lang columns keep their contracted types") {
    val t = typesOf("documents")
    assert(t("doc_id") == LongType && t("text") == StringType &&
      t("lang") == StringType && t("source") == StringType &&
      t("n_chars") == LongType, s"documents drifted: $t")
  }

  test("embeddings: vector column stays array<float>") {
    val t = typesOf("embeddings")
    assert(t("vec_id") == LongType, s"embeddings drifted: $t")
    assert(t("embedding") == ArrayType(FloatType, containsNull = true) ||
      t("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding must be array<float>, got ${t("embedding")}")
  }

  test("TPC-H tables: key/date/measure types hold") {
    val l = typesOf("lineitem")
    assert(l("l_orderkey") == LongType && l("l_quantity") == DoubleType,
      s"lineitem drifted: $l")
    assert(l("l_shipdate").isInstanceOf[TimestampType.type] ||
      l("l_shipdate").isInstanceOf[TimestampNTZType.type] ||
      l("l_shipdate") == DateType,
      s"l_shipdate must stay date-ordered comparable, got ${l("l_shipdate")}")
    val o = typesOf("orders")
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType &&
      o("o_totalprice") == DoubleType, s"orders drifted: $o")
    val p = typesOf("part")
    assert(p("p_partkey") == LongType && p("p_name") == StringType,
      s"part drifted: $p")
    Seq("region", "nation", "customer", "supplier").foreach { n =>
      assert(Tables.exists(dir, n), s"fixture table $n missing")
    }
  }
}
