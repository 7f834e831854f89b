package graft.plans

import graft.SparkSpec
import graft.ops.Joins
import org.apache.spark.sql.functions._

/** The native as-of join operator (logical node → strategy → physical
  * merge): plan shape, exact semantics on hand-built edges, and
  * equality with the compositional window form on random data.
  */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  new graft.GraftExtensions().registerOn(spark)

  test("edge semantics: latest match, ties included, no-match nulls") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "a", ts("2024-01-01 09:00:00")),
      (3L, "b", ts("2024-01-01 10:00:00")),
      (4L, "c", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (101L, "a", ts("2024-01-01 09:30:00")),
      (102L, "a", ts("2024-01-01 10:00:00")), // tie with left id=1 → match
      (103L, "a", ts("2024-01-01 10:30:00")), // future → never matches
      (201L, "b", ts("2024-01-01 11:00:00"))).toDF("rid", "rk", "rt")
    // keys named differently on the right: rename to share the key name
    val out2 = Joins.asofJoinNative(left,
      right.withColumnRenamed("rk", "k"), Seq("k"), "t", "rt")
    val got = out2.select($"id", $"rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == Map(1L -> 102L, 2L -> -1L, 3L -> -1L, 4L -> -1L))
    assert(out2.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("null keys and null times never match") {
    val left = Seq(
      (1L, Option("a"), Option(ts("2024-01-01 10:00:00"))),
      (2L, None: Option[String], Option(ts("2024-01-01 10:00:00"))),
      (3L, Option("a"), None: Option[java.sql.Timestamp]))
      .toDF("id", "k", "t")
    val right = Seq(
      (101L, Option("a"), Option(ts("2024-01-01 09:00:00"))),
      (102L, None: Option[String], Option(ts("2024-01-01 09:00:00"))),
      (103L, Option("a"), None: Option[java.sql.Timestamp]))
      .toDF("rid", "k", "rt")
    val got = Joins.asofJoinNative(left, right, Seq("k"), "t", "rt")
      .select($"id", $"rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == Map(1L -> 101L, 2L -> -1L, 3L -> -1L))
  }

  test("matches the compositional window form on random data") {
    val rng = new scala.util.Random(11)
    def t(d: Int, m: Int) = ts(f"2024-01-$d%02d ${m / 60}%02d:${m % 60}%02d:00")
    val purchases = (1 to 300).map { i =>
      (i.toLong, s"u${rng.nextInt(20)}", t(1 + rng.nextInt(27), rng.nextInt(1440)))
    }.toDF("event_id", "user", "ts")
    // unique (user, vts) per row index so the asof survivor is unique
    val views = (1 to 500).map { i =>
      (1000L + i, s"u${rng.nextInt(25)}", t(1 + i % 27, i % 1440))
    }.toSeq.distinct.toDF("view_id", "user", "vts")
      .dropDuplicates("user", "vts")
    val comp = Joins.asofJoin(purchases, views, Seq("user"),
        leftTs = "ts", rightTs = "vts", payload = Seq("view_id"))
      .select($"event_id", $"asof_view_id".as("m"))
    val native = Joins.asofJoinNative(purchases, views, Seq("user"), "ts", "vts")
      .select($"event_id", $"view_id".as("m"))
    assert(rows(comp) == rows(native))
    // some matched, some not — the comparison is not vacuous
    assert(native.where($"m".isNotNull).count() > 50)
    assert(native.where($"m".isNull).count() > 0)
    assert(native.count() == 300)
  }

  test("cross-partition merge: repartitioned inputs still merge per key") {
    val left = (1 to 100).map(i =>
      (i.toLong, s"k${i % 7}", ts(f"2024-01-01 ${i % 24}%02d:00:00")))
      .toDF("id", "k", "t").repartition(13)
    val right = (1 to 80).map(i =>
      (500L + i, s"k${i % 9}", ts(f"2024-01-01 ${i % 24}%02d:00:00")))
      .toDF("rid", "k", "rt").repartition(5)
    val native = Joins.asofJoinNative(left, right, Seq("k"), "t", "rt")
      .select($"id", $"rid".as("m"))
    val comp = Joins.asofJoin(left,
        right.withColumnRenamed("rid", "view_id"), Seq("k"),
        leftTs = "t", rightTs = "rt", payload = Seq("view_id"))
      .select($"id", $"asof_view_id".as("m"))
    assert(rows(native) == rows(comp))
  }
}
