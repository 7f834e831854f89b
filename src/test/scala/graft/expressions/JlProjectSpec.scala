package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The native JL projection must equal the retired composable
  * formulation (posexplode → md5 sign per (element, output) →
  * 16 conditional sums — the form the DuckDB oracle mirrors) bit for
  * bit, including the row-absence and null-sum edge shapes.
  */
class JlProjectSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-17 jlProject dataflow — kept VERBATIM. */
  private def reference(df: DataFrame, vecCol: String, idCol: String,
                        k: Int): DataFrame = {
    val asD = col(vecCol).cast("array<double>")
    val q = df.select(col(idCol), posexplode(asD).as(Seq("__j", "__x")))
      .select(col(idCol), col("__j"),
        floor(col("__x") * 1000000.0).cast("long").as("__xq"))
    val sums = (0 until k).map { kk =>
      val bit = conv(substring(
        md5(concat(col("__j").cast("string"), lit(s"_$kk"))), 1, 8), 16, 10)
        .cast("long") % 2
      sum(when(bit === 0, col("__xq")).otherwise(-col("__xq"))).as(s"proj_$kk")
    }
    q.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
  }

  private def byId(df: DataFrame): Map[Long, Row] =
    df.collect().map(r => r.getLong(0) -> r).toMap

  private def assertSame(docs: DataFrame, k: Int): Unit = {
    val got = byId(graft.ops.VectorOps.jlProject(docs, "embedding", "id", k))
    val want = byId(reference(docs, "embedding", "id", k))
    assert(got.keySet == want.keySet,
      s"row sets differ: only-native=${got.keySet -- want.keySet} " +
        s"only-reference=${want.keySet -- got.keySet}")
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"id=$id native=${got(id)} reference=$w")
    }
  }

  test("native projection equals the md5-sign aggregate on random vectors") {
    val rnd = new scala.util.Random(61)
    val docs = (1L to 60L).map { i =>
      val dim = Seq(0, 1, 3, 16, 64, 70)(rnd.nextInt(6))
      (i, (0 until dim).map(_ => (rnd.nextDouble() * 4 - 2).toFloat))
    }.toDF("id", "embedding")
    for (k <- Seq(1, 16)) assertSame(docs, k)
  }

  test("edge shapes: null array, empty array, null elements, negatives") {
    val docs = Seq[(Long, Seq[java.lang.Float])](
      (1L, null), // no exploded rows → no output row
      (2L, Seq.empty), // same
      (3L, Seq(null, null)), // rows exist, all sums NULL
      (4L, Seq(1.25f, null, -0.75f)), // nulls skipped inside sums
      (5L, Seq(-0.0000005f)) // floor of a negative tiny value → -1
    ).toDF("id", "embedding")
    assertSame(docs, 16)
    val ids = graft.ops.VectorOps.jlProject(docs, "embedding", "id", 16)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(3L, 4L, 5L))
    val r3 = byId(graft.ops.VectorOps.jlProject(docs, "embedding", "id", 16))(3L)
    (1 to 16).foreach(i => assert(r3.isNullAt(i), s"proj_${i - 1} of all-null row"))
  }
}
