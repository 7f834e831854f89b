package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-15 deterministic-accumulation primitive: rounding contract
  * (column twin == driver twin, half-away-from-zero), the saturation
  * guard, and the property the whole flip rests on — fixed-point Lloyd
  * is BIT-IDENTICAL across partitionings, where the float path is not
  * even guaranteed stable between two runs.
  */
class FixedPointSpec extends SparkSpec {

  test("column quantize and driver quantizeD agree, half-away-from-zero") {
    import spark.implicits._
    val xs = Seq(0.0, -0.0, 1.2345645, -1.2345645, 0.00000049, -0.00000049,
      0.0000005, -0.0000005, 2.5e-6, -2.5e-6, 123.456789, -987.654321)
    val fromPlan = xs.toDF("x")
      .select(FixedPoint.quantize(col("x"), FixedPoint.RowScale).as("q"))
      .collect().map(_.getLong(0))
    val fromDriver = xs.map(FixedPoint.quantizeD(_, FixedPoint.RowScale))
    assert(fromPlan.toSeq == fromDriver,
      s"plan/driver rounding split: ${fromPlan.toSeq} vs $fromDriver")
    // half-away semantics pinned (DuckDB round parity, Numeric scaladoc):
    // +0.5 ulp-of-scale rounds away from zero on BOTH signs
    assert(FixedPoint.quantizeD(0.0000005, 1e6) == 1L)
    assert(FixedPoint.quantizeD(-0.0000005, 1e6) == -1L)
    assert(FixedPoint.quantizeD(0.00000049, 1e6) == 0L)
    assert(FixedPoint.quantizeD(-0.00000049, 1e6) == 0L)
  }

  test("normalizeQ: exact long norm, zero vector None, overflow throws") {
    val v = Array(3L, 4L)
    val n = FixedPoint.normalizeQ(v).get
    assert(n(0) == 3.0 / 5.0 && n(1) == 4.0 / 5.0) // 3-4-5: norm exact
    assert(FixedPoint.normalizeQ(Array(0L, 0L)).isEmpty)
    val boom = intercept[IllegalArgumentException] {
      FixedPoint.normalizeQ(Array.fill(64)(Long.MaxValue / 4))
    }
    assert(boom.getMessage.contains("overflow"))
  }

  test("trainCentroidsFixed is bit-identical across partitionings") {
    import spark.implicits._
    // adversarial values: magnitudes spanning 6 orders so a FLOAT sum's
    // result genuinely depends on add order — the exact case the long
    // path exists for
    val rnd = new scala.util.Random(42)
    val rows = (0 until 2000).map { i =>
      (i.toLong, Seq.tabulate(8)(d =>
        (rnd.nextDouble() - 0.5) * math.pow(10.0, (i + d) % 7 - 3)))
    }
    val init = Array(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0),
      Array(0.0, 1, 0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 1, 0, 0, 0, 0, 0))
    val cents = (1 to 4).map { p =>
      val df = rows.toDF("id", "v").repartition(p * 3 - 2).select(col("id"), col("v"))
      Similarity.trainCentroidsFixed(df, "v", init.map(_.clone()), iters = 3)
    }
    // bitwise comparison — doubleToRawLongBits, not ==, so a -0.0/0.0 or
    // last-ulp drift across partitionings fails loudly
    val bits = cents.map(_.map(_.map(java.lang.Double.doubleToLongBits).toSeq).toSeq)
    assert(bits.distinct.size == 1,
      "fixed-point Lloyd differed across partition counts")
  }

  test("fixed-point GD fit (LogReg portable) is bit-identical across partitionings") {
    import spark.implicits._
    val docs = (0 until 400).map(i =>
      (i.toLong, s"tok${i % 7} tok${i % 13} tok${i % 3} filler$i",
        if (i % 2 == 0) "en" else "de"))
    val runs = Seq(2, 7, 13).map { p =>
      val df = docs.toDF("doc_id", "text", "lang").repartition(p)
      graft.model.LogReg.trainScore(df, "text", "doc_id",
          col("lang") === "en", dim = 32, iters = 5, portable = true)
        .orderBy("doc_id").collect()
        .map(r => java.lang.Double.doubleToLongBits(r.getDouble(1))).toSeq
    }
    assert(runs.distinct.size == 1,
      "portable GD scores differed across partition counts")
  }

  test("fixed-point books (L2, un-normalized) also partition-stable") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 1200).map { i =>
      (i.toLong, Seq.tabulate(4)(d => (rnd.nextGaussian()) * (1 + (i % 13))))
    }
    val init = Array(Array(0.5, 0, 0, 0), Array(-0.5, 0, 0, 0))
    val cents = Seq(1, 5, 11).map { p =>
      val df = rows.toDF("id", "v").repartition(p)
      Similarity.trainCentroidsFixed(df, "v", init.map(_.clone()),
        iters = 2, normalize = false, l2Assign = true)
    }
    val bits = cents.map(_.map(_.map(java.lang.Double.doubleToLongBits).toSeq).toSeq)
    assert(bits.distinct.size == 1)
  }
}
