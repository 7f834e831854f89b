package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GovernanceSpec extends SparkSpec {

  test("rowHash: null-safe, separator-unambiguous") {
    import spark.implicits._
    val df = Seq(
      ("a", "bc"), ("ab", "c"), // must NOT collide
      (null.asInstanceOf[String], "x"), ("", "x") // null != empty
    ).toDF("u", "v")
      .select(Versioning.rowHash(Seq(col("u"), col("v"))).as("h"))
    assert(df.distinct().count() == 4)
  }

  test("datasetDiff classifies added / removed / changed, drops unchanged") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
    val neu = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("id", "t")
    val out = Versioning.datasetDiff(old, neu, "id", Seq("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("luhnValid accepts real check digits, rejects off-by-one") {
    import spark.implicits._
    // 4111111111111111 and 79927398713 are the canonical Luhn-valid
    // examples; each +1 on the check digit must fail
    val rows = Seq("4111111111111111", "4111111111111112",
      "79927398713", "79927398714", "378282246310005")
      .toDF("n").select(col("n"), PiiScan.luhnValid(col("n")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rows("4111111111111111") && !rows("4111111111111112"))
    assert(rows("79927398713") && !rows("79927398714"))
    assert(rows("378282246310005")) // AmEx test PAN, odd length
  }

  test("scan: candidate windows, Luhn filter, 19-digit cap") {
    import spark.implicits._
    val text = "id 123456789012 pan 4111111111111111 junk " +
      "4111111111111112 long 12345678901234567890123"
    val r = Seq(text).toDF("t")
      .select(PiiScan.panCandidates(col("t")).as("c"))
      .head().getSeq[String](0)
    // 12-digit run too short; 23-digit run contributes its 19-prefix
    assert(r == Seq("4111111111111111", "4111111111111112",
      "1234567890123456789"))
    val (nc, nv, flag) = PiiScan.scan(col("t"))
    val row = Seq(text).toDF("t")
      .select(nc.as("a"), nv.as("b"), flag.as("f")).head()
    assert(row.getLong(0) == 3L && row.getLong(1) == 1L && row.getBoolean(2))
  }
  test("datasetDiff changeset replays v1 into v2 (prop)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i =>
        g.apply(Gen.Parameters.default, Seed(4200L + i)).toSeq)
    val stateGen = for {
      keys <- Gen.someOf(1L to 30L)
      vals <- Gen.listOfN(keys.size, Gen.oneOf("a", "b", "c"))
    } yield keys.toSeq.sorted.zip(vals)
    val cases = samples(Gen.zip(stateGen, stateGen), 25)
    cases.zipWithIndex.foreach { case ((v1, v2), i) =>
      val d1 = v1.toDF("id", "t")
      val d2 = v2.toDF("id", "t")
      val diff = Versioning.datasetDiff(d1, d2, "id", Seq("t"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // replay law: v1 minus removed/changed keys, plus v2's rows for
      // added/changed keys, equals v2 exactly
      val m1 = v1.toMap; val m2 = v2.toMap
      val replayed = m1.filterNot { case (k, _) =>
        diff.get(k).exists(s => s == "removed" || s == "changed") } ++
        m2.filter { case (k, _) =>
          diff.get(k).exists(s => s == "added" || s == "changed") }
      assert(replayed == m2, s"case $i: diff=$diff v1=$v1 v2=$v2")
      // minimality: no unchanged key appears in the changeset
      assert(diff.keys.forall(k => m1.get(k) != m2.get(k)))
    }
  }
}
