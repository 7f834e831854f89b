package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TidySpec extends SparkSpec {
  import spark.implicits._

  test("pathSplit splits on literal separator, NULL past end (P1)") {
    val df = Seq("a/b/c", "x/y", "solo").toDF("p")
    val out = Tidy.pathSplit(df, "p", "/", Seq("s1", "s2", "s3"), keepSrc = false)
    assert(rows(out) == Seq(
      Seq("a", "b", "c"), Seq("solo", null, null), Seq("x", "y", null)))
  }

  test("pathJoin skips NULL segments like concat_ws (P2)") {
    val df = Seq(("a", null: String, "c")).toDF("s1", "s2", "s3")
    val out = Tidy.pathJoin(df, "joined", "/", Seq("s1", "s2", "s3"))
    assert(out.select("joined").as[String].head() == "a/c")
  }

  test("trimAll trims every string column (P3)") {
    val df = Seq((" x ", " y", 1)).toDF("a", "b", "n")
    val out = Tidy.trimAll(df)
    assert(rows(out) == Seq(Seq("x", "y", 1)))
  }

  test("emptyToNull converts only empty strings (P7)") {
    val df = Seq(("", "keep"), ("v", "")).toDF("a", "b")
    assert(rows(Tidy.emptyToNull(df)) ==
      Seq(Seq(null, "keep"), Seq("v", null)))
  }

  test("renameAll applies to every column (P5)") {
    val df = Seq((1, 2)).toDF("low.a", "low.b")
    val out = Tidy.renameAll(df)(_.toUpperCase.replace('.', '_'))
    assert(out.columns.toSeq == Seq("LOW_A", "LOW_B"))
  }

  test("scaleUpImpute scales by non-null share; 100% null → NULL (P13)") {
    val df = Seq((90.0, 10.0), (50.0, 100.0)).toDF("s", "pn")
    val out = df.select(Tidy.scaleUpImpute($"s", $"pn").as("v")).as[Option[Double]]
    assert(out.collect().toSeq == Seq(Some(100.0), None))
  }

  test("rowMean2: both null → null; one null → other; else mean (P14)") {
    val df = Seq[(Option[Double], Option[Double])](
      (Some(2.0), Some(4.0)), (None, Some(4.0)), (Some(2.0), None), (None, None))
      .toDF("a", "b")
    val out = df.select(Tidy.rowMean2($"a", $"b").as("m")).as[Option[Double]]
    assert(out.collect().toSeq == Seq(Some(3.0), Some(4.0), Some(2.0), None))
  }

  test("speed gated on volume!=0 and occPct>=0.002 (P12)") {
    // speed = vol*2*field/(5280*occ), rounded to 1 dp (R/_pull_data.R:349-364)
    val df = Seq((10.0, 0.1), (0.0, 0.1), (10.0, 0.001)).toDF("vol", "occ")
    val out = df.select(Tidy.speed($"vol", $"occ", lit(528.0)).as("s")).as[Option[Double]]
    assert(out.collect().toSeq == Seq(Some(20.0), None, None))
  }

  test("replaceImpossible NULLs out-of-bounds readings (P10)") {
    val df = Seq(5.0, -1.0, 100.0).toDF("v")
    val out = Tidy.replaceImpossible(df, Map("v" -> (0.0, 40.0)))
    assert(out.select("v").as[Option[Double]].collect().toSeq ==
      Seq(Some(5.0), None, None))
  }

  test("dateFromString extracts yyyyMMdd (P4)") {
    val df = Seq("http://x/metro_config_20230115.xml.gz").toDF("url")
    val out = df.select(Tidy.dateFromString($"url").as("d"))
    assert(out.head().getDate(0) == d("2023-01-15"))
  }

  test("winsorize clamps to per-group exact percentiles, NULLs pass through") {
    // group a: 1..11 → p10 = 2.0, p90 = 10.0 (h = (n-1)p interpolation)
    val df = ((1 to 11).map(v => ("a", java.lang.Double.valueOf(v.toDouble))) ++
      Seq(("a", null.asInstanceOf[java.lang.Double]), ("b", java.lang.Double.valueOf(100.0))))
      .toDF("g", "v")
    val out = Tidy.winsorize(df, $"g", $"v", 0.10, 0.90)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(out.contains(("a", 1.0, 2.0)))    // clamped up
    assert(out.contains(("a", 11.0, 10.0)))  // clamped down
    assert(out.contains(("a", 5.0, 5.0)))    // interior untouched
    assert(out.contains(("a", null, null)))  // NULL stays NULL
    assert(out.contains(("b", 100.0, 100.0))) // singleton group: self bounds
  }
}
