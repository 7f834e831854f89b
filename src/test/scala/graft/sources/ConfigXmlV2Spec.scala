package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

/** The DataSource V2 surface of the metro_config XML source: format
  * resolution through DataSourceRegister, snapshot-date file pruning,
  * column pruning into the reader, and agreement with the RDD-based
  * [[ConfigXml.readSnapshots]].
  */
class ConfigXmlV2Spec extends SparkSpec {
  import spark.implicits._

  private val xml =
    """<?xml version="1.0"?>
      |<tms_config>
      | <corridor route="I-94" dir="EB">
      |  <r_node name="rnd_1" n_type="Station" label="94/Main" lon="-93.2" lat="44.9"
      |          lanes="3" shift="0" s_limit="60" station_id="S1" attach_side="">
      |   <detector name="100" label="94E.1" category="" lane="1" field="500.5" abandoned="f"/>
      |   <detector name="101" label="94E.2" category="" lane="2" field="480.0" abandoned="f"/>
      |  </r_node>
      | </corridor>
      |</tms_config>""".stripMargin

  private def writeGz(dir: java.nio.file.Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    val out = new GZIPOutputStream(Files.newOutputStream(p))
    out.write(content.getBytes("UTF-8")); out.close()
    p.toString
  }

  private def mkSnapshots(): String = {
    val dir = Files.createTempDirectory("cfgv2")
    writeGz(dir, "metro_config_20230115.xml.gz", xml)
    writeGz(dir, "metro_config_20230116.xml.gz",
      xml.replace("""field="500.5"""", """field="501.0""""))
    writeGz(dir, "metro_config_20230120.xml.gz",
      xml.replace("""route="I-94"""", """route="I-35W""""))
    dir.toString
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    // reach through AQE: an aggregate plan wraps in AdaptiveSparkPlanExec,
    // whose collect() does not traverse into the inner plan
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case other => other
    }
    unwrap(df.queryExecution.executedPlan)
      .collect { case b: BatchScanExec => b }
      .headOption.getOrElse(
        unwrap(df.queryExecution.executedPlan).collectLeaves()
          .collectFirst { case b: BatchScanExec => b }.get)
  }

  test("format resolves via DataSourceRegister; matches readSnapshots") {
    val dir = mkSnapshots()
    val v2 = spark.read.format("graft-config-xml").load(dir)
    val v1 = ConfigXml.readSnapshots(spark, dir)
    assert(v2.schema == v1.schema)
    assert(rows(v2) == rows(v1))
    assert(v2.count() == 6)
  }

  test("LAST_CHANGE_DATE filters prune snapshot files at planning time") {
    val dir = mkSnapshots()
    val read = spark.read.format("graft-config-xml").load(dir)

    val eq = read.where($"LAST_CHANGE_DATE" === lit(d("2023-01-16")))
    assert(scanOf(eq).inputRDD.getNumPartitions == 1)
    assert(eq.count() == 2)
    assert(eq.select(min($"DETECTOR_FIELD")).head().getDouble(0) == 480.0)

    val range = read.where($"LAST_CHANGE_DATE" >= lit(d("2023-01-16")))
    assert(scanOf(range).inputRDD.getNumPartitions == 2)
    assert(range.count() == 4)

    // residual semantics: a filter the source can't prune still works
    val mixed = read.where($"LAST_CHANGE_DATE" >= lit(d("2023-01-16")) &&
      $"DETECTOR_NAME" === "100")
    assert(mixed.count() == 2)
  }

  test("column pruning reaches the reader's output schema") {
    val dir = mkSnapshots()
    val two = spark.read.format("graft-config-xml").load(dir)
      .select($"DETECTOR_NAME", $"CORRIDOR_ROUTE")
    assert(scanOf(two).scan.readSchema().fieldNames.toSeq ==
      Seq("DETECTOR_NAME", "CORRIDOR_ROUTE"))
    assert(rows(two).size == 6)
    // empty-attr -> NULL conversion survives the pruned path
    val side = spark.read.format("graft-config-xml").load(dir)
      .select($"NODE_ATTACH_SIDE")
    assert(side.collect().forall(_.isNullAt(0)))
  }
  test("ungrouped MIN/MAX(LAST_CHANGE_DATE) pushes to the file listing") {
    val dir = mkSnapshots()
    val df = spark.read.format("graft-config-xml").load(dir)
      .agg(min("LAST_CHANGE_DATE").as("lo"), max("LAST_CHANGE_DATE").as("hi"))
    // the plan must be the listing-only aggregate scan, no final agg
    // over parsed rows: its description advertises the pushed aggregates
    assert(scanOf(df).scan.description().contains("PushedAggregates"))
    val row = df.head()
    assert(row.getDate(0).toString == "2023-01-15")
    assert(row.getDate(1).toString == "2023-01-20")
    // composes with pruning filters: watermark over a date range
    val bounded = spark.read.format("graft-config-xml").load(dir)
      .where(col("LAST_CHANGE_DATE") < lit(java.sql.Date.valueOf("2023-01-20")))
      .agg(max("LAST_CHANGE_DATE").as("hi"))
    assert(bounded.head().getDate(0).toString == "2023-01-16")
    // declined shapes still answer correctly through the row scan:
    // grouped aggregation and non-date aggregates plan normally
    val grouped = spark.read.format("graft-config-xml").load(dir)
      .groupBy("LAST_CHANGE_DATE").count()
    assert(!scanOf(grouped).scan.description().contains("PushedAggregates"))
    assert(grouped.count() == 3)
    val cnt = spark.read.format("graft-config-xml").load(dir)
      .agg(count(lit(1)).as("n"), max("LAST_CHANGE_DATE").as("hi"))
    assert(!scanOf(cnt).scan.description().contains("PushedAggregates"))
    assert(cnt.head().getLong(0) == 6L) // 2 detectors x 3 snapshots
  }

  test("pushed aggregate skips zero-row boundary files (r9 advice)") {
    val dir = mkSnapshots()
    // an element-free snapshot at BOTH extremes: its dates must not leak
    // into the pushed answer, because no row carries them
    val empty = """<?xml version="1.0"?><tms_config></tms_config>"""
    writeGz(java.nio.file.Paths.get(dir), "metro_config_20230110.xml.gz", empty)
    writeGz(java.nio.file.Paths.get(dir), "metro_config_20230125.xml.gz", empty)
    val df = spark.read.format("graft-config-xml").load(dir)
      .agg(min("LAST_CHANGE_DATE").as("lo"), max("LAST_CHANGE_DATE").as("hi"))
    assert(scanOf(df).scan.description().contains("PushedAggregates"))
    val row = df.head()
    assert(row.getDate(0).toString == "2023-01-15")
    assert(row.getDate(1).toString == "2023-01-20")
    // agreement with the row-scan plan Spark would otherwise produce
    val viaRows = ConfigXml.readSnapshots(spark, dir)
      .agg(min("LAST_CHANGE_DATE"), max("LAST_CHANGE_DATE")).head()
    assert(row.getDate(0) == viaRows.getDate(0) &&
      row.getDate(1) == viaRows.getDate(1))
    // all files empty -> SQL-correct NULLs, not a phantom file date
    val dir2 = Files.createTempDirectory("cfgv2_allempty")
    writeGz(dir2, "metro_config_20230101.xml.gz", empty)
    val allEmpty = spark.read.format("graft-config-xml").load(dir2.toString)
      .agg(max("LAST_CHANGE_DATE").as("hi"))
    assert(allEmpty.head().isNullAt(0))
  }

  test("pushed aggregate over an empty listing yields one NULL row") {
    val dir = java.nio.file.Files.createTempDirectory("cfgv2_empty").toString
    val df = spark.read.format("graft-config-xml").load(dir)
      .agg(max("LAST_CHANGE_DATE").as("hi"))
    val row = df.head()
    assert(row.isNullAt(0))
  }
}
