package graft.traffic

import graft.SparkSpec
import graft.core.Warehouse
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

class ConfigNightlySpec extends SparkSpec {
  import spark.implicits._

  private def snapshotXml(lane100: String, with101: Boolean): String = {
    val det101 = if (with101)
      """   <detector name="101" label="94E.2" category="" lane="2" field="480" abandoned="f"/>""" + "\n"
    else ""
    s"""<?xml version="1.0"?>
       |<tms_config>
       | <corridor route="I-94" dir="EB">
       |  <r_node name="rnd_1" n_type="Station" label="94/Main" lon="-93.2" lat="44.9"
       |          lanes="3" shift="0" s_limit="60" station_id="S1" attach_side="R">
       |   <detector name="100" label="94E.1" category="" lane="$lane100" field="500" abandoned="f"/>
       |$det101  </r_node>
       | </corridor>
       |</tms_config>""".stripMargin
  }

  private def writeGz(dir: java.nio.file.Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    val out = new GZIPOutputStream(Files.newOutputStream(p))
    out.write(content.getBytes("UTF-8")); out.close()
    p.toString
  }

  test("nightly config runs: bootstrap, then merge with changelog append (§3.4)") {
    val whRoot = Files.createTempDirectory("cfg_wh").toString
    val snapDir = Files.createTempDirectory("cfg_snaps")
    val wh = new Warehouse(spark, whRoot)

    // night 1: bootstrap
    ConfigNightly.run(spark, wh,
      writeGz(snapDir, "metro_config_20230101.xml.gz", snapshotXml("1", with101 = true)))
    assert(wh.read(ConfigNightly.dimTable).count() == 2)
    assert(!wh.exists(ConfigNightly.logTable)) // bootstrap logs nothing

    // night 2: lane change on 100, detector 101 removed
    ConfigNightly.run(spark, wh,
      writeGz(snapDir, "metro_config_20230102.xml.gz", snapshotXml("7", with101 = false)))
    val dim = wh.read(ConfigNightly.dimTable)
    val r100 = dim.where($"DETECTOR_NAME" === "100").head()
    assert(r100.getAs[String]("DETECTOR_LANE") == "7")
    // attribute change stamps LAST_CHANGE_DATE (R/_pull_data.R:286-299)
    assert(r100.getAs[java.sql.Date]("LAST_CHANGE_DATE") == d("2023-01-02"))
    val r101 = dim.where($"DETECTOR_NAME" === "101").head()
    assert(r101.getAs[Boolean]("DEACTIVATE"))
    // removal does NOT stamp it — only attribute updates do
    assert(r101.getAs[java.sql.Date]("LAST_CHANGE_DATE") == d("2023-01-01"))
    val log = wh.read(ConfigNightly.logTable)
    val changes = log.select($"Change", $"DETECTOR_NAME").as[(String, String)]
      .collect().toSet
    assert(changes == Set(
      ("Attribute Changed: DETECTOR_LANE", "100"), ("Detector Removed", "101")))

    // night 3: no changes → dim stable, nothing appended
    ConfigNightly.run(spark, wh,
      writeGz(snapDir, "metro_config_20230103.xml.gz", snapshotXml("7", with101 = false)))
    assert(wh.read(ConfigNightly.logTable).count() == 2)
    assert(wh.read(ConfigNightly.dimTable).count() == 2)
  }

  test("backfill folds a snapshot directory in date order") {
    val whRoot = Files.createTempDirectory("cfg_wh2").toString
    val snapDir = Files.createTempDirectory("cfg_snaps2")
    val wh = new Warehouse(spark, whRoot)
    // write out of order on purpose — backfill must sort by embedded date
    writeGz(snapDir, "metro_config_20230103.xml.gz", snapshotXml("9", with101 = false))
    writeGz(snapDir, "metro_config_20230101.xml.gz", snapshotXml("1", with101 = true))
    writeGz(snapDir, "metro_config_20230102.xml.gz", snapshotXml("5", with101 = true))
    ConfigNightly.backfill(spark, wh, snapDir.toString)
    val dim = wh.read(ConfigNightly.dimTable)
    assert(dim.where($"DETECTOR_NAME" === "100").head().getAs[String]("DETECTOR_LANE") == "9")
    val log = wh.read(ConfigNightly.logTable)
    // lane 1→5 (day2), 5→9 (day3), 101 removed (day3)
    assert(log.where($"Change" === "Attribute Changed: DETECTOR_LANE").count() == 2)
    assert(log.where($"Change" === "Detector Removed").count() == 1)
  }
}
