package graft.sources

import graft.SparkSpec
import graft.ops.Scd2
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

class ConfigXmlSpec extends SparkSpec {
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
      |  <r_node name="rnd_2" n_type="Entrance" label="ramp" lon="-93.1" lat="44.8"
      |          lanes="1" shift="2" s_limit="45" station_id="" attach_side="L">
      |   <detector name="200" label="ramp.1" category="M" lane="1" field="300" abandoned="t"/>
      |  </r_node>
      | </corridor>
      | <corridor route="TH-62" dir="WB">
      |  <r_node name="rnd_9" n_type="Station" label="62/X" lon="-93.0" lat="44.7"
      |          lanes="2" shift="0" s_limit="55" station_id="S9" attach_side="R">
      |   <detector name="900" label="62W.1" category="" lane="1" field="450" abandoned="f"/>
      |  </r_node>
      | </corridor>
      |</tms_config>""".stripMargin

  private def writeGz(dir: java.nio.file.Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    val out = new GZIPOutputStream(Files.newOutputStream(p))
    out.write(content.getBytes("UTF-8")); out.close()
    p.toString
  }

  test("StAX parse: one row per detector with structural ancestry (S1/S2/J3)") {
    val dir = Files.createTempDirectory("cfgxml")
    val path = writeGz(dir, "metro_config_20230115.xml.gz", xml)
    val df = ConfigXml.readSnapshot(spark, path)
    assert(df.count() == 4)
    val r100 = df.where($"DETECTOR_NAME" === "100").head()
    assert(r100.getAs[String]("NODE_NAME") == "rnd_1")
    assert(r100.getAs[String]("CORRIDOR_ROUTE") == "I-94")
    assert(r100.getAs[Double]("DETECTOR_FIELD") == 500.5)
    assert(r100.getAs[Int]("NODE_S_LIMIT") == 60)
    assert(r100.getAs[String]("NODE_ATTACH_SIDE") == null) // empty → NULL (P7)
    assert(r100.getAs[java.sql.Date]("LAST_CHANGE_DATE") == d("2023-01-15"))
    val r900 = df.where($"DETECTOR_NAME" === "900").head()
    assert(r900.getAs[String]("CORRIDOR_ROUTE") == "TH-62") // ancestry switches
    assert(r900.getAs[String]("NODE_NAME") == "rnd_9")
  }

  test("readSnapshots parses a directory in parallel; dates from file names") {
    val dir = Files.createTempDirectory("cfgxml2")
    writeGz(dir, "metro_config_20230115.xml.gz", xml)
    writeGz(dir, "metro_config_20230116.xml.gz",
      xml.replace("""field="500.5"""", """field="501.0""""))
    val df = ConfigXml.readSnapshots(spark, dir.toString)
    assert(df.count() == 8)
    assert(df.select(countDistinct($"LAST_CHANGE_DATE")).head().getLong(0) == 2)
  }

  test("snapshot feeds SCD-2 merge end-to-end (S2 → §2.8)") {
    val dir = Files.createTempDirectory("cfgxml3")
    val day1 = ConfigXml.readSnapshot(spark,
      writeGz(dir, "metro_config_20230115.xml.gz", xml))
    // day 2: detector 101 vanishes, 100's lane changes, 901 appears
    val xml2 = xml
      .replace("""   <detector name="101" label="94E.2" category="" lane="2" field="480.0" abandoned="f"/>""" + "\n", "")
      .replace("""name="100" label="94E.1" category="" lane="1"""",
        """name="100" label="94E.1" category="" lane="9"""")
      .replace("""   <detector name="900" """,
        """   <detector name="901" label="62W.2" category="" lane="2" field="455" abandoned="f"/>
          |   <detector name="900" """.stripMargin)
    val day2 = ConfigXml.readSnapshot(spark,
      writeGz(dir, "metro_config_20230116.xml.gz", xml2))

    val attrCols = ConfigXml.schema.fieldNames.toSeq
      .filterNot(Seq("DETECTOR_NAME", "LAST_CHANGE_DATE").contains)
    val opts = Scd2.Options(key = "DETECTOR_NAME", attrCols = attrCols,
      abandonedCol = Some("DETECTOR_ABANDONED"))
    val init = day1
      .withColumn("START_DATE", to_date(lit("2023-01-15")))
      .withColumn("END_DATE", to_date(lit("2100-01-01")))
      .withColumn("DEACTIVATE", lit(false))
    val merged = Scd2.merge(init, day2, "2023-01-16", opts)

    val changes = merged.changelog.select($"Change", $"DETECTOR_NAME")
      .as[(String, String)].collect().toSet
    assert(changes.contains(("New Detector Added", "901")))
    assert(changes.contains(("Detector Removed", "101")))
    assert(changes.contains(("Attribute Changed: DETECTOR_LANE", "100")))
    // LAST_CHANGE_DATE differs per snapshot → logged for every matched key;
    // the lane change is the only other attribute change
    val attrChanges = changes.filter(_._1.startsWith("Attribute Changed"))
    assert(attrChanges.forall { case (c, _) =>
      c == "Attribute Changed: DETECTOR_LANE" || c == "Attribute Changed: LAST_CHANGE_DATE"
    })
    val d101 = merged.dim.where($"DETECTOR_NAME" === "101").head()
    assert(d101.getAs[Boolean]("DEACTIVATE"))
    assert(d101.getAs[java.sql.Date]("END_DATE") == d("2023-01-16"))
  }
}
