package graft.core

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class WarehouseVersionSpec extends SparkSpec {

  private def wh() =
    new Warehouse(spark, Files.createTempDirectory("whv").toString)

  test("publish / readCurrent / time-travel readVersion") {
    import spark.implicits._
    val w = wh()
    assert(w.versions("t").isEmpty && w.currentVersion("t").isEmpty)
    val v1 = w.publishVersion(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), "t")
    val v2 = w.publishVersion(Seq((1L, "a"), (2L, "B"), (3L, "c"))
      .toDF("id", "x"), "t")
    assert((v1, v2) == (1, 2))
    assert(w.currentVersion("t").contains(2))
    assert(w.readCurrent("t").count() == 3)
    assert(rows(w.readVersion("t", 1)) ==
      rows(Seq((1L, "a"), (2L, "b")).toDF("id", "x")))
  }

  test("rollback is a pointer swap; republish continues the sequence") {
    import spark.implicits._
    val w = wh()
    w.publishVersion(Seq(1L).toDF("id"), "t")
    w.publishVersion(Seq(1L, 2L).toDF("id"), "t")
    w.rollbackTo("t", 1)
    assert(w.readCurrent("t").count() == 1)
    // both version dirs still present — rollback moved no data
    assert(w.versions("t") == Seq(1, 2))
    assert(w.publishVersion(Seq(9L).toDF("id"), "t") == 3)
    assert(w.readCurrent("t").head().getLong(0) == 9L)
  }

  test("lost pointer inside the swap window falls back to newest") {
    import spark.implicits._
    val root = Files.createTempDirectory("whv").toString
    val w = new Warehouse(spark, root)
    w.publishVersion(Seq(1L).toDF("id"), "t")
    w.publishVersion(Seq(1L, 2L).toDF("id"), "t")
    new java.io.File(s"$root/t/_CURRENT").delete()
    assert(w.currentVersion("t").contains(2))
    assert(w.readCurrent("t").count() == 2)
  }

  test("crash inside a rollback's swap window recovers the rollback target") {
    import spark.implicits._
    val root = Files.createTempDirectory("whv").toString
    val w = new Warehouse(spark, root)
    w.publishVersion(Seq(1L).toDF("id"), "t")
    w.publishVersion(Seq(1L, 2L).toDF("id"), "t")
    // simulate the delete+rename window of rollbackTo("t", 1): the tmp
    // pointer holds the INTENDED (older) target, _CURRENT is gone —
    // jumping to newest here would silently undo the rollback (r9 advice)
    val out = new java.io.FileOutputStream(s"$root/t/_CURRENT.tmp")
    try out.write("1".getBytes("UTF-8")) finally out.close()
    new java.io.File(s"$root/t/_CURRENT").delete()
    assert(w.currentVersion("t").contains(1))
    assert(w.readCurrent("t").count() == 1)
    // a tmp pointing at a nonexistent version is ignored, not trusted
    val out2 = new java.io.FileOutputStream(s"$root/t/_CURRENT.tmp")
    try out2.write("99".getBytes("UTF-8")) finally out2.close()
    assert(w.currentVersion("t").contains(2))
  }

  test("expireVersions keeps the newest K and the pointer target") {
    import spark.implicits._
    val w = wh()
    (1 to 4).foreach(i => w.publishVersion(Seq(i.toLong).toDF("id"), "t"))
    w.rollbackTo("t", 2) // pointer away from newest
    val dropped = w.expireVersions("t", keepLast = 2)
    assert(dropped == Seq(1))
    assert(w.versions("t") == Seq(2, 3, 4))
    assert(w.readCurrent("t").head().getLong(0) == 2L)
  }

  test("diff across published versions composes with Versioning") {
    import spark.implicits._
    val w = wh()
    w.publishVersion(Seq((1L, "a"), (2L, "b")).toDF("id", "t"), "c")
    w.publishVersion(Seq((2L, "B"), (3L, "c")).toDF("id", "t"), "c")
    val out = graft.ops.Versioning.datasetDiff(
      w.readVersion("c", 1), w.readVersion("c", 2), "id", Seq("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "changed", 3L -> "added"))
  }
}
