package graft.core

import graft.SparkSpec

/** The reader-side fixture split cache (round-12): a mid-size
  * single-file parquet table is rewritten once into an 8-file copy so
  * scans parallelize; values must be identical, and a stale
  * (_SUCCESS-less) cache slot must be REBUILT, not skipped forever
  * (review round-12: ATOMIC_MOVE onto a non-empty slot always fails,
  * so without the stale-slot delete every later load paid a full
  * rewrite job and then read the serial original).
  */
class SplitCacheSpec extends SparkSpec {
  import spark.implicits._

  private def slotFor(file: java.io.File): java.nio.file.Path = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${file.getAbsolutePath}:${file.length}:${file.lastModified}"
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_fixture_splits", key)
  }

  test("single-file table splits to a parallel cached copy with " +
    "identical values; a _SUCCESS-less slot is rebuilt") {
    val dir = java.nio.file.Files.createTempDirectory("split_cache_spec")
    // one parquet FILE >= 64 KB (the cache's lower bound)
    val stage = dir.resolve("stage")
    val df = (0L until 20000L).map(i => (i, s"row-$i-${"x" * 20}"))
      .toDF("id", "payload")
    df.coalesce(1).write.parquet(stage.toString)
    val part = stage.toFile.listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val single = dir.resolve("tbl.parquet")
    java.nio.file.Files.move(part.toPath, single)
    Scratch.delete(stage.toFile)
    assert(single.toFile.length >= 64L * 1024, "fixture must cross the cache bound")

    val got = Tables.load(spark, dir.toString, "tbl")
    assert(got.rdd.getNumPartitions > 1,
      "cached copy must scan in parallel (the whole point)")
    assert(got.count() == 20000L)
    assert(rows(got.orderBy($"id").limit(3)) ==
      rows(df.orderBy($"id").limit(3)))
    val slot = slotFor(single.toFile)
    assert(java.nio.file.Files.exists(slot.resolve("_SUCCESS")))

    // stale slot: _SUCCESS gone (tmpdir reaping / crashed installer)
    java.nio.file.Files.delete(slot.resolve("_SUCCESS"))
    val again = Tables.load(spark, dir.toString, "tbl")
    assert(again.count() == 20000L)
    assert(java.nio.file.Files.exists(slot.resolve("_SUCCESS")),
      "a stale slot must be rebuilt, not bypassed forever")
    assert(again.rdd.getNumPartitions > 1)

    Scratch.delete(slot.toFile)
    Scratch.delete(dir.toFile)
  }

  test("tiny dims and multi-file dirs pass through uncached") {
    val dir = java.nio.file.Files.createTempDirectory("split_cache_tiny")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // tiny single file: under the 64 KB bound -> read in place
    val stage = dir.resolve("stage")
    df.coalesce(1).write.parquet(stage.toString)
    val part = stage.toFile.listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val single = dir.resolve("tiny.parquet")
    java.nio.file.Files.move(part.toPath, single)
    Scratch.delete(stage.toFile)
    assert(Tables.load(spark, dir.toString, "tiny").count() == 2L)
    assert(!java.nio.file.Files.exists(slotFor(single.toFile)),
      "a sub-bound file must not be cached")
    // multi-file dir (the ScaleUp / warehouse shape): untouched
    val multi = dir.resolve("multi.parquet")
    df.repartition(2).write.parquet(multi.toString)
    assert(Tables.load(spark, dir.toString, "multi").count() == 2L)
    assert(!java.nio.file.Files.exists(slotFor(multi.toFile)),
      "a directory table must not be cached")
    Scratch.delete(dir.toFile)
  }
}
