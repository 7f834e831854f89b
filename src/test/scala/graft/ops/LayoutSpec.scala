package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorder2 interleaves bits (known values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y")).as("z"))
    val z = df.collect().map(_.getLong(0))
    assert(z(0) == 0L)
    assert(z(1) == 1L)          // x bit 0 -> position 0
    assert(z(2) == 2L)          // y bit 0 -> position 1
    // x=3 (bits 0,1 -> pos 0,2 = 5); y=5 (bits 0,2 -> pos 1,5 = 34)
    assert(z(3) == 39L)
    assert(z(4) == 0xFFFFFFFFL) // full 16+16 bits -> all 32 bits set
  }

  test("zorder2 masks inputs to 16 bits") {
    val r = Seq((65536L + 3L, 0L)).toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y")).as("z")).head().getLong(0)
    assert(r == 5L) // the 2^16 bit is dropped; only x=3 survives
  }

  test("writeZOrdered: per-file bounding boxes beat a linear sort for 2-D pruning") {
    // 64x64 uniform grid; 16 files. Z-ordered files cover small squares:
    // every file's x-span * y-span should be far below the global area.
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val path = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    Layout.writeZOrdered(df, path, col("x"), col("y"), numFiles = 16)
    val withFile = spark.read.parquet(path)
      .select(col("x"), col("y"), input_file_name().as("f"))
    val boxes = withFile.groupBy("f")
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"))
      .collect()
    assert(boxes.length > 1)
    val worstArea = boxes.map(r => (r.getLong(1) + 1) * (r.getLong(2) + 1)).max
    // global area 64*64 = 4096 over 16 files; allow 2x slack over the
    // ideal 256 for boxes that straddle a Z-cell boundary
    assert(worstArea <= 512, s"worst per-file bounding box area $worstArea")
    // a linear sort on x would give every file the FULL y-span (63)
    val worstY = boxes.map(_.getLong(2)).max
    assert(worstY < 63)
  }

  test("writeCompacted: per-key file budgets bound the small-files blowup") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    // skewed: key 'big' 1000 rows, 'mid' 150, 'tiny' 7
    val df = ((1 to 1000).map(i => (i.toLong, "big")) ++
      (1001 to 1150).map(i => (i.toLong, "mid")) ++
      (1151 to 1157).map(i => (i.toLong, "tiny")))
      .toDF("id", "key")
    val plan = Layout.writeCompacted(df, dir, Seq("key"), $"id",
      targetRowsPerFile = 100L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(plan("big") == ((1000L, 10L)))
    assert(plan("mid") == ((150L, 2L)))
    assert(plan("tiny") == ((7L, 1L)))
    def files(key: String): Int =
      new java.io.File(s"$dir/key=$key").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    // at most the budget, never the task-count blowup; tiny is exactly 1
    assert(files("big") <= 10 && files("big") > 1)
    assert(files("mid") <= 2)
    assert(files("tiny") == 1)
    // data round-trips intact
    val back = spark.read.parquet(dir)
    assert(back.count() == 1157L)
    assert(back.groupBy($"key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("big" -> 1000L, "mid" -> 150L, "tiny" -> 7L))
  }

  test("rendezvousReshard: moved docs land only on added shards; fraction near (K'-K)/K'") {
    val ids = spark.range(0L, 5000L).toDF("id")
    val r = Layout.rendezvousReshard(ids, "id", 16, 20).collect()
    assert(r.forall(x => x.getAs[Int]("shard_from") >= 0 &&
      x.getAs[Int]("shard_from") < 16))
    assert(r.forall(x => x.getAs[Int]("shard_to") >= 0 &&
      x.getAs[Int]("shard_to") < 20))
    // HRW superset law: the 16-shard argmax only changes when one of the
    // ADDED shards (16..19) takes the max -- every moved doc proves it
    val moved = r.filter(_.getAs[Boolean]("moved"))
    assert(moved.nonEmpty)
    assert(moved.forall(_.getAs[Int]("shard_to") >= 16))
    // unmoved docs keep their exact old shard (not merely "some" shard)
    assert(r.filter(!_.getAs[Boolean]("moved"))
      .forall(x => x.getAs[Int]("shard_from") == x.getAs[Int]("shard_to")))
    // expected moved fraction 4/20 = 0.20; 5000 draws keep it tight
    val frac = moved.length.toDouble / r.length
    assert(frac > 0.15 && frac < 0.25, s"moved fraction $frac")
  }

  test("rendezvousShard: balanced within 2x of uniform across 16 shards") {
    val counts = spark.range(0L, 8000L).toDF("id")
      .select(Layout.rendezvousShard(col("id"), 16).as("s"))
      .groupBy("s").count().collect().map(_.getLong(1))
    assert(counts.length == 16)
    assert(counts.min > 8000 / 16 / 2 && counts.max < 8000 / 16 * 2)
  }
}
