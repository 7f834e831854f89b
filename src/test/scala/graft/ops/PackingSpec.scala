package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkWindows covers every token, honors overlap, last chunk short") {
    val doc = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val out = Packing.chunkWindows(df, "text", "doc_id",
      windowTokens = 4, overlapTokens = 1).orderBy($"chunk_id")
      .select($"chunk_id", $"tok_start", $"n_chunk_tokens", $"chunk_text")
      .as[(Int, Int, Int, String)].collect().toSeq
    // stride 3: starts 0,3,6,9
    assert(out == Seq(
      (0, 0, 4, "t1 t2 t3 t4"),
      (1, 3, 4, "t4 t5 t6 t7"),
      (2, 6, 4, "t7 t8 t9 t10"),
      (3, 9, 1, "t10")))
  }

  test("chunkWindows: token-empty docs emit nothing; single-token doc one chunk") {
    val df = Seq((1L, "   "), (2L, "solo")).toDF("doc_id", "text")
    val out = Packing.chunkWindows(df, "text", "doc_id", 8, 2)
    assert(rows(out) == Seq(Seq(2L, 0, 0, 1, "solo")))
  }

  test("chunkWindows rejects overlap >= window") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Packing.chunkWindows(df, "text", "doc_id", 4, 4)
    }
  }

  test("packSequences: exact-full packs, spanning docs split with correct " +
    "offsets, empty docs dropped") {
    // token counts: doc 1 -> 3, doc 2 -> 4, doc 3 -> 0, doc 4 -> 6; max 5
    val df = Seq(
      (1L, "a b c"), (2L, "d e f g"), (3L, "  "),
      (4L, "h i j k l m")).toDF("doc_id", "text")
    val out = Packing.packSequences(df, "doc_id", "text", maxTokens = 5L)
      .orderBy($"pack_id", $"pack_offset")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // stream: 1:[0,3) 2:[3,7) 4:[7,13); packs of 5 -> cuts at 5, 10
    assert(out == Seq(
      (0L, 1L, 0L, 3L, 0L), // doc1 fully in pack0 at offset 0
      (0L, 2L, 0L, 2L, 3L), // doc2 first 2 tokens close pack0
      (1L, 2L, 2L, 2L, 0L), // doc2 last 2 tokens open pack1
      (1L, 4L, 0L, 3L, 2L), // doc4 first 3 tokens close pack1
      (2L, 4L, 3L, 3L, 0L))) // doc4 tail opens pack2 (short last pack)
    // invariant: every pack but the last sums to exactly maxTokens
    val sums = out.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(sums == Map(0L -> 5L, 1L -> 5L, 2L -> 3L))
  }

  test("packSequences agrees with the sequential single-window definition " +
    "on a shuffled many-partition corpus") {
    val docs = (1 to 200).map(i => (i.toLong, ("w " * (i % 7 + 1)).trim))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(docs), 8))
      .toDF("doc_id", "text")
    val got = Packing.packSequences(df, "doc_id", "text", 16L)
    // sequential reference: cumulative sums in doc_id order on the driver
    var cum = 0L
    val expect = docs.sortBy(_._1).flatMap { case (id, t) =>
      val n = t.split("\\s+").length.toLong
      val cb = cum; cum += n
      (cb / 16 to (cum - 1) / 16).map { p =>
        val ts = math.max(p * 16 - cb, 0L)
        val te = math.min((p + 1) * 16 - cb, n)
        Seq[Any](p, id, ts, te - ts, cb + ts - p * 16)
      }
    }.sortBy(_.mkString("|"))
    assert(rows(got) == expect)
  }

  test("packCounted: pre-counted units pack identically to packSequences " +
    "and passthrough columns ride to every emitted segment") {
    import org.apache.spark.sql.functions._
    val docs = (1 to 40).map(i =>
      (i.toLong, ("w " * (i % 5 + 1)).trim, s"src${i % 3}"))
    val df = docs.toDF("doc_id", "text", "source")
    val viaText = Packing.packSequences(df, "doc_id", "text", 16L)
    val counted = df.select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("__n"))
    val viaCount = Packing.packCounted(counted, "doc_id", "__n", 16L)
    assert(rows(viaCount.select(
        col("pack_id"), col("doc_id"), col("tok_start"),
        col("n_pack_tokens"), col("pack_offset")))
      == rows(viaText))
    // the carried column is correct on every segment, including docs
    // split across packs
    assert(viaCount.where(col("source") =!=
      concat(lit("src"), pmod(col("doc_id"), lit(3)).cast("string"))).count() == 0)
  }
}
