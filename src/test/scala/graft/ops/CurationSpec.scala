package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-4 curation operators: normalization, substring-level dup
  * profiling, the distributed global prefix sum, and incremental
  * batch-vs-store dedup.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeText: lowercase, accents, control chars, whitespace") {
    val out = Seq("  CAFÉ  naïve\tZürich\u0007été  World ")
      .toDF("t")
      .select(TextAnalysis.normalizeText(col("t")).as("n"))
      .head().getString(0)
    assert(out == "cafe naive zurich ete world")
  }

  test("normalizeText is idempotent") {
    val df = Seq("ÀÉÎÕÜ  x\n\ny", "already clean").toDF("t")
    val once = df.select(TextAnalysis.normalizeText(col("t")).as("n"))
    val twice = once.select(TextAnalysis.normalizeText(col("n")).as("n"))
    assert(rows(once) == rows(twice))
  }

  test("substringDupStats: stride-1 windows catch misaligned duplicates") {
    // docs 1 and 2 share an 8-word run at DIFFERENT word offsets (1 vs 3)
    // — passage (non-overlapping) windows would miss it, stride-1 must not
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, s"a $shared"),           // run starts at word 2
      (2L, s"x y z $shared"),       // run starts at word 4
      (3L, "totally different words with no overlap at all eight plus")
    ).toDF("doc_id", "text")
    val r = Dedup.substringDupStats(df, "text", "doc_id", words = 8)
      .orderBy("doc_id").collect()
    // doc1: 9 words -> 2 windows, 1 dup (the shared run)
    assert(r(0).getLong(1) == 2 && r(0).getLong(2) == 1)
    // doc2: 11 words -> 4 windows, 1 dup
    assert(r(1).getLong(1) == 4 && r(1).getLong(2) == 1)
    // doc3: nothing duplicated
    assert(r(2).getLong(2) == 0)
    // short docs (< words tokens) report 0/0/0
    val short = Dedup.substringDupStats(
      Seq((9L, "too short")).toDF("doc_id", "text"), "text", "doc_id", 8)
      .head()
    assert(short.getLong(1) == 0 && short.getLong(2) == 0 && short.getLong(3) == 0)
  }

  test("globalRunningSum matches the single-partition global window") {
    val df = (1L to 1000L).map(i => (i * 7 % 1001, i % 13)).toDF("o", "v")
    val got = Windows.globalRunningSum(df, "o", "v", "cum", partitions = 8)
    val want = df.withColumn("cum",
      sum(col("v")).over(org.apache.spark.sql.expressions.Window.orderBy(col("o"))))
    assert(rows(got.select("o", "v", "cum")) == rows(want.select("o", "v", "cum")))
  }

  test("globalRunningSum is parallel: >1 range partition") {
    val df = (1L to 100L).toDF("o").withColumn("v", lit(1L))
    val ranged = df.repartitionByRange(8, col("o"))
    assert(ranged.rdd.getNumPartitions > 1)
    val r = Windows.globalRunningSum(df, "o", "v", "cum", partitions = 8)
      .orderBy(col("o")).collect()
    assert(r.map(_.getLong(2)).toSeq == (1L to 100L))
  }

  test("incrementalDedup: exact hit, near hit, miss") {
    val store = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "an entirely different document about spark and scale"),
      (3L, "another unrelated store document with its own words")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"), // exact dup of 1
      (11L, "the quick brown fox jumps over the lazy dog tonight"), // near dup of 1
      (12L, "completely novel content nothing like the store at all xyzzy")
    ).toDF("doc_id", "text")
    val r = Dedup.incrementalDedup(batch, store, "text", "doc_id",
      shingleN = 3, threshold = 0.6)
      .orderBy("doc_id").collect()
    assert(r(0).getBoolean(1))                    // 10: exact dup
    assert(r(0).getLong(2) == 1L)                 //     matches store 1
    assert(!r(1).getBoolean(1))                   // 11: not exact
    assert(r(1).getLong(2) == 1L)                 //     but near store 1
    assert(r(1).getDouble(3) >= 0.6)
    assert(!r(2).getBoolean(1) && r(2).isNullAt(2)) // 12: clean
  }

  test("incrementalDedup never pairs store docs with each other") {
    // two identical STORE docs must not appear in the output at all
    val store = Seq((1L, "dup dup dup dup dup"), (2L, "dup dup dup dup dup"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "nothing shared here at all")).toDF("doc_id", "text")
    val r = Dedup.incrementalDedup(batch, store, "text", "doc_id")
    assert(r.count() == 1 && r.head().getLong(0) == 10L)
  }

  test("incrementalDedup tolerates doc_id collisions between batch and store") {
    // batch and store use INDEPENDENT id sequences: id 1 exists on both
    // sides with different text. The colliding batch doc must still find
    // its true store match (id 2), with one output row and the correct
    // Jaccard — not a self-pairing or a mixed-prefix miss.
    val store = Seq(
      (1L, "an entirely different store document about spark and scale"),
      (2L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"), // near dup of STORE 2, id collides with STORE 1
      (3L, "completely novel content nothing like the store at all xyzzy")
    ).toDF("doc_id", "text")
    val r = Dedup.incrementalDedup(batch, store, "text", "doc_id",
      shingleN = 3, threshold = 0.6).orderBy("doc_id").collect()
    assert(r.length == 2, s"expected one row per batch doc, got ${r.length}")
    assert(r(0).getLong(0) == 1L && !r(0).getBoolean(1))
    assert(r(0).getLong(2) == 2L, s"best_old_id ${r(0).get(2)}")
    assert(r(0).getDouble(3) >= 0.6)
    assert(r(1).getLong(0) == 3L && r(1).isNullAt(2))
  }
}
