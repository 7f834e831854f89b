package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native winnowing selection must equal the composable SQL
  * formulation (explode positions → md5 window min → full-window
  * filter → distinct) — the form the DuckDB oracle runs — on random
  * inputs and on every degenerate shape.
  */
class WinnowSelectSpec extends SparkSpec {
  import spark.implicits._

  /** The reference formulation selectedFps used before the native
    * expression — kept verbatim as the parity pin.
    */
  private def reference(df: DataFrame, k: Int, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = df
      .select(col("id"),
        explode(when(length(col("text")) >= k,
          sequence(lit(1), length(col("text")) - k + 1))
          .otherwise(array().cast("array<int>"))).as("__p"),
        col("text"))
      .select(col("id"), col("__p"),
        conv(substring(md5(col("text").substr(col("__p"), lit(k))), 1, 8), 16, 10)
          .cast("long").as("__h"))
    val win = Window.partitionBy(col("id")).orderBy(col("__p"))
      .rowsBetween(Window.currentRow, w - 1)
    val nPos = Window.partitionBy(col("id"))
    grams
      .withColumn("__wmin", min(col("__h")).over(win))
      .withColumn("__npos", count(lit(1)).over(nPos))
      .where(col("__p") <= greatest(col("__npos") - w + 1, lit(1)))
      .select(col("id"), col("__wmin").as("fp"))
      .distinct()
  }

  private def native(df: DataFrame, k: Int, w: Int): DataFrame =
    df.select(col("id"),
      explode(MinHashExprs.winnowFps(col("text"), k, w)).as("fp"))
      .distinct()

  private def sets(df: DataFrame): Map[Long, Set[Long]] =
    df.as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap

  test("native winnow selection equals the window formulation on random text") {
    val rnd = new scala.util.Random(13)
    val alpha = "abcdefg hij"
    val docs = (1L to 60L).map { i =>
      val n = rnd.nextInt(120) // includes lengths < k and < k+w
      (i, (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }.toDF("id", "text")
    for ((k, w) <- Seq((8, 4), (5, 3), (3, 1)))
      assert(sets(native(docs, k, w)) == sets(reference(docs, k, w)),
        s"k=$k w=$w")
  }

  test("degenerate shapes: empty, shorter than k, between k and k+w, repeats") {
    val docs = Seq(
      (1L, ""), (2L, "abc"), (3L, "exactly9!"),
      (4L, "aaaaaaaaaaaaaaaaaaaa"), // all k-grams identical
      (5L, "abcdefghijk")).toDF("id", "text")
    assert(sets(native(docs, 8, 4)) == sets(reference(docs, 8, 4)))
    // explicit: too-short docs select nothing, 0 < P < w selects one
    val got = sets(native(docs, 8, 4))
    assert(!got.contains(1L) && !got.contains(2L))
    assert(got(3L).size == 1 && got(4L).size == 1)
  }
}
