package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-scoped scaling-corpus builder (NOT graded surface): derive an
  * R×-replicated copy of a driver fixture directory for the time-vs-scale
  * probes in PLANS.md, without synthesizing new content distributions.
  *
  * Each replica r ∈ [0, R) offsets every id column by r·10⁸ and, for
  * r > 0, applies a per-replica alphabet rotation (`translate`) to text
  * columns. A character bijection preserves string lengths, token
  * structure, edit distances, and char-shingle Jaccard EXACTLY, so each
  * replica carries the original corpus's near-dup/block/frequency shape,
  * while replicas share (almost) no shingles or tokens with each other —
  * the workload grows like a genuinely larger corpus rather than like
  * 25× duplicated content. Embeddings rotate the vector by r positions
  * (norm- and intra-replica-similarity-preserving).
  *
  * Usage: Test/runMain graft.tools.ScaleUp <srcDir> <outDir> <R>
  */
object ScaleUp {
  /** Per-replica id offset. Two constraints: (a) large enough that
    * replica id ranges stay disjoint even after q104's `supp = key +
    * 10M` derivation; (b) a MULTIPLE of 32, so each replica's ids stay
    * aligned to the media fixtures' 32-id duplicate clusters
    * (`Multimodal.mediaCluster = id >>> 5`) — aligned replicas carry an
    * exact copy of the base corpus's cluster-size structure, and their
    * cluster IDS are fresh integers whose hashed patterns share nothing
    * with any other replica, so media near-dup output scales ~R× like a
    * genuinely larger crawl. (The round-9 verdict hypothesized the old
    * quadratic media growth was an offset-congruence artifact; measured
    * ×2 runs disproved that — pairs grew 4.08× under a class-rotating
    * offset too. The actual cause was the generators' fixed 32-class
    * `id mod 32` key, fixed generator-side; see PLANS.md.)
    */
  val IdOff = 100000000L
  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  private def rot(s: String, r: Int): String = {
    val k = (r * 7) % 26
    s.drop(k) + s.take(k)
  }

  /** Per-replica char bijection; identity at r = 0. */
  def salt(c: org.apache.spark.sql.Column, r: Int): org.apache.spark.sql.Column =
    if (r == 0) c
    else translate(c, Lower + Upper, rot(Lower, r) + rot(Upper, r))

  def replicate(df: DataFrame, replicas: Int,
                idCols: Seq[String], textCols: Seq[String] = Nil,
                vecCols: Seq[String] = Nil): DataFrame =
    (0 until replicas).map { r =>
      var d = df
      idCols.foreach(ic => d = d.withColumn(ic, col(ic) + lit(r * IdOff)))
      textCols.foreach(tc => d = d.withColumn(tc, salt(col(tc), r)))
      vecCols.foreach { vc =>
        if (r > 0) {
          val n = size(col(vc))
          val k = lit(r) % n
          d = d.withColumn(vc,
            concat(slice(col(vc), k + 1, n - k), slice(col(vc), lit(1), k)))
        }
      }
      d
    }.reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, rStr) = args.take(3)
    val replicas = rStr.toInt
    // "mediaOnly": (re)materialize just the media payload tables into an
    // ALREADY-BUILT scale dir — the base tables are expensive at ×100
    // and unchanged by media work
    val mediaOnly = args.length > 3 && args(3) == "mediaOnly"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rd(n: String) = spark.read.parquet(s"$srcDir/$n.parquet")
    val jobs: Seq[(String, DataFrame)] = Seq(
      "documents" -> replicate(rd("documents"), replicas,
        idCols = Seq("doc_id"), textCols = Seq("text")),
      "embeddings" -> replicate(rd("embeddings"), replicas,
        idCols = Seq("vec_id"), vecCols = Seq("embedding")),
      "part" -> replicate(rd("part"), replicas,
        idCols = Seq("p_partkey"), textCols = Seq("p_name")),
      "orders" -> replicate(rd("orders"), replicas,
        idCols = Seq("o_orderkey", "o_custkey")),
      "lineitem" -> replicate(rd("lineitem"), replicas,
        idCols = Seq("l_orderkey", "l_partkey", "l_suppkey")),
      // the remaining fact/dim tables, so a FULL-BOARD bench can run
      // against the scaled dir (round-9): fact keys offset per replica,
      // preserving FK structure replica-locally (o_custkey ↔ c_custkey,
      // l_suppkey ↔ s_suppkey, events.user_id self-joins); the fixed
      // nation/region dims copy through unchanged and the un-offset
      // *_nationkey columns still join them
      "events" -> replicate(rd("events"), replicas,
        idCols = Seq("event_id", "user_id")),
      "customer" -> replicate(rd("customer"), replicas,
        idCols = Seq("c_custkey")),
      "supplier" -> replicate(rd("supplier"), replicas,
        idCols = Seq("s_suppkey")),
      "nation" -> rd("nation"),
      "region" -> rd("region")
    )
    if (!mediaOnly) jobs.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scaleup] $name x$replicas -> $outDir/$name.parquet")
    }
    // Materialize the media payload tables the bench queries read via
    // Tables.media, so scaled runs measure decode + join instead of
    // fixture synthesis (round-10 verdict: q162's ×20 row conflated
    // them). Synthesized from the SCALED documents ids — exactly what
    // the queries' fallback would compute, persisted once. The
    // (params → table name) map mirrors the registry's generator calls.
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    val media: Seq[(String, DataFrame)] = Seq(
      "media_png8" -> graft.ops.Multimodal.syntheticPng(docs, "doc_id"),
      "media_wav" -> graft.ops.Multimodal.syntheticWav(docs, "doc_id"),
      "media_avi_f4s8r10" -> graft.ops.Multimodal.syntheticAvi(
        docs, "doc_id", frames = 4, size = 8, fps = 10),
      "media_avi_f5s8r25" -> graft.ops.Multimodal.syntheticAvi(
        docs.where(col("doc_id") % 7 === 0), "doc_id",
        frames = 5, size = 8, fps = 25),
      "media_avi_f6s8r10" -> graft.ops.Multimodal.syntheticAvi(
        docs.where(col("doc_id") % 7 === 3), "doc_id",
        frames = 6, size = 8, fps = 10),
      "media_avi_dc_f4s64r10" -> graft.ops.Multimodal.syntheticAviDc(
        docs.where((col("doc_id") / 32).cast("long") % 2 === 0), "doc_id",
        frames = 4, size = 64, fps = 10)
    )
    media.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scaleup] $name -> $outDir/$name.parquet")
    }
    spark.stop()
  }
}
