package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-scoped measurement probe (NOT graded surface): before/after
  * candidate accounting for the PPJoin positional filter (round-13
  * commits 3a2e701/e559f50/10ad36b) across the three exact-dedup ops —
  * the round-13 verdict asked for the "strictly fewer verify
  * survivors" claim to carry numbers at ×1/×10/×100.
  *
  * For each op this MIRRORS the operator's candidate stage (same
  * shingle/rank/length filters, in-package so it reuses the shared
  * [[Dedup.packRanks]] helpers) and reports:
  *   - stream: rows entering the pair groupBy (the candidate join's
  *     output — identical with or without the filter; the filter adds
  *     no shuffle). Counted by its own action — NEVER checkpointed:
  *     the real operators stream this through the hash aggregate, and
  *     pinning it in the block manager OOMed the probe at ×10
  *   - pre:  distinct pairs after the length filter only — the verify
  *     join's input under the OLD plain-distinct code
  *   - post: pairs surviving the positional filter — the verify join's
  *     input now
  *
  * The verify join cost scales with pre/post directly: each surviving
  * pair hydrates two shingle arrays. Usage:
  *   Test/runMain graft.ops.PpjoinProbe <sfDir>
  */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    graft.core.Sessions.engineConfs.foreach { case (k, v) =>
      builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new graft.GraftExtensions().registerOn(spark)
    import org.apache.spark.sql.expressions.Window

    def report(op: String, stream: Long, pre: Long, post: Long): Unit =
      println(f"[ppjoin] $op%-12s sf=$sfDir stream=$stream%d pre=$pre%d " +
        f"post=$post%d kept=${if (pre == 0) 1.0 else post.toDouble / pre}%.4f")

    // ---- q59: similarityJoinPrefix(docs<300, 3-gram, t=0.7, cap 2000)
    {
      val t = 0.7
      val df = graft.core.Tables.load(spark, sfDir, "documents")
        .where(col("doc_id") < 300)
      val sh = df.select(col("doc_id"),
        TextAnalysis.charNgrams(col("text"), 3).as("__sh"))
        .localCheckpoint()
      val toks = sh.select(col("doc_id"), size(col("__sh")).as("__len"),
        explode(col("__sh")).as("__tok"))
      val freq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__freq"))
      val prefix = toks.join(freq, Seq("__tok"))
        .withColumn("__r", row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("__freq").asc, col("__tok").asc)))
        .where(col("__r") <= col("__len") - ceil(lit(t) * col("__len") - lit(1e-9)) + 1)
        .where(col("__freq") <= 2000L)
        .select(col("__tok"), col("doc_id"), col("__len"), col("__r"))
        .localCheckpoint()
      val stream = prefix.select(col("__tok"), col("doc_id").as("id_a"),
          col("__len").as("__la"), col("__r").as("__ra"))
        .join(prefix.select(col("__tok"), col("doc_id").as("id_b"),
          col("__len").as("__lb"), col("__r").as("__rb")), Seq("__tok"))
        .where(col("id_a") < col("id_b") &&
          col("__lb") >= lit(t) * col("__la") - lit(1e-9) &&
          col("__la") >= lit(t) * col("__lb") - lit(1e-9))
      val agg = stream.groupBy(col("id_a"), col("id_b"))
        .agg(min(Dedup.packRanks(col("__ra"), col("__rb"))).as("__pk"),
          max(col("__la")).as("__la"), max(col("__lb")).as("__lb"))
      val post = agg.where(lit(1) +
        least(col("__la") - Dedup.packedHi(col("__pk")),
          col("__lb") - Dedup.packedLo(col("__pk"))) >=
        ceil(lit(t / (1.0 + t)) * (col("__la") + col("__lb")) - lit(1e-9)))
      report("q59_simjoin", stream.count(), agg.count(), post.count())
    }

    // ---- q92: containmentPairs(docs<300, 3-gram, 700000 ppm)
    {
      val tPpm = 700000L
      val df = graft.core.Tables.load(spark, sfDir, "documents")
        .where(col("doc_id") < 300)
      val sh = df.select(col("doc_id"),
        TextAnalysis.charNgrams(col("text"), 3).as("__sh"))
        .localCheckpoint()
      val toks = sh.select(col("doc_id"), size(col("__sh")).cast("long").as("__len"),
        explode(col("__sh")).as("__tok"))
      val freq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__freq"))
      val ranked = toks.join(freq, Seq("__tok"))
        .withColumn("__r", row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("__freq").asc, col("__tok").asc)))
        .select(col("__tok"), col("doc_id"), col("__len"), col("__r"))
        .localCheckpoint()
      val prefix = ranked.where(col("__r") <=
        col("__len") - expr(s"(__len * $tPpm + 999999) div 1000000") + 1)
      val stream = prefix
        .select(col("__tok"), col("doc_id").as("__is"),
          col("__len").as("__ls"), col("__r").as("__rs"))
        .join(ranked.select(col("__tok"), col("doc_id").as("__io"),
          col("__len").as("__lo"), col("__r").as("__ro")), Seq("__tok"))
        .where(col("__ls") < col("__lo") ||
          (col("__ls") === col("__lo") && col("__is") =!= col("__io")))
      val agg = stream.groupBy(least(col("__is"), col("__io")).as("id_a"),
          greatest(col("__is"), col("__io")).as("id_b"))
        .agg(min(Dedup.packRanks(col("__rs"), col("__ro"))).as("__pk"),
          max(col("__ls")).as("__ls"), max(col("__lo")).as("__lo"))
      val post = agg.where(lit(1L) +
        least(col("__ls") - Dedup.packedHi(col("__pk")),
          col("__lo") - Dedup.packedLo(col("__pk"))) >=
        expr(s"(__ls * $tPpm + 999999) div 1000000"))
      report("q92_contain", stream.count(), agg.count(), post.count())
    }

    // ---- q85: incrementalDedup(batch = id%7==3, store = rest, t=0.7)
    {
      val t = 0.7
      val d = graft.core.Tables.load(spark, sfDir, "documents")
      val tagged = d.where(col("doc_id") % 7 === 3)
        .select(col("doc_id"), col("text"), lit(true).as("__new"))
        .unionByName(d.where(col("doc_id") % 7 =!= 3)
          .select(col("doc_id"), col("text"), lit(false).as("__new")))
      val sh = tagged.select(col("doc_id"), col("__new"),
        TextAnalysis.charNgrams(col("text"), 3).as("__sh"))
        .localCheckpoint()
      val toks = sh.select(col("doc_id"), col("__new"),
        size(col("__sh")).as("__len"), explode(col("__sh")).as("__tok"))
      val freq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__freq"))
      val prefix = toks.join(freq, Seq("__tok"))
        .withColumn("__r", row_number().over(
          Window.partitionBy(col("doc_id"), col("__new"))
            .orderBy(col("__freq").asc, col("__tok").asc)))
        .where(col("__r") <= col("__len") - ceil(lit(t) * col("__len") - lit(1e-9)) + 1)
        .select(col("__tok"), col("doc_id"), col("__new"), col("__len"), col("__r"))
        .localCheckpoint()
      val stream = prefix.where(col("__new"))
        .select(col("__tok"), col("doc_id").as("__nid"),
          col("__len").as("__ln"), col("__r").as("__rn"))
        .join(prefix.where(!col("__new"))
          .select(col("__tok"), col("doc_id").as("__oid"),
            col("__len").as("__lo"), col("__r").as("__ro")), Seq("__tok"))
        .where(col("__lo") >= lit(t) * col("__ln") - lit(1e-9) &&
          col("__ln") >= lit(t) * col("__lo") - lit(1e-9))
      val agg = stream.groupBy(col("__nid"), col("__oid"))
        .agg(min(Dedup.packRanks(col("__rn"), col("__ro"))).as("__pk"),
          max(col("__ln")).as("__ln"), max(col("__lo")).as("__lo"))
      val post = agg.where(lit(1) +
        least(col("__ln") - Dedup.packedHi(col("__pk")),
          col("__lo") - Dedup.packedLo(col("__pk"))) >=
        ceil(lit(t / (1.0 + t)) * (col("__ln") + col("__lo")) - lit(1e-9)))
      report("q85_incr", stream.count(), agg.count(), post.count())
    }

    spark.stop()
  }
}
