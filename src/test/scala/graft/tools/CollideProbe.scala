package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway-style probe (test scope): accidental cross-cluster
  * collision rate of the media/audio near-dup signatures — every id a
  * SINGLETON cluster (multiples of 32), so any reported pair is a
  * false cross-cluster collision.
  */
object CollideProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val ids = (0 until n).map(_.toLong * 32).toDF("id")
    val wav = graft.ops.Multimodal.syntheticWav(ids, "id")
    println(s"AUDIO singleton-cluster false pairs (n=$n): " +
      graft.ops.Multimodal.nearDupAudio(wav, windows = 8, maxHamming = 3).count())
    val png = graft.ops.Multimodal.syntheticPng(ids, "id")
    println(s"IMAGE singleton-cluster false pairs (n=$n): " +
      graft.ops.Multimodal.nearDupMedia(png, dim = 16, maxHamming = 3).count())
    spark.stop()
  }
}
