package graft.tools

import graft.queries.Registry

/** Dev utility: time named registry queries (count action) at a given
  * SF dir, repeated, with per-run seconds. Usage:
  * runMain graft.tools.TimeQuery <sfDir> <cpus> <name>...
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.core.Sessions.local(args(1).toInt)
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val cnt = Registry.queries(n)(spark, sfDir).count()
        println(f"[time] $n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$cnt")
      }
    }
    spark.stop()
  }
}
