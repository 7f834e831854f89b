package graft.tools

import graft.queries.Registry

/** Dev utility: time named registry queries on a given sf dir.
  * Usage: runMain graft.tools.TimeQuery <sfDir> <name> [<name>...]
  * Each query runs twice; both timings print (cold, warm).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = graft.core.Sessions.local()
    names.foreach { n =>
      val fn = Registry.queries(n)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        println(f"TIME $n run$i rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
