package graft.tools

import graft.queries.Registry

/** Dev utility: print the formatted physical plan of named registry
  * queries. Usage: runMain graft.tools.ExplainQuery <sfDir> <name>...
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = graft.core.Sessions.local(4)
    args.tail.foreach { n =>
      println(s"===== $n =====")
      println(Registry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
