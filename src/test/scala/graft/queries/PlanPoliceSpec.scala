package graft.queries

import graft.SparkSpec

/** Plan police: every query in the registry is planned against the
  * smoke fixtures and checked for the one plan shape that cannot
  * survive scale — a non-broadcast cartesian product. Quadratic
  * baselines that exist BY CONTRACT (exact ground truth for ANN
  * recall floors) are whitelisted with their reason; anything else
  * producing a CartesianProduct is a regression.
  *
  * (BroadcastNestedLoopJoin is deliberately not banned: a 1-row
  * broadcast side — scalar rollups joined back — is the correct plan
  * for many queries here, and the broadcast size cap bounds it.)
  */
class PlanPoliceSpec extends SparkSpec {

  new graft.GraftExtensions().registerOn(spark)

  private val sfDir = "/root/testdata/sf0.001"

  // quadratic-by-contract: exact brute-force baselines
  private val cartesianWhitelist = Set(
    "q40_cosine_topk" // exact ANN ground truth; LSH/IVF/PQ are the scale paths
  )

  test("no unlisted CartesianProduct anywhere in the registry") {
    val offenders = Registry.all.flatMap { q =>
      val plan =
        try q.run(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
      if (plan.contains("CartesianProduct") &&
          !cartesianWhitelist.contains(q.name)) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"unlisted cartesian products in: ${offenders.mkString(", ")}")
  }
}
