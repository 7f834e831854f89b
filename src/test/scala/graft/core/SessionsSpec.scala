package graft.core

import graft.SparkSpec

/** Conf lock for the runtime-replan trio (round-11 verdict ask #6):
  * AQE skew-join splitting, runtime bloom filters, and dynamic
  * partition pruning are probe-proven scale infrastructure (PLANS.md:
  * 2.4× straggler split at ×100; 27×/33× fewer fact rows/bytes
  * shuffled; DPP partition-leg prune). Until this suite they were
  * probe evidence only — one conf regression away from silently
  * vanishing. The checksum-equality side of skew handling is
  * property-locked in PropertySpec (salted agg/join ≡ unsalted).
  */
class SessionsSpec extends SparkSpec {

  private val trio = Seq(
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.optimizer.runtime.bloomFilter.enabled",
    "spark.sql.optimizer.dynamicPartitionPruning.enabled")

  test("engineConfs pins every runtime-replan mechanism explicitly") {
    trio.foreach { k =>
      assert(Sessions.engineConfs.get(k).contains("true"),
        s"$k must be explicitly pinned true in Sessions.engineConfs — " +
          "inheriting the Spark default leaves it one upstream change " +
          "from silently disabling a measured 100-TB mechanism")
    }
  }

  test("no runtime-replan mechanism is disabled in the live session") {
    trio.foreach { k =>
      assert(spark.conf.get(k) == "true",
        s"$k is OFF in the active session: a scale mechanism the ×100 " +
          "probes depend on has been disabled")
    }
  }
}
