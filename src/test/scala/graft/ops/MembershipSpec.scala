package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounded-error gate for the Bloom membership sketch (q78) against its
  * exact twin (q77) on the driver's correctness-scale fixture — the
  * same approx-vs-exact discipline as AggsSpec's q58/q74 gates. The
  * Bloom contract has two halves and both are pinned: zero false
  * negatives (a seen key can never probe false), and a false-positive
  * rate near the requested fpp. The filter is deterministic for fixed
  * input (xxhash64 keys, Spark's fixed hash family), so the FN half is
  * a hard gate; the FP half gets 3× slack plus an absolute floor
  * because the fixture's unseen population is only ~400 rows — wide
  * enough to never flake, tight enough to catch a broken hash family
  * (which produces FP rates orders of magnitude over fpp).
  */
class MembershipSpec extends SparkSpec {
  import spark.implicits._

  test("q78 bloom has no false negatives and bounded false positives vs exact q77 (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    val exact = graft.queries.Registry
      .queries("q77_cross_corpus_seen")(spark, dir)
    val approx = graft.queries.Registry
      .queries("q78_bloom_seen")(spark, dir)
    val j = exact.join(approx, Seq("doc_id"))
      .select($"seen", $"maybe_seen").collect()
    assert(j.nonEmpty)
    val falseNegs = j.count(r => r.getBoolean(0) && !r.getBoolean(1))
    assert(falseNegs == 0, s"$falseNegs seen rows probed false — Bloom may never false-negative")
    val unseen = j.filter(r => !r.getBoolean(0))
    val fps = unseen.count(_.getBoolean(1))
    val fpp = 0.01 // q78 builds its filter at fpp = 0.01
    val bound = 3 * fpp * unseen.length + 10
    assert(fps <= bound,
      s"$fps false positives among ${unseen.length} unseen rows exceeds bound $bound (fpp=$fpp)")
  }
}
