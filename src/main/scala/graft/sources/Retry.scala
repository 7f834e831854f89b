package graft.sources

/** S4 — retry-on-bad-read connector policy (reference: re-pull a
  * sensor-day up to 5× when all 2,880 rows come back NA,
  * /root/reference/R/_pull_data.R:424-434). A connector-level concern,
  * not a relational operator: wrap any source fetch with a validity
  * predicate and a bounded retry budget.
  */
object Retry {
  /** Run `fetch` up to `attempts` times until `valid` accepts the
    * result (or attempts exhaust — the last result is returned either
    * way, matching the reference, which keeps the final pull).
    */
  def until[T](attempts: Int, sleepMs: Long = 10)(valid: T => Boolean)(fetch: () => T): T = {
    var last = fetch()
    var n = 1
    while (n < attempts && !valid(last)) {
      Thread.sleep(sleepMs)
      last = fetch()
      n += 1
    }
    last
  }
}
