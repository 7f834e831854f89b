package graft.core

/** Deterministic, reusable scratch directories for queries that
  * materialize through a filesystem round trip (publish / export legs).
  * A fresh `Files.createTempDirectory` per invocation leaks one corpus
  * copy under /tmp on EVERY bench/verify pass (round-9 advice); here
  * each tag maps to ONE fixed slot under `java.io.tmpdir` whose prior
  * run subdirs are reclaimed once provably abandoned — repeated runs
  * reuse bounded space, and nothing accumulates past the grace window.
  */
object Scratch {
  /** Grace window: a prior run younger than this is never reclaimed,
    * even if its owner cannot be confirmed alive — covers the create →
    * owner-file write gap of a concurrent process, and owner files a
    * caller's own overwrite-mode write may have clobbered. */
  private val MaxAgeMs = 2L * 60 * 60 * 1000

  /** Run paths issued by THIS jvm and not yet released — these are never
    * reclaimed, however old: the production call sites (q157, q161,
    * q186) return LAZY frames that re-read the scratch files at the
    * caller's action time, so a same-JVM run older than the grace
    * window can still have a live reader (round-11 advice: treating
    * pid == self as abandoned raced exactly that reader). A dead pid in
    * `.owner` still proves abandonment for OTHER jvms' runs, and this
    * jvm's unreleased runs are reclaimed by the next session once this
    * pid dies. Harnesses bound in-session accumulation by calling
    * [[releaseAll]] between queries, at the same safe point they drain
    * checkpoint snapshots (a query's terminal action has run, so no
    * lazy frame still reads the previous run's files). */
  private val live = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** A fresh, empty directory under the tag's fixed slot. A prior run is
    * reclaimed only when BOTH (a) it is provably abandoned — its owner
    * JVM (pid recorded in `.owner` at creation; unreadable counts as
    * dead) is not alive, or the owner is this jvm AND the caller
    * explicitly [[release]]d the path (issued-and-unreleased paths stay
    * pinned: a lazy frame may still read them) — and (b) it is older
    * than the grace window, so a CONCURRENT process on the same tag can
    * never have its active run wiped mid-read (round-10 advice:
    * `synchronized` is JVM-local, a whole-slot wipe raced other JVMs).
    * Correctness never rests on reclaim: the returned directory is a
    * NEWLY CREATED unique subdir, so stale files can neither leak into
    * this run's results nor race its reads — reclaim bounds
    * accumulation (≤ one grace window of abandoned runs, any mix of
    * owners), the unique subdir guarantees isolation. Residual
    * exposure: an unrelated process reusing a dead owner's pid delays
    * that run's reclaim until the squatter exits.
    */
  def dir(tag: String): String = synchronized {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_scratch", tag)
    java.nio.file.Files.createDirectories(root)
    val cutoff = System.currentTimeMillis() - MaxAgeMs
    val self = ProcessHandle.current().pid()
    Option(root.toFile.listFiles()).getOrElse(Array.empty).foreach { f =>
      val abandoned = try {
        val pid = new String(java.nio.file.Files.readAllBytes(
          f.toPath.resolve(".owner"))).trim.toLong
        if (pid == self) !live.containsKey(f.getAbsolutePath)
        else !ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
      } catch { case _: Exception => true }
      if (abandoned && f.lastModified() < cutoff) delete(f)
    }
    val run = java.nio.file.Files.createTempDirectory(root, "run")
    java.nio.file.Files.write(run.resolve(".owner"),
      ProcessHandle.current().pid().toString.getBytes("UTF-8"))
    live.put(run.toAbsolutePath.toString, true)
    run.toString
  }

  /** Declare this jvm done with a run dir issued by [[dir]]: the path
    * becomes reclaim-eligible once past the grace window. Optional —
    * an unreleased run is reclaimed by a later session after this jvm
    * exits; releasing just lets a long-lived session bound its own
    * accumulation when the caller KNOWS no lazy frame still reads it. */
  def release(path: String): Unit =
    live.remove(new java.io.File(path).getAbsolutePath)

  /** Release every run this jvm issued. SAFE ONLY between queries —
    * the same contract as `Checkpoints.releaseSessionSnapshots`, and
    * wired at the same harness points (Bench's engine reset, Verify's
    * post-write cleanup). Reclaim still waits for the grace window, so
    * even a mistaken release cannot wipe a dir a concurrent process
    * just started reading. Returns how many paths were released. */
  def releaseAll(): Int = {
    val n = live.size()
    live.clear()
    n
  }

  private[core] def delete(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete()
  }
}
