package graft.core

/** Deterministic, reusable scratch directories for queries that
  * materialize through a filesystem round trip (publish / export legs).
  * A fresh `Files.createTempDirectory` per invocation leaks one corpus
  * copy under /tmp on EVERY bench/verify pass (round-9 advice); here
  * each tag maps to ONE fixed slot under `java.io.tmpdir` that is wiped
  * and recreated on each call — repeated runs reuse bounded space, and
  * nothing accumulates.
  */
object Scratch {
  /** A fresh, empty directory under the tag's fixed slot. Prior runs'
    * contents are wiped best-effort first, but correctness never rests
    * on the wipe: the returned directory is a NEWLY CREATED unique
    * subdir, so an undeletable stale file (open handle elsewhere, NFS
    * silly-rename) or a concurrent process on the same tag can neither
    * leak into this run's results nor race its reads — the slot bounds
    * accumulation, the unique subdir guarantees isolation (review
    * finding, round-10).
    */
  def dir(tag: String): String = synchronized {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_scratch", tag)
    delete(root.toFile) // best-effort reclaim of previous runs
    java.nio.file.Files.createDirectories(root)
    java.nio.file.Files.createTempDirectory(root, "run").toString
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete()
  }
}
