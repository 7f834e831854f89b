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
  def dir(tag: String): String = synchronized {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_scratch", tag)
    delete(root.toFile)
    java.nio.file.Files.createDirectories(root)
    root.toString
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete()
  }
}
