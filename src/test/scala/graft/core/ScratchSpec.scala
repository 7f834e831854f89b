package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ScratchSpec extends AnyFunSuite {

  private def backdate(dir: java.io.File, hours: Int): Unit =
    assert(dir.setLastModified(
      System.currentTimeMillis() - hours.toLong * 3600 * 1000))

  test("an UNRELEASED self-owned run survives any age (a lazy frame may " +
    "still read it); a RELEASED aged run is reclaimed; young runs are " +
    "always protected") {
    val tag = s"spec_self_${System.nanoTime()}"
    val first = new java.io.File(Scratch.dir(tag))
    val second = new java.io.File(Scratch.dir(tag))
    // both young and self-owned: the grace window protects them
    assert(first.exists() && second.exists())
    backdate(first, 3) // past the 2h grace — but never released
    val third = new java.io.File(Scratch.dir(tag))
    assert(first.exists(),
      "aged but unreleased self-owned run must survive: round-11 advice " +
        "— a same-JVM lazy reader may still scan it")
    Scratch.release(first.getAbsolutePath)
    backdate(first, 3) // creating `third` bumped nothing, but re-pin age
    val fourth = new java.io.File(Scratch.dir(tag))
    assert(!first.exists(), "released aged run must be reclaimed")
    assert(second.exists() && third.exists(), "young runs stay protected")
    assert(fourth.exists())
    Scratch.delete(fourth.getParentFile)
  }

  test("an aged run with an unreadable owner counts as abandoned; a " +
    "live foreign owner is never reclaimed") {
    val tag = s"spec_owner_${System.nanoTime()}"
    val orphan = new java.io.File(Scratch.dir(tag))
    java.nio.file.Files.delete(orphan.toPath.resolve(".owner"))
    backdate(orphan, 3)
    // a run owned by a pid that is certainly alive (pid 1) and aged
    val foreign = java.nio.file.Files.createTempDirectory(
      orphan.getParentFile.toPath, "run")
    java.nio.file.Files.write(foreign.resolve(".owner"), "1".getBytes("UTF-8"))
    backdate(foreign.toFile, 3)
    val fresh = new java.io.File(Scratch.dir(tag))
    assert(!orphan.exists(), "ownerless aged run must be reclaimed")
    assert(foreign.toFile.exists(),
      "another live JVM's run must survive any age")
    assert(fresh.exists())
    Scratch.delete(fresh.getParentFile)
  }
}
