package graft.util

import java.nio.file.{Files, Path}

/** Self-cleaning temp directories for run-scoped fixtures (round-4
  * ADVICE: bare Files.createTempDirectory fixtures leaked one small
  * dir per JVM run of the sweep/tests — thousands of orphans in /tmp
  * across driver rounds). Every dir created here is recursively
  * deleted by a single JVM shutdown hook; contents are builder-authored
  * fixture files, never user data. */
object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach(deleteRecursively)))

  /** Create a temp dir that deletes itself (and everything under it)
    * at JVM exit. */
  def create(prefix: String): Path = {
    hookInstalled
    val d = Files.createTempDirectory(prefix)
    dirs.add(d)
    d
  }

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.isDirectory(p)) {
        // Files.list holds an open DirectoryStream until close() — the
        // shutdown sweep walks thousands of dirs, so an unclosed stream
        // per dir would exhaust fds mid-sweep (closing here bounds open
        // fds by nesting depth, not dir count).
        val children = Files.list(p)
        try children.forEach(deleteRecursively)
        finally children.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: Exception => () } // best effort at shutdown
  }
}
