package graft.util

import java.nio.file.{Files, LinkOption, Path}

/** Session-scratch directories for queries that need an on-disk layer
  * interchange (medallion runs, stream sources, sink round-trips).
  *
  * `Files.createTempDirectory` alone leaks: a long-lived session running
  * all driver queries accumulates one orphan tree per invocation.
  * Every directory handed out here is registered once and removed
  * recursively by a single JVM shutdown hook.
  */
object Scratch {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach(deleteRecursively)
    }))

  /** A fresh temp directory that is deleted (recursively) on JVM exit. */
  def dir(prefix: String): Path = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p
  }

  private def deleteRecursively(p: Path): Unit = {
    try {
      // NOFOLLOW: a symlink inside a scratch tree must be removed as a
      // link, never traversed — following it would delete content
      // OUTSIDE the scratch dir. The stream is closed explicitly (it
      // holds a directory fd; leaking one per directory matters inside
      // a shutdown hook that walks many trees).
      if (Files.isDirectory(p, LinkOption.NOFOLLOW_LINKS)) {
        val children = Files.list(p)
        try children.forEach(deleteRecursively)
        finally children.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: Exception => () } // best-effort: exit-time cleanup
  }
}
