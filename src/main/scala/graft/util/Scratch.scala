package graft.util

import java.nio.file.{Files, Path}

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
      if (Files.isDirectory(p))
        Files.list(p).forEach(deleteRecursively)
      Files.deleteIfExists(p)
    } catch { case _: Exception => () } // best-effort: exit-time cleanup
  }
}
