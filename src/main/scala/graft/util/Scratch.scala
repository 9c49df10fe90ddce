package graft.util

import java.nio.file.{Files, Path}

/** Session-scoped scratch directories: like `Files.createTempDirectory` but
  * registered for recursive deletion at JVM exit, so repeated catalog runs
  * (Verify + Bench + tests write dataset copies for the sink/roundtrip
  * queries) don't accumulate orphaned /tmp data across invocations.
  */
object Scratch {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    created.forEach { root =>
      try
        Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
      catch { case _: Exception => () }
    }))

  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}
