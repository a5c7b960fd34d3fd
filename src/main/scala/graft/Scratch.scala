package graft

import java.nio.file.{Files, Path, Paths}

/** Per-process scratch root for the driver-facing mains (Bench,
  * Verify): every `createTempDirectory` a query or operator makes
  * lands under ONE deletable root instead of littering /tmp — a
  * 5-hour session once left 14,560 stale `graft-*` directories there,
  * and the resulting directory-metadata latency made commit-protocol
  * queries measure 2–4× slow (a fake regression that cost an
  * adjudication cycle). Installed BEFORE the SparkSession exists so
  * Spark's own temp dirs ride along; removed on JVM exit (best-effort
  * — a killed JVM leaves one root, trivially cleaned next run). */
object Scratch {
  def install(prefix: String): Path = {
    val root = Files.createTempDirectory(s"graft-$prefix-scratch")
    System.setProperty("java.io.tmpdir", root.toString)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        val walk = Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
        finally walk.close()
      } catch { case _: Throwable => () }))
    // also reap roots a KILLED previous run left behind (best-effort)
    val tmp = Paths.get("/tmp")
    if (Files.isDirectory(tmp)) {
      val ls = Files.list(tmp)
      try ls.iterator().asInstanceOf[java.util.Iterator[Path]].forEachRemaining { p =>
        val n = p.getFileName.toString
        if (n.startsWith(s"graft-$prefix-scratch") && p != root &&
            Files.getLastModifiedTime(p).toMillis <
              System.currentTimeMillis() - 6L * 3600 * 1000) {
          try {
            val w = Files.walk(p)
            try w.sorted(java.util.Comparator.reverseOrder())
              .forEach(q => { Files.deleteIfExists(q); () })
            finally w.close()
          } catch { case _: Throwable => () }
        }
      } finally ls.close()
    }
    root
  }
}
