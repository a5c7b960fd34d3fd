package graft

import java.nio.file.{Files, Path, Paths}

/** Per-process scratch root: every temp directory a query, operator or
  * spec makes lands under ONE deletable root instead of littering
  * /tmp — a 5-hour session once left 14,560 stale `graft-*`
  * directories there, and the resulting directory-metadata latency
  * made commit-protocol queries measure 2–4× slow (a fake regression
  * that cost an adjudication cycle).
  *
  * Call sites MUST use `Scratch.dir(prefix)` rather than
  * `Files.createTempDirectory(prefix)`: the JDK captures
  * `java.io.tmpdir` at class-load time (TempFileHelper), so setting
  * the property after JVM start does NOT redirect the no-`dir`
  * overload — the round-13 setProperty-only version was a no-op for
  * exactly the litter it targeted. `dir` resolves the root
  * explicitly, so it works in Bench/Verify (which `install` eagerly)
  * AND in sbt test JVMs (which self-install lazily on first use).
  * The root is removed by a shutdown hook; a killed JVM leaves one
  * root, which the reaper below deletes on the next `install`. */
object Scratch {
  @volatile private var installedRoot: Path = _

  /** The process scratch root; lazily created (with its cleanup hook)
    * if `install` was never called (the sbt-test path). */
  def root: Path = {
    var r = installedRoot
    if (r == null) synchronized {
      r = installedRoot
      if (r == null) { r = makeRoot("auto"); installedRoot = r }
    }
    r
  }

  /** Replacement for `Files.createTempDirectory(prefix)` that lands
    * under the self-cleaning root. */
  def dir(prefix: String): Path = Files.createTempDirectory(root, prefix)

  private def makeRoot(prefix: String): Path = {
    val r = Files.createTempDirectory(s"graft-$prefix-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(r)))
    r
  }

  private def deleteTree(p: Path): Unit =
    try {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => { Files.deleteIfExists(q); () })
      finally walk.close()
    } catch { case _: Throwable => () }

  /** Eager install for the driver-facing mains (Bench, Verify): pins
    * the root BEFORE the SparkSession exists, points java.io.tmpdir
    * at it (best-effort, for libraries that read the property at call
    * time), and reaps aged `graft-*` litter a killed previous run
    * left in /tmp. */
  def install(prefix: String): Path = synchronized {
    val r = makeRoot(prefix)
    installedRoot = r
    System.setProperty("java.io.tmpdir", r.toString)
    // reap ANY aged graft-* dir a killed/legacy run left behind:
    // scratch roots, and the pre-round-14 direct litter
    // (graft-q*/graft-stream-*/graft-events-*/graft-diabetes-* etc.)
    val tmp = Paths.get("/tmp")
    if (Files.isDirectory(tmp)) {
      val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
      val ls = Files.list(tmp)
      try ls.iterator().forEachRemaining { p =>
        val n = p.getFileName.toString
        if (n.startsWith("graft-") && p != r &&
            (try Files.getLastModifiedTime(p).toMillis < cutoff
             catch { case _: Throwable => false }))
          deleteTree(p)
      } finally ls.close()
    }
    r
  }
}
