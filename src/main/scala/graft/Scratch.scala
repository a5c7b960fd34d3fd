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

  /** Minimum usable bytes a candidate scratch volume must offer before
    * the root lands on it (24 GiB — a full sf0.1 bench run's scratch
    * high-water is well under half that; a volume below the bar gets
    * skipped rather than risking mid-run ENOSPC). */
  private val MinUsableBytes = 24L * 1024 * 1024 * 1024

  /** Where the root goes, in preference order: an explicit
    * SPARK_GRAFT_SCRATCH override; /dev/shm when it is a writable
    * directory with [[MinUsableBytes]] to spare (RAM-backed — the
    * round-17 tmpfs control run proved the scratch volume's disk
    * throttling inflates commit-protocol queries 1.3×, ~80 s/suite,
    * on identical code); else the JVM's default temp dir. Capacity is
    * re-probed at every root creation, not cached: a bench and a test
    * JVM may start hours apart. */
  private def baseDir: Option[Path] = {
    def usable(p: Path): Boolean =
      try Files.isDirectory(p) && Files.isWritable(p) &&
        Files.getFileStore(p).getUsableSpace >= MinUsableBytes
      catch { case _: Throwable => false }
    sys.env.get("SPARK_GRAFT_SCRATCH").map(Paths.get(_)).filter(usable)
      .orElse(Some(Paths.get("/dev/shm")).filter(usable))
  }

  private def makeRoot(prefix: String): Path = {
    val r = baseDir match {
      case Some(b) => Files.createTempDirectory(b, s"graft-$prefix-scratch")
      case None => Files.createTempDirectory(s"graft-$prefix-scratch")
    }
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
    // (graft-q*/graft-stream-*/graft-events-*/graft-diabetes-* etc.).
    // /dev/shm litter is RAM — a leaked root there shrinks the very
    // memory the executors run in, so it reaps on a shorter fuse.
    def reap(dir: Path, ageMs: Long): Unit = if (Files.isDirectory(dir)) {
      val cutoff = System.currentTimeMillis() - ageMs
      val ls = Files.list(dir)
      try ls.iterator().forEachRemaining { p =>
        val n = p.getFileName.toString
        if (n.startsWith("graft-") && p != r &&
            (try Files.getLastModifiedTime(p).toMillis < cutoff
             catch { case _: Throwable => false }))
          deleteTree(p)
      } finally ls.close()
    }
    reap(Paths.get("/tmp"), 6L * 3600 * 1000)
    reap(Paths.get("/dev/shm"), 2L * 3600 * 1000)
    r
  }
}
