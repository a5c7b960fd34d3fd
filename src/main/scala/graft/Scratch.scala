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
    * JVM may start hours apart.
    *
    * An EXPLICIT override that fails the probe (missing, unwritable,
    * or under capacity) falls through to the JVM DEFAULT temp dir with
    * a loud stderr warning — never silently to /dev/shm: an operator
    * who pinned scratch to a disk volume precisely to keep it off RAM
    * must not get RAM-backed scratch because of a typo or a full
    * volume. */
  private def baseDir: Option[Path] = {
    def usable(p: Path): Boolean =
      try Files.isDirectory(p) && Files.isWritable(p) &&
        Files.getFileStore(p).getUsableSpace >= MinUsableBytes
      catch { case _: Throwable => false }
    sys.env.get("SPARK_GRAFT_SCRATCH") match {
      case Some(o) =>
        val p = Paths.get(o)
        if (usable(p)) Some(p)
        else {
          System.err.println(s"Scratch: SPARK_GRAFT_SCRATCH=$o is not a " +
            s"writable directory with ${MinUsableBytes >> 30} GiB usable — " +
            "falling back to the JVM default temp dir (NOT /dev/shm: the " +
            "override opted out of automatic volume selection)")
          None
        }
      case None => Some(Paths.get("/dev/shm")).filter(usable)
    }
  }

  /** The liveness beacon a root carries for the reaper: a daemon
    * thread re-touches `<root>/.graft-heartbeat` every
    * [[HeartbeatPeriodMs]], and [[install]]'s reaper skips any
    * candidate whose heartbeat is younger than [[HeartbeatGraceMs]] —
    * so a concurrently RUNNING other JVM (a spec suite alongside a
    * long bench session) never loses its live scratch root to the age
    * fuse mid-run. A killed JVM's heartbeat goes stale within the
    * grace window and the litter reaps as before. */
  private val HeartbeatName = ".graft-heartbeat"
  private val HeartbeatPeriodMs = 5L * 60 * 1000
  private val HeartbeatGraceMs = 30L * 60 * 1000

  private[graft] def touchHeartbeat(root: Path): Unit =
    try {
      val hb = root.resolve(HeartbeatName)
      if (!Files.exists(hb)) { Files.createFile(hb); () }
      else { Files.setLastModifiedTime(hb,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis())); () }
    } catch { case _: Throwable => () }

  private[graft] def heartbeatFresh(p: Path): Boolean =
    try Files.getLastModifiedTime(p.resolve(HeartbeatName)).toMillis >
      System.currentTimeMillis() - HeartbeatGraceMs
    catch { case _: Throwable => false }

  private def makeRoot(prefix: String): Path = {
    val r = baseDir match {
      case Some(b) => Files.createTempDirectory(b, s"graft-$prefix-scratch")
      case None => Files.createTempDirectory(s"graft-$prefix-scratch")
    }
    touchHeartbeat(r)
    val beat = new Thread(() => {
      while (true) { Thread.sleep(HeartbeatPeriodMs); touchHeartbeat(r) }
    })
    beat.setDaemon(true)
    beat.setName("graft-scratch-heartbeat")
    beat.start()
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
        if (n.startsWith("graft-") && p != r && !heartbeatFresh(p) &&
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
