package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Crash-safe directory replacement for plain-parquet table rewrites —
  * the shared choreography under [[Compaction]] and
  * [[graft.streaming.StreamingUpsert]]. Two renames can't be one atomic
  * operation on a POSIX filesystem, so the danger window (live moved to
  * trash, replacement not yet moved in) is closed by RECOVERY instead:
  * callers invoke [[recover]] before reading the live directory, which
  * restores a trash snapshot if a previous swap died mid-flight and
  * clears stale trash if it died after completing. On an object store
  * you would use a manifest/table format instead — this is the
  * plain-parquet approximation of that trade.
  *
  * MULTI-WRITER: every swap runs under a per-table create-exclusive lock
  * FILE, so two concurrent writers cannot interleave the rename pairs —
  * the loser fails cleanly with [[ConcurrentSwapException]] and its tmp
  * output survives for a retry (the plain-parquet analogue of a table
  * format's optimistic concurrency conflict). [[withWriterLock]] widens
  * the exclusion to a whole write-then-swap span; [[breakLock]] is the
  * operator override for locks orphaned by a crashed writer.
  */
object AtomicSwap {

  /** A second writer attempted a swap while another held the table's
    * writer lock. The loser must retry AFTER the winner finishes (or give
    * up) — its tmp directory is untouched, so no work is lost. */
  final class ConcurrentSwapException(msg: String) extends RuntimeException(msg)

  private def trashOf(live: String): Path = Paths.get(live + ".swap_old")
  private def lockOf(live: String): Path =
    Paths.get(Paths.get(live).toAbsolutePath.normalize.toString + ".swap_lock")

  /** liveDirs whose lock THIS thread already holds (via [[withWriterLock]])
    * — makes the swap calls inside the block reentrant instead of
    * self-colliding on the lock file. */
  private val heldByThread = new ThreadLocal[Set[String]] {
    override def initialValue: Set[String] = Set.empty
  }
  private def lockKey(live: String): String =
    Paths.get(live).toAbsolutePath.normalize.toString

  /** Acquire the table's writer lock (create-exclusive lock FILE — atomic
    * on POSIX and against other processes, not just threads). Returns
    * true if newly acquired here, false if this thread already held it.
    * A held lock FAILS the caller immediately ([[ConcurrentSwapException]])
    * rather than waiting: swap callers hold the lock for two renames, so
    * a collision means a genuinely concurrent writer, and last-writer-wins
    * blocking would silently discard one writer's output. */
  private def acquire(liveDir: String): Boolean = {
    val key = lockKey(liveDir)
    if (heldByThread.get.contains(key)) false
    else {
      try Files.createFile(lockOf(liveDir))
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new ConcurrentSwapException(
            s"writer lock for $liveDir is held (${lockOf(liveDir)}); " +
              "concurrent writer active, or a crashed writer left the lock " +
              "behind — verify no writer is alive, then breakLock()")
      }
      heldByThread.set(heldByThread.get + key)
      true
    }
  }

  private def release(liveDir: String): Unit = {
    heldByThread.set(heldByThread.get - lockKey(liveDir))
    Files.deleteIfExists(lockOf(liveDir)): Unit
  }

  /** Run `body` holding the table's writer lock — the single-writer span
    * for a whole rewrite (write tmp, then swap). The swap calls
    * ([[replace]]/[[replaceVersioned]]) take the lock on their own, so a
    * bare swap is already serialized; use this to extend the exclusion to
    * the tmp-write phase when two jobs could target the same table. */
  def withWriterLock[T](liveDir: String)(body: => T): T = {
    val newly = acquire(liveDir)
    try body finally if (newly) release(liveDir)
  }

  /** Remove a lock left behind by a CRASHED writer. Operator-invoked only
    * — [[recover]] deliberately does not clear locks, because readers call
    * it routinely and a live writer's lock must never be stolen. */
  def breakLock(liveDir: String): Unit =
    Files.deleteIfExists(lockOf(liveDir)): Unit
  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f): Unit)

  /** Heal the directory after a possible mid-swap crash: if `liveDir` is
    * missing but its trash snapshot exists, the previous swap died
    * between its two renames — restore the snapshot; if both exist, the
    * swap completed but cleanup didn't — drop the stale trash. Call
    * before reading or replacing the live directory. */
  def recover(liveDir: String): Unit = {
    val live = Paths.get(liveDir)
    val trash = trashOf(liveDir)
    if (Files.exists(trash)) {
      if (!Files.exists(live))
        Files.move(trash, live, StandardCopyOption.ATOMIC_MOVE)
      else deleteRecursively(trash)
    }
  }

  /** Replace `liveDir` with the fully-written `tmpDir`. Trash cleanup
    * after the swap is genuinely best-effort: once the new directory is
    * live, a cleanup failure (e.g. a reader holding a file open) must not
    * fail the caller — leftover trash is healed by the next [[recover]].
    *
    * CONCURRENT-READER CONTRACT (AtomicSwapSpec proves it): a reader that
    * resolved the live directory's file listing BEFORE the swap holds
    * absolute paths that the swap renames away, so its scan either
    * completes from data it already opened or fails cleanly with
    * missing-file errors — it can never observe a MIX of old and new
    * files, because both renames are whole-directory ATOMIC_MOVEs and the
    * new directory appears only under a name the old listing never
    * contained. Readers wanting completion-not-failure during rewrites
    * should use [[replaceVersioned]] + [[versionDir]]. */
  def replace(liveDir: String, tmpDir: String): Unit = withWriterLock(liveDir) {
    val live = Paths.get(liveDir)
    val trash = trashOf(liveDir)
    val hadLive = Files.exists(live)
    if (hadLive) Files.move(live, trash, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmpDir), live, StandardCopyOption.ATOMIC_MOVE)
    if (hadLive) {
      try deleteRecursively(trash)
      catch { case _: Exception => () }
    }
  }

  /** Path of an archived version (see [[replaceVersioned]]). */
  def versionDir(liveDir: String, v: Int): String = s"$liveDir.v$v"

  /** Archived version ids for `liveDir`, ascending. */
  def versions(liveDir: String): Seq[Int] = {
    val live = Paths.get(liveDir).toAbsolutePath
    val parent = live.getParent
    val prefix = live.getFileName.toString + ".v"
    if (parent == null || !Files.isDirectory(parent)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val it = Files.list(parent)
      try it.iterator().asScala.toSeq
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith(prefix) && n.drop(prefix.length).nonEmpty
            && n.drop(prefix.length).forall(_.isDigit) =>
          n.drop(prefix.length).toInt }
        .sorted
      finally it.close()
    }
  }

  /** Like [[replace]], but the displaced snapshot is ARCHIVED as
    * `liveDir.v<n>` (n = max existing version + 1) instead of deleted,
    * giving plain-parquet tables a versioned-read option: a reader pins
    * `versionDir(live, n)` and is untouched by later rewrites — the
    * poor-man's equivalent of a table format's versioned reads. Returns
    * the archived version id (None when there was no prior live dir).
    *
    * Crash honesty: live→trash and trash→vN are separate renames; a
    * crash between them leaves the snapshot in trash, which the next
    * [[recover]] CLEARS — so version HISTORY is best-effort, while the
    * live directory keeps the same crash-safety as [[replace]]. Retention
    * is the caller's job ([[dropVersionsBefore]]). */
  def replaceVersioned(liveDir: String, tmpDir: String): Option[Int] = withWriterLock(liveDir) {
    val live = Paths.get(liveDir)
    val trash = trashOf(liveDir)
    val hadLive = Files.exists(live)
    if (hadLive) Files.move(live, trash, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmpDir), live, StandardCopyOption.ATOMIC_MOVE)
    if (hadLive) {
      val v = versions(liveDir).lastOption.map(_ + 1).getOrElse(0)
      try { Files.move(trash, Paths.get(versionDir(liveDir, v)), StandardCopyOption.ATOMIC_MOVE); Some(v) }
      catch { case _: Exception => None }
    } else None
  }

  /** Drop archived versions with id < `keepFrom` (retention sweep). */
  def dropVersionsBefore(liveDir: String, keepFrom: Int): Unit =
    versions(liveDir).filter(_ < keepFrom)
      .foreach(v => deleteRecursively(Paths.get(versionDir(liveDir, v))))
}
