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
  */
object AtomicSwap {

  private def trashOf(live: String): Path = Paths.get(live + ".swap_old")
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
  def replace(liveDir: String, tmpDir: String): Unit = {
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
  def replaceVersioned(liveDir: String, tmpDir: String): Option[Int] = {
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
