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
    * fail the caller — leftover trash is healed by the next [[recover]]. */
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
}
