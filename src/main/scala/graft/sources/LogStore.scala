package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Path, StandardCopyOption}
import java.util.UUID

/** Pluggable commit-publication seam (Delta's LogStore): the ENTIRE
  * correctness of the optimistic-concurrency protocol rests on one
  * primitive — an atomic PUT-IF-ABSENT of a fully-written commit file
  * at a version-numbered key. Everything else in the log (replay,
  * checkpoints, stats, DML) is ordinary reads of immutable objects.
  * Isolating that primitive behind a trait is what lets the same
  * protocol run on backends with different atomicity guarantees:
  *
  *  - a POSIX filesystem gives it away for free (link(2) / O_EXCL);
  *  - S3 provides it as a conditional put (`If-None-Match: *`, the
  *    primitive Delta's S3DynamoDBLogStore used a DynamoDB lock to
  *    simulate before S3 shipped conditional writes in 2024);
  *  - GCS/ABFS provide it as generation-/etag-conditional writes.
  *
  * Contract for [[putIfAbsent]]:
  *  1. at most ONE of any number of concurrent callers for the same
  *     target returns true (the commit race has exactly one winner);
  *  2. a reader never observes partial content — the object appears
  *     atomically, fully written;
  *  3. after any caller returns true, the content is durably readable.
  *
  * [[putOverwrite]] serves idempotent artifacts (checkpoints): atomic
  * for readers, last-writer-wins among writers — deterministic content
  * per key makes the race harmless. */
trait LogStore {
  def putIfAbsent(target: Path, content: Array[Byte]): Boolean
  def putOverwrite(target: Path, content: Array[Byte]): Unit
}

object LogStore {
  def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  /** The conditional put TIMED OUT in flight: the object may or may
    * not have been published — the one failure mode a real object
    * store adds over POSIX link(2), and the reason commit publication
    * needs a read-back resolution rule (strong read-after-write is
    * part of the store contract this seam targets; S3 has provided it
    * since 2020). Thrown by stores that model network flakiness. */
  final class AmbiguousWriteException(msg: String)
    extends java.io.IOException(msg)
}

/** An adversarial object-store adapter: conditional-put semantics
  * (ETag / `If-None-Match: *`) under injected LATENCY (stretching the
  * race window far beyond what a local filesystem ever shows) and
  * injected AMBIGUITY — calls that time out either before the service
  * acted (the put never happened) or after it acted (the put WON but
  * the caller cannot know). Deterministic per seed; counters let a
  * spec prove the faults actually fired. The commit protocol's
  * read-back rule ([[TxLog]] `tryPublish`) must absorb both without
  * ever double-counting or losing a commit. */
final class FlakyObjectStoreLogStore(seed: Long, latencyMaxMs: Int = 3,
    ambiguousRate: Double = 0.2) extends LogStore {
  private val rnd = new java.util.Random(seed)
  private def roll(p: Double): Boolean = rnd.synchronized(rnd.nextDouble() < p)
  private def nap(): Unit =
    if (latencyMaxMs > 0) Thread.sleep(rnd.synchronized(rnd.nextInt(latencyMaxMs)).toLong + 1L)
  val ambiguousBefore = new java.util.concurrent.atomic.AtomicLong
  val ambiguousAfter = new java.util.concurrent.atomic.AtomicLong

  override def putIfAbsent(target: Path, content: Array[Byte]): Boolean = {
    nap()
    if (roll(ambiguousRate / 2)) {
      // timed out on the wire BEFORE the service acted
      ambiguousBefore.incrementAndGet(): Unit
      throw new LogStore.AmbiguousWriteException(s"simulated pre-put timeout: $target")
    }
    val won = ConditionalPutLogStore.putIfAbsent(target, content)
    nap()
    if (roll(ambiguousRate)) {
      // the service acted (either way) but the RESPONSE was lost
      ambiguousAfter.incrementAndGet(): Unit
      throw new LogStore.AmbiguousWriteException(
        s"simulated post-put timeout (outcome=$won hidden): $target")
    }
    won
  }

  override def putOverwrite(target: Path, content: Array[Byte]): Unit = {
    nap()
    // overwrites serve idempotent artifacts — a lost response needs no
    // resolution, the next writer's identical content converges
    ConditionalPutLogStore.putOverwrite(target, content)
  }
}

/** Default store for POSIX filesystems: write under a temp name, then
  * HARD-LINK to the target — link(2) is atomic and fails if the target
  * exists, satisfying the whole [[LogStore]] contract with zero
  * coordination. The one filesystem-specific line in the format. */
object HardLinkLogStore extends LogStore {
  override def putIfAbsent(target: Path, content: Array[Byte]): Boolean = {
    Files.createDirectories(target.getParent)
    val tmp = target.getParent.resolve(s".tmp-${UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, content)
    try { Files.createLink(target, tmp); true }
    catch { case _: FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp): Unit
  }

  override def putOverwrite(target: Path, content: Array[Byte]): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = target.getParent.resolve(s".tmp-${UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, content)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING): Unit
  }
}

/** An OBJECT-STORE-shaped store: models a backend whose filesystem has
  * NO atomic create-if-absent, where the conditional put is provided by
  * the STORE SERVICE instead (S3's `If-None-Match: *`, GCS's
  * `ifGenerationMatch=0`). The service-side atomicity is simulated by a
  * JVM-wide mutex around the exists-check + publish — the same
  * role DynamoDB played for Delta on pre-2024 S3. Reader atomicity
  * still comes from writing aside and moving in (an object store PUT is
  * all-or-nothing by API; local files need the move to imitate that).
  * Exists solely to prove the protocol survives an S3-shaped backend —
  * the commit-race stress spec runs against both stores. */
object ConditionalPutLogStore extends LogStore {
  private val lock = new Object

  override def putIfAbsent(target: Path, content: Array[Byte]): Boolean = {
    Files.createDirectories(target.getParent)
    val tmp = target.getParent.resolve(s".tmp-${UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, content)
    try lock.synchronized {
      if (Files.exists(target)) false
      else { Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE); true }
    } finally Files.deleteIfExists(tmp): Unit
  }

  override def putOverwrite(target: Path, content: Array[Byte]): Unit =
    HardLinkLogStore.putOverwrite(target, content)
}
