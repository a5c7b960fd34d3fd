package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.scalatest.funsuite.AnyFunSuite

/** The scratch root's reaper-facing liveness contract: a root carries a
  * heartbeat file its owning JVM re-touches on a daemon thread, and the
  * reaper must treat a FRESH heartbeat as "live — hands off" even when
  * the directory itself is older than the age fuse (the round-18
  * advisor's concurrent-JVM hazard: a spec suite's root aging past the
  * 2 h /dev/shm fuse while a bench session's reaper runs). */
class ScratchSpec extends AnyFunSuite {

  test("a fresh heartbeat marks a root live; a stale or absent one does not") {
    val p = Files.createTempDirectory("graft-hb-test")
    try {
      // no heartbeat at all → not live (pre-heartbeat litter reaps on age)
      assert(!Scratch.heartbeatFresh(p))
      Scratch.touchHeartbeat(p)
      assert(Scratch.heartbeatFresh(p), "just-touched heartbeat must be fresh")
      // an aged heartbeat (older than the 30 min grace) goes stale
      Files.setLastModifiedTime(p.resolve(".graft-heartbeat"),
        FileTime.fromMillis(System.currentTimeMillis() - 45L * 60 * 1000))
      assert(!Scratch.heartbeatFresh(p), "aged heartbeat must go stale")
      // re-touching revives it — the daemon-thread cycle
      Scratch.touchHeartbeat(p)
      assert(Scratch.heartbeatFresh(p))
    } finally {
      Files.deleteIfExists(p.resolve(".graft-heartbeat"))
      Files.deleteIfExists(p)
      ()
    }
  }

  test("the process root carries a live heartbeat") {
    // Scratch.root lazily installs with the heartbeat thread attached;
    // whatever volume it landed on, the beacon must be present and fresh
    val r = Scratch.root
    assert(Files.isDirectory(r))
    assert(Scratch.heartbeatFresh(r),
      s"process scratch root $r has no fresh heartbeat")
  }

  test("an unusable explicit override never lands on /dev/shm") {
    // the override path itself needs a subprocess to vary the env var —
    // what is checkable in-process is the decision table the round-18
    // advisor flagged: Scratch.dir always lands under the installed
    // root, and that root is never inside a nonexistent override
    val d = Scratch.dir("graft-hb-probe")
    assert(d.startsWith(Scratch.root))
    assert(Files.isDirectory(d))
    Files.delete(d)
    // the env override, when set for THIS JVM, must have been honored
    // or loudly rejected — reconstruct the expectation from the env
    sys.env.get("SPARK_GRAFT_SCRATCH").foreach { o =>
      val op = Paths.get(o)
      if (Files.isDirectory(op) && Files.isWritable(op))
        assert(Scratch.root.startsWith(op),
          "usable explicit override was not honored")
      else
        assert(!Scratch.root.startsWith(Paths.get("/dev/shm")),
          "unusable explicit override silently fell through to /dev/shm")
    }
  }
}
