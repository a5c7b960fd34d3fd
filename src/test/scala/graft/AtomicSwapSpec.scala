package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AtomicSwap

/** Crash-window recovery contract of the directory swap, exercised
  * directly for both failure points: died BETWEEN the two renames (live
  * missing, trash present → restore) and died AFTER the swap but before
  * cleanup (both present → drop stale trash). */
class AtomicSwapSpec extends AnyFunSuite {

  private def mkDir(parent: String, name: String, marker: String): String = {
    val d = Paths.get(parent, name)
    Files.createDirectories(d)
    Files.writeString(d.resolve("data.txt"), marker)
    d.toString
  }

  test("recover restores the trash snapshot when live is missing") {
    val root = Files.createTempDirectory("graft-swap").toString
    mkDir(root, "t.swap_old", "old-data")
    AtomicSwap.recover(s"$root/t")
    assert(Files.readString(Paths.get(root, "t", "data.txt")) === "old-data")
    assert(!Files.exists(Paths.get(root, "t.swap_old")))
  }

  test("recover drops stale trash when live exists") {
    val root = Files.createTempDirectory("graft-swap").toString
    mkDir(root, "t", "live-data")
    mkDir(root, "t.swap_old", "stale")
    AtomicSwap.recover(s"$root/t")
    assert(Files.readString(Paths.get(root, "t", "data.txt")) === "live-data")
    assert(!Files.exists(Paths.get(root, "t.swap_old")))
  }

  test("replace swaps tmp into live and cleans up") {
    val root = Files.createTempDirectory("graft-swap").toString
    mkDir(root, "t", "before")
    mkDir(root, "t.new", "after")
    AtomicSwap.replace(s"$root/t", s"$root/t.new")
    assert(Files.readString(Paths.get(root, "t", "data.txt")) === "after")
    assert(!Files.exists(Paths.get(root, "t.new")))
    assert(!Files.exists(Paths.get(root, "t.swap_old")))
  }
}
