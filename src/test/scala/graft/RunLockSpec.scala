package graft

import org.scalatest.funsuite.AnyFunSuite

/** The measurement-run lock (round-19 verdict #6): overlapped
  * Bench/ScaleBench runs contaminated two round-18 artifacts; the
  * lock must refuse the second acquirer LOUDLY while held and admit
  * it cleanly after release. Staleness needs no test because the
  * mechanism has no stale state: `FileChannel` locks are released by
  * the OS when the holding process dies. */
class RunLockSpec extends AnyFunSuite {

  test("second acquire refused while held, admitted after release, " +
    "lock file content names the holder") {
    val dir = java.nio.file.Files.createTempDirectory("runlock")
    val path = s"$dir/bench.lock"
    try {
      val held = RunLock.acquire(path)
      val refused = intercept[IllegalStateException] {
        RunLock.acquire(path)
      }
      assert(refused.getMessage.contains("refusing to start"))
      // diagnostics for a human inspecting a held lock
      val content = java.nio.file.Files.readString(
        java.nio.file.Paths.get(path))
      assert(content.contains("pid="))
      held.close()
      // released: the next run acquires cleanly
      val again = RunLock.acquire(path)
      again.close()
    } finally {
      graft.operators.Warehouse.deleteRec(dir.toFile)
    }
  }

  test("parent directories are created on demand") {
    val dir = java.nio.file.Files.createTempDirectory("runlock2")
    try {
      val l = RunLock.acquire(s"$dir/a/b/c.lock")
      l.close()
      assert(new java.io.File(s"$dir/a/b/c.lock").exists())
    } finally {
      graft.operators.Warehouse.deleteRec(dir.toFile)
    }
  }
}
