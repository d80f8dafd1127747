package graft

/** Exclusive run lock for the measurement mains (round-19 verdict
  * #6): an overlapped Bench/ScaleBench run contaminates BOTH runs'
  * wall-clock cells — round 18 lost two ScaleBench artifacts to
  * exactly that and had to re-measure and re-commit (`54612f9`).
  * The lock is a `FileChannel.tryLock` advisory lock, which the OS
  * RELEASES WHEN THE HOLDING PROCESS DIES — so there is no stale-
  * lock-file failure mode and no age heuristic to tune: a crashed
  * run's lock evaporates with its JVM, while a LIVE run's lock
  * refuses the newcomer loudly (the only correct answer; queueing
  * silently would still share the machine and corrupt the minima).
  * Same-JVM re-entry (an overlapping lock on the same channel
  * family) is refused identically. */
object RunLock {

  /** The MACHINE-GLOBAL bench lock path (round-19 ADVICE): a
    * CWD-relative path only excluded same-CWD launches — two runs
    * started from different checkouts on one machine never contended,
    * which is exactly the wall-clock contamination the lock exists to
    * prevent. Anchored under `java.io.tmpdir` so every launch on the
    * machine resolves the same file regardless of working
    * directory. */
  def benchLockPath: String = new java.io.File(
    System.getProperty("java.io.tmpdir"), "graft-bench.lock").toString

  /** Acquire the exclusive lock at `path`, creating parent dirs.
    * Returns the releasing handle; throws [[IllegalStateException]]
    * with remediation text when another run holds it. */
  def acquire(path: String): AutoCloseable = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val ch = java.nio.channels.FileChannel.open(f.toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock =
      try ch.tryLock()
      catch { case _: java.nio.channels.OverlappingFileLockException =>
        null }
    if (lock == null) {
      ch.close()
      throw new IllegalStateException(
        s"another bench/scalebench run holds $path — refusing to " +
          "start: overlapped measurement runs contaminate both " +
          "artifacts (round-18 lost two to this). Wait for the other " +
          "run; a crashed run's lock is released by the OS with its " +
          "JVM, so a persistent refusal means a live process.")
    }
    // diagnostics for a human looking at the file while a run holds it
    val note = java.nio.ByteBuffer.wrap(
      s"pid=${ProcessHandle.current().pid()} since=${
        java.time.Instant.now()}\n".getBytes("UTF-8"))
    ch.truncate(0)
    ch.write(note)
    new AutoCloseable {
      def close(): Unit = { lock.release(); ch.close() }
    }
  }
}
