package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse-boundary artifact store: build-once-reuse-forever parquet
  * artifacts keyed by (family, full parameter+corpus key), shared by
  * [[SharedPairs]] (near-dup pair tables) and the q112 foreign-media
  * fixture. The mechanics — atomic publish, stored-key verification,
  * corpus fingerprinting — exist so a RESTARTED run (new JVM) reuses
  * the on-disk artifact instead of re-running the build, and so a
  * parameter or corpus mismatch can never silently serve stale data:
  * the full key is stored in `_graft_key.txt` inside the artifact and
  * re-checked on every reuse; a mismatch rebuilds, never trusts.
  *
  * Publication is an atomic directory rename: a concurrent builder in
  * another JVM either wins the rename or adopts the winner's
  * (key-verified) artifact. In-JVM, `computeIfAbsent` makes sibling
  * queries block on the one in-flight build instead of racing it
  * (Verify runs query entries concurrently). */
private[graft] object Warehouse {
  /** key -> parquet path of the usable artifact (in-JVM fast path
    * over the on-disk store). */
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Test-only: drop the in-JVM map — simulates a fresh JVM, so specs
    * can prove reuse comes from the DISK artifact. */
  private[graft] def reset(): Unit = built.clear()

  /** Root directory for persisted artifacts: the runtime conf
    * `spark.graft.index.dir` first (the warehouse dir itself is a
    * STATIC SQL conf — a custom dynamic key lets tests and
    * deployments re-point the root per-session, and a session-scoped
    * setting must not be silently overridden by an exported shell
    * variable), else `$SPARK_GRAFT_INDEX_DIR`, else `graft_pairs/`
    * under the session warehouse dir (a deployment points these at
    * durable LOCAL-SEMANTICS storage; the sandbox default lands in
    * ./spark-warehouse).
    *
    * NON-POSIX ROOTS ARE REJECTED LOUDLY (round-14 missing #3): the
    * commit protocol here is built on three guarantees object stores
    * do not give — atomic directory rename (S3/GCS "rename" is
    * copy+delete, so a half-moved artifact could be adopted),
    * advisory `FileChannel` locks (no cross-client locking at all),
    * and directory mtimes for last-use aging (object stores have no
    * directory metadata). A configured `s3://`/`gs://`/`hdfs://`
    * root would not fail here — it would CORRUPT SILENTLY under
    * concurrent builders, which is strictly worse. A deployment that
    * wants the warehouse on an object store needs the conditional-put
    * variant of this protocol: publish parquet files directly under
    * the FINAL name (never rename), write `_graft_key.txt` and then
    * `_GRAFT_OK` last with if-none-match conditional puts (the loser
    * of a concurrent publish sees its put rejected and adopts the
    * winner — readers already only adopt `_GRAFT_OK`-completed
    * artifacts, so no lock is needed on the read side), and replace
    * the mtime sweep with the store's native lifecycle/TTL rules
    * keyed on a last-use marker object. Until that variant exists,
    * failing fast at configuration time is the only safe behavior:
    * mount the store through a POSIX layer or point the root at
    * local/NFS disk. */
  private[graft] def indexRoot(spark: SparkSession): String = {
    val root = indexRoot0(spark)
    // any "scheme:" prefix counts — URI forms WITHOUT a slash
    // ("s3:bucket/x" is legal no-authority syntax) must not slip
    // past the guard into a literally-named local directory
    // (round-15 review). A windows drive letter ("C:\x") is not a
    // URI scheme — require 2+ chars before the colon.
    val scheme = "^([a-zA-Z][a-zA-Z0-9+.-]+):".r
    scheme.findFirstMatchIn(root).map(_.group(1)) match {
      case Some(s) if !s.equalsIgnoreCase("file") =>
        throw new IllegalArgumentException(
          s"spark.graft.index.dir '$root': scheme '$s' is not " +
            "supported — the warehouse commit protocol requires POSIX " +
            "rename atomicity, file locks, and directory mtimes, which " +
            "object stores do not provide (see Warehouse.indexRoot " +
            "for the conditional-put protocol an object-store variant " +
            "needs). Point the root at local/NFS disk or a POSIX " +
            "mount of the store.")
      case Some(_) => decodeFileUri(root) // an explicit file: root
      case None => root
    }
  }

  /** Decode a `file:` URI to a local path. Spark's default warehouse
    * dir is a PERCENT-ENCODED file URI (File.toURI — a path with
    * spaces arrives as %20), so decode through java.net.URI when it
    * parses; a raw-space/non-URI form falls back to literal prefix
    * handling (file:/x, file://x, file:///x all collapse to /x)
    * instead of throwing. */
  private def decodeFileUri(w: String): String =
    try new java.io.File(new java.net.URI(w)).getAbsolutePath
    catch { case _: Exception =>
      var p = w.stripPrefix("file:")
      while (p.startsWith("//")) p = p.substring(1)
      new java.io.File(p).getAbsolutePath
    }

  private def indexRoot0(spark: SparkSession): String =
    Option(spark.conf.get("spark.graft.index.dir", null))
      .orElse(sys.env.get("SPARK_GRAFT_INDEX_DIR"))
      .getOrElse {
        val w = spark.conf.get("spark.sql.warehouse.dir")
        val local =
          if (w.startsWith("file:")) decodeFileUri(w) else w
        s"$local/graft_pairs"
      }

  /** (name, size, mtime) fingerprint of every file under `path`,
    * sorted — the corpus-freshness component of an artifact key (the
    * same signal Spark's own file index uses). */
  private[graft] def fingerprint(path: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(path))
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString(",")
  }

  private def sha16(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .take(8).map(b => f"${b & 0xFF}%02x").mkString

  /** Recursive delete — also the shared helper for every graft
    * cleanup site (stream staging dirs, stale artifacts). */
  private[graft] def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(deleteRec)
    f.delete()
  }

  /** Record a USE of `dir` for the age-based sweep (which ages by
    * last use, not last build). Primary channel: the dir mtime.
    * `setLastModified` is allowed to fail (some filesystems refuse
    * utimes on directories) and its boolean result was silently
    * ignored until round 15 (ADVICE) — on failure, fall back to
    * REWRITING a `_GRAFT_LASTUSE` marker file (a fresh write bumps
    * the marker's own mtime), and if even that fails, warn loudly:
    * the artifact may then be swept while live, which the adopting
    * reader will detect as a vanished path, not silent staleness. */
  private def touchUsed(dir: java.io.File): Unit = {
    val now = System.currentTimeMillis()
    if (!dir.setLastModified(now)) {
      try {
        val w = new java.io.PrintWriter(
          new java.io.File(dir, "_GRAFT_LASTUSE"), "UTF-8")
        try w.print(now.toString) finally w.close()
      } catch { case _: java.io.IOException =>
        System.err.println(s"[pairidx] WARNING: cannot record last " +
          s"use of $dir (setLastModified and marker write both " +
          "failed); it may be swept while live")
      }
    }
  }

  /** Last-use time of an artifact dir: the newest of the dir mtime
    * and the `_GRAFT_LASTUSE` fallback marker (0 when absent). */
  private def lastUsed(dir: java.io.File): Long =
    math.max(dir.lastModified(),
      new java.io.File(dir, "_GRAFT_LASTUSE").lastModified())

  /** A published artifact dir is usable iff its stored key equals
    * ours (param/corpus mismatch safety) and the completion marker
    * exists — `_GRAFT_OK` is written only after the builder ran to
    * the end, so no partial write is ever adopted. */
  private def usable(dir: java.io.File, key: String): Boolean = {
    val keyFile = new java.io.File(dir, "_graft_key.txt")
    val ok = new java.io.File(dir, "_GRAFT_OK")
    keyFile.exists() && ok.exists() && {
      val src = scala.io.Source.fromFile(keyFile, "UTF-8")
      val stored = try src.mkString finally src.close()
      stored == key
    }
  }

  /** Resolve the on-disk artifact DIRECTORY for `key`, building it
    * iff absent or stale. `build` receives a staging directory and
    * may lay out any file structure (a pair parquet, an IVF index's
    * centroids + partitioned assignments, …). */
  private def loadOrBuild(spark: SparkSession, family: String,
      key: String)(build: String => Unit): String = {
    val root = new java.io.File(indexRoot(spark))
    root.mkdirs()
    val finalDir = new java.io.File(root, s"$family-${sha16(key)}")
    if (usable(finalDir, key)) {
      // record the use: the sweep ages artifacts by last USE, not
      // last build — a family can hold several live keys (one per
      // corpus dir), and an 8-day-old but still-consulted sibling
      // must survive a same-family publish (round-14 review)
      touchUsed(finalDir)
      System.err.println(s"[pairidx] reusing $key <- $finalDir")
      return finalDir.toString
    }
    val tmp = new java.io.File(root,
      s".build-$family-${sha16(key)}-${java.util.UUID.randomUUID()}")
    val t0 = System.nanoTime()
    build(tmp.toString)
    val w = new java.io.PrintWriter(
      new java.io.File(tmp, "_graft_key.txt"), "UTF-8")
    try w.print(key) finally w.close()
    new java.io.File(tmp, "_GRAFT_OK").createNewFile()
    // surface the one-time cost in any harness log (bench reports
    // steady-state consumer times via min-of-reps; the build is
    // real work and must stay visible somewhere auditable)
    System.err.println(f"[pairidx] built $key in " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s -> $finalDir")
    // publish under a cross-JVM advisory file lock: a concurrently
    // published LIVE artifact must never be deleted out from under
    // its readers. The lock serializes the usable-check /
    // stale-replace / move sequence across processes (a bare
    // check-then-act left a window where two builders replacing the
    // same stale occupant could delete each other's fresh publish);
    // the loser adopts the winner inside the lock. Readers never take
    // the lock — they only ever adopt a completed (`_GRAFT_OK`)
    // artifact, and a usable artifact is only ever REPLACED here,
    // atomically, for a key mismatch no reader of this key can hold.
    val lockCh = java.nio.channels.FileChannel.open(
      new java.io.File(root, s".lock-$family-${sha16(key)}").toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = lockCh.lock()
    try {
      if (usable(finalDir, key)) deleteRec(tmp) // winner published; adopt
      else {
        if (finalDir.exists()) deleteRec(finalDir) // stale/partial: replace
        java.nio.file.Files.move(tmp.toPath, finalDir.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    } finally {
      lock.release()
      lockCh.close()
    }
    sweepOrphans(spark, root, family, keep = finalDir.getName)
    finalDir.toString
  }

  /** Age-based sweep of ORPHANED same-family artifacts (round-13
    * advice): the key embeds an mtime-based corpus fingerprint, so
    * every corpus rewrite publishes a NEW directory name and the old
    * one is never addressed again — without a sweep, rewrites
    * accumulate dead artifacts on disk indefinitely. Runs after each
    * publish, deleting sibling dirs of the same family (published or
    * crashed `.build-` staging) untouched for longer than
    * `spark.graft.index.sweepAgeDays` (default 7; `<= 0` disables).
    * Age means time since last USE, not last build — `loadOrBuild`'s
    * reuse path refreshes the dir mtime on every adoption, so a
    * family holding several live keys (one per corpus dir) never
    * loses a sibling that any run consulted inside the window. The
    * age guard is also the concurrency story: a reader only ever
    * holds an artifact it adopted (and mtime-refreshed) moments ago,
    * and a LIVE concurrent publish is days younger than any
    * cutoff. */
  private def sweepOrphans(spark: SparkSession, root: java.io.File,
      family: String, keep: String): Unit = {
    val days = spark.conf.get("spark.graft.index.sweepAgeDays", "7").toDouble
    if (days <= 0) return
    val cutoff = System.currentTimeMillis() - (days * 86400000L).toLong
    val mine = s"$family-"
    val staging = s".build-$family-"
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .filter(d => d.getName != keep &&
        (d.getName.startsWith(mine) || d.getName.startsWith(staging)))
      // age by lastUsed, not the raw dir mtime: touchUsed falls back
      // to the _GRAFT_LASTUSE marker where setLastModified fails
      .filter(lastUsed(_) < cutoff)
      .foreach { d =>
        System.err.println(s"[pairidx] sweeping orphaned ${d.getName}")
        deleteRec(d)
      }
  }

  /** Resolve `key` through the in-JVM cache. A cached path is NOT
    * trusted blindly (round-14 ADVICE): a JVM alive longer than
    * sweepAgeDays could hold a path a same-family publish in another
    * process has since swept, and a cache hit used to hand it out
    * without refreshing its last-use time — so on every hit the
    * artifact is re-checked usable (else evicted and rebuilt) and its
    * use recorded, keeping a long-lived process's artifacts sweep-safe
    * exactly like a fresh JVM's. */
  private def cachedDir(spark: SparkSession, family: String,
      key: String)(build: String => Unit): String = {
    val dir = built.computeIfAbsent(key,
      _ => loadOrBuild(spark, family, key)(build))
    val f = new java.io.File(dir)
    if (usable(f, key)) { touchUsed(f); dir }
    else {
      // swept (or doctored) since this JVM cached it: rebuild through
      // the normal publish path
      built.remove(key, dir)
      built.computeIfAbsent(key,
        _ => loadOrBuild(spark, family, key)(build))
    }
  }

  /** The artifact boundary: first caller per key builds and
    * publishes, everyone else scans the columnar artifact. */
  private[graft] def materialized(spark: SparkSession, family: String,
      key: String)(build: => DataFrame): DataFrame = {
    val dir = cachedDir(spark, family, key)(d =>
      build.write.mode("overwrite").parquet(s"$d/pairs.parquet"))
    spark.read.parquet(s"$dir/pairs.parquet")
  }

  /** Directory-artifact boundary for builders that lay out their own
    * structure ([[Similarity.buildIvfIndex]],
    * [[TextDedup.buildNearDupIndex]]) — returns the published
    * directory path. */
  private[graft] def materializedDir(spark: SparkSession,
      family: String, key: String)(build: String => Unit): String =
    cachedDir(spark, family, key)(build)
}
