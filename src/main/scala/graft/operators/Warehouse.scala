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

  /** Root directory for persisted artifacts:
    * `$SPARK_GRAFT_INDEX_DIR` env, else the runtime conf
    * `spark.graft.index.dir` (the warehouse dir itself is a STATIC
    * SQL conf — a custom dynamic key lets tests and deployments
    * re-point the root per-session), else `graft_pairs/` under the
    * session warehouse dir (a deployment points these at durable
    * storage; the sandbox default lands in ./spark-warehouse). */
  private[graft] def indexRoot(spark: SparkSession): String =
    // the per-SESSION conf wins over the process-wide env var — a
    // test or notebook re-pointing its own root must not be silently
    // overridden by an exported shell variable
    Option(spark.conf.get("spark.graft.index.dir", null))
      .orElse(sys.env.get("SPARK_GRAFT_INDEX_DIR"))
      .getOrElse {
        val w = spark.conf.get("spark.sql.warehouse.dir")
        // plain string handling, no java.net.URI — a warehouse path
        // containing spaces or other URI-illegal characters must not
        // throw. file:/x, file://x and file:///x all collapse to /x.
        val local = if (w.startsWith("file:")) {
          var p = w.stripPrefix("file:")
          while (p.startsWith("//")) p = p.substring(1)
          new java.io.File(p).getAbsolutePath
        } else w
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

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(deleteRec)
    f.delete()
  }

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
    // publish: try the atomic move FIRST — a concurrently published
    // LIVE artifact must never be deleted out from under its readers
    // (the loser adopts the winner). Only an occupant that fails the
    // key check (stale corpus fingerprint behind a hash collision, a
    // doctored artifact) is replaced.
    def move(): Boolean =
      try {
        java.nio.file.Files.move(tmp.toPath, finalDir.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        true
      } catch { case _: java.nio.file.FileSystemException => false }
    if (!move()) {
      if (usable(finalDir, key)) deleteRec(tmp) // winner published; adopt
      else {
        deleteRec(finalDir) // stale/partial occupant: replace
        if (!move()) {
          deleteRec(tmp)
          require(usable(finalDir, key),
            s"artifact collision at $finalDir for key $key")
        }
      }
    }
    finalDir.toString
  }

  /** The artifact boundary: first caller per key builds and
    * publishes, everyone else scans the columnar artifact. */
  private[graft] def materialized(spark: SparkSession, family: String,
      key: String)(build: => DataFrame): DataFrame = {
    val dir = built.computeIfAbsent(key,
      _ => loadOrBuild(spark, family, key)(d =>
        build.write.mode("overwrite").parquet(s"$d/pairs.parquet")))
    spark.read.parquet(s"$dir/pairs.parquet")
  }

  /** Directory-artifact boundary for builders that lay out their own
    * structure ([[Similarity.buildIvfIndex]],
    * [[TextDedup.buildNearDupIndex]]) — returns the published
    * directory path. */
  private[graft] def materializedDir(spark: SparkSession,
      family: String, key: String)(build: String => Unit): String =
    built.computeIfAbsent(key,
      _ => loadOrBuild(spark, family, key)(build))
}
