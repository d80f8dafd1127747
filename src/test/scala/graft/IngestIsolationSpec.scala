package graft

import graft.operators.{Similarity, TextDedup, Warehouse}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-20: ingest-cycle snapshot isolation (round-19 verdict #1,
  * one rung up from reader-vs-maintenance) and the enforced writer
  * contract (verdict #2) + time-floored grace (verdict #3).
  *
  * The claims under test:
  *  - an APPEND or DELETE lands as epoch-named segments committed by
  *    ONE manifest swap — a live reader serving through a stream of
  *    ingest cycles never fails on vanished files and never sees a
  *    TORN cycle (some of a cycle's tables without the others);
  *  - segment-append commits are PURE ADDITION: they never consume a
  *    superseded epoch's one-commit reader grace;
  *  - every mutating op runs under the per-index writer lock: a
  *    second concurrent maintainer refuses loudly instead of
  *    interleaving epochs;
  *  - a dereferenced dir additionally survives a minimum retention
  *    age since supersession (`spark.graft.index.graceMinAgeSec`),
  *    so two quick maintenance commits cannot reclaim an epoch a
  *    slow query is still reading. */
class IngestIsolationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf
  import spark.implicits._

  private def withTempDir[A](tag: String)(f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    try f(dir)
    finally Warehouse.deleteRec(new java.io.File(dir))
  }

  test("a LIVE reader serves uninterrupted and untorn THROUGH a " +
    "stream of BM25 append/delete cycles — ingest-cycle snapshot " +
    "isolation, exercised with real overlap") {
    withTempDir("ingest_live") { dir =>
      val docs = (0L until 24L)
        .map(i => (i, s"alpha$i beta$i gamma common words here"))
        .toDF("doc_id", "text").localCheckpoint(true)
      graft.operators.Retrieval.buildBm25Index(docs, "doc_id", "text", dir)
      val queries = Seq((1L, "common words")).toDF("query_id", "qtext")
        .localCheckpoint(true)
      // the torn-cycle witness, checked against ONE snapshot per
      // iteration: a BM25 ingest cycle changes postings + dfs + ids +
      // meta TOGETHER, and these identities hold in every committed
      // state (each a consequence of cycle atomicity):
      //   ids rows        == meta nDocs      (every batch here has
      //                                       tokens; deletes remove
      //                                       ids only at purge, and
      //                                       none runs mid-loop)
      //   Σ dfs.df        == postings rows   (df sums doc-term rows)
      // A reader that saw postings without dfs (or ids without meta)
      // breaks one of them.
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val torn = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val serves = new java.util.concurrent.atomic.AtomicInteger
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      // deleted docs' posting rows stay physical until a purge while
      // their dfs were subtracted — add the tombstoned docs' postings
      // back for the Σdf identity (computed from the SAME snapshot)
      def tombRows(snap: Warehouse.IndexSnapshot): Long =
        if (!snap.has("dels.parquet")) 0L
        else snap.read(spark, "postings.parquet")
          .join(snap.read(spark, "dels.parquet"), Seq("doc_id"),
            "left_semi").count()
      val reader = new Thread(() => {
        while (!stop.get()) {
          try {
            val snap = Warehouse.indexSnapshot(dir)
            val meta = Warehouse.readMetaJson(snap, "BM25 index")
            val nDocs = Warehouse.metaLong(meta, dir, "nDocs")
            val nIds = snap.read(spark, "ids.parquet").count()
            val tombs = if (snap.has("dels.parquet"))
              snap.read(spark, "dels.parquet").count() else 0L
            val postRows = snap.read(spark, "postings.parquet").count()
            val dfSum = snap.read(spark, "dfs.parquet")
              .agg(coalesce(sum(col("df")), lit(0L))).head().getLong(0)
            // deletes subtract nDocs but leave the id ledger intact
            // until a purge — both sides of each identity come from
            // the SAME snapshot, so any inequality is a torn cycle
            if (nIds != nDocs + tombs)
              torn.add(s"ids=$nIds vs nDocs=$nDocs + dels=$tombs")
            if (dfSum + tombRows(snap) != postRows)
              torn.add(s"sum(df)=$dfSum vs postings=$postRows")
            // and a real serve must succeed on every committed state
            graft.operators.Retrieval.bm25TopKFromIndex(spark,
              queries, "query_id", "qtext", dir, k = 5).collect()
            serves.incrementAndGet()
          } catch {
            case t: Throwable => errs.add(t); stop.set(true)
          }
        }
      })
      // BM25 ingest replaces `_meta.json` per cycle, so each commit
      // dereferences the previous meta file — the retention floor is
      // what keeps a mid-read snapshot's meta alive through several
      // quick cycles (exactly the deployment setting; with floor 0 a
      // reader could lose its resolved meta between resolve and read)
      spark.conf.set("spark.graft.index.graceMinAgeSec", "3600")
      reader.start()
      try {
        for (c <- 1 to 6) {
          graft.operators.Retrieval.appendToBm25Index(spark,
            Seq((1000L + c, s"fresh$c batch$c common words"))
              .toDF("doc_id", "text"),
            "doc_id", "text", dir)
        }
        // a tombstone delete mid-stream (ledger + negative dfs + meta
        // in one commit)
        graft.operators.Retrieval.deleteFromBm25Index(spark,
          Seq((1001L, "fresh1 batch1 common words"))
            .toDF("doc_id", "text"), "doc_id", "text", dir)
        // and two more appends on top
        for (c <- 7 to 8)
          graft.operators.Retrieval.appendToBm25Index(spark,
            Seq((1000L + c, s"fresh$c batch$c common words"))
              .toDF("doc_id", "text"),
            "doc_id", "text", dir)
      } finally {
        stop.set(true)
        reader.join(120000)
        spark.conf.set("spark.graft.index.graceMinAgeSec", "0")
      }
      assert(errs.isEmpty,
        s"a live reader failed during ingest: ${errs.peek()}")
      assert(torn.isEmpty,
        s"torn ingest cycles observed: ${torn.peek()}")
      assert(serves.get() > 0, "the reader never completed a serve")
    }
  }

  test("foreachBatch-driven streamed ingest against a SERVED index: " +
    "every micro-batch lands as one committed segment cycle, a " +
    "concurrent reader never fails") {
    withTempDir("stream_live") { root =>
      val dir = s"$root/idx"
      val docs = Tables.documents(spark, sf).limit(200)
        .localCheckpoint(true)
      TextDedup.buildSubstringIndex(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", 3, dir)
      // stage the arriving batches as parquet files, one per trigger
      val stage = s"$root/stage"
      val arriving = docs.filter(col("doc_id") % 2 === 1)
      arriving.repartition(3).write.parquet(stage)
      val probe = docs.limit(20).localCheckpoint(true)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val serves = new java.util.concurrent.atomic.AtomicInteger
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val reader = new Thread(() => {
        while (!stop.get()) {
          try {
            TextDedup.substringSpansFromIndex(spark, probe,
              "doc_id", "text", dir).collect()
            serves.incrementAndGet()
          } catch { case t: Throwable => errs.add(t); stop.set(true) }
        }
      })
      reader.start()
      try {
        val sch = spark.read.parquet(stage).schema
        val q = spark.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(stage)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
              _: Long) =>
            TextDedup.appendToSubstringIndex(batch.sparkSession,
              batch.localCheckpoint(true), dir, "doc_id", "text")
          }
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(180000)
      } finally {
        stop.set(true)
        reader.join(120000)
      }
      assert(errs.isEmpty,
        s"a live reader failed during streamed ingest: ${errs.peek()}")
      assert(serves.get() > 0)
      // the streamed appends answer the union-corpus truth (the q158
      // identity, re-pinned on this live fixture)
      val truth = TextDedup.exactSubstringSpans(docs, "doc_id",
        "text", 3).orderBy(col("doc_id")).collect().toSeq
      val served = TextDedup.substringSpansFromIndex(spark, docs,
        "doc_id", "text", dir).orderBy(col("doc_id")).collect().toSeq
      assert(served == truth,
        "streamed segment ingest diverges from the one-shot truth")
    }
  }

  test("an all-short append cycle lands an EMPTY window segment that " +
    "serving, guards, and compaction all skip cleanly") {
    withTempDir("empty_seg") { dir =>
      // docs 0 and 1 share text so the span output is non-trivial
      val docs = (Seq((0L, "p q r s t"), (1L, "p q r s t")) ++
        (2L until 6L).map(i => (i, s"a$i b$i c$i d$i e$i")))
        .toDF("doc_id", "text")
      TextDedup.buildSubstringIndex(docs, "doc_id", "text", 3, dir)
      // every batch doc is SHORTER than the window length: the cycle
      // must still ledger the ids (a later re-ingest of a now-longer
      // version has to refuse) while its window segment holds ZERO
      // rows — a partitioned dir with no data files, which the
      // segment reader must skip (schema inference cannot run on it)
      val short = Seq((100L, "x y"), (101L, "z")).toDF("doc_id", "text")
      TextDedup.appendToSubstringIndex(spark, short, dir,
        "doc_id", "text")
      val dup = intercept[IllegalArgumentException] {
        TextDedup.appendToSubstringIndex(spark, short, dir,
          "doc_id", "text")
      }
      assert(dup.getMessage.contains("append-only"))
      def truth = TextDedup.exactSubstringSpans(docs, "doc_id",
        "text", 3).orderBy(col("doc_id")).collect().toSeq
      def served = TextDedup.substringSpansFromIndex(spark, docs,
        "doc_id", "text", dir).orderBy(col("doc_id")).collect().toSeq
      assert(truth.nonEmpty && served == truth,
        "empty segment must not change served spans")
      // compaction folds across the empty segment without error and
      // serving is unchanged after it
      TextDedup.compactSubstringSegments(spark, dir)
      assert(served == truth,
        "post-compaction serving changed across an empty segment")
    }
  }

  test("an all-short cycle against a COMPACTED index (the wdelta " +
    "route) ledgers its ids without registering a data-less delta " +
    "segment; append, delete and re-ingest all serve cleanly") {
    withTempDir("empty_seg_compacted") { dir =>
      val docs = (Seq((0L, "p q r s t"), (1L, "p q r s t")) ++
        (2L until 6L).map(i => (i, s"a$i b$i c$i d$i e$i")))
        .toDF("doc_id", "text")
      TextDedup.buildSubstringIndex(docs, "doc_id", "text", 3, dir)
      // compact FIRST: post-compaction segments route to
      // wdelta.parquet, so an all-short batch would register a
      // zero-row dir as that table's ONLY segment — the round-20
      // ADVICE repro (serving and compaction then threw
      // UNABLE_TO_INFER_SCHEMA on the file-less root)
      TextDedup.compactSubstringSegments(spark, dir)
      val short = Seq((100L, "x y"), (101L, "z")).toDF("doc_id", "text")
      TextDedup.appendToSubstringIndex(spark, short, dir,
        "doc_id", "text")
      // ids ARE ledgered: a re-ingest of an active short doc refuses
      val dup = intercept[IllegalArgumentException] {
        TextDedup.appendToSubstringIndex(spark, short, dir,
          "doc_id", "text")
      }
      assert(dup.getMessage.contains("append-only"))
      def truth = TextDedup.exactSubstringSpans(docs, "doc_id",
        "text", 3).orderBy(col("doc_id")).collect().toSeq
      def served = TextDedup.substringSpansFromIndex(spark, docs,
        "doc_id", "text", dir).orderBy(col("doc_id")).collect().toSeq
      assert(truth.nonEmpty && served == truth,
        "all-short append on a compacted index changed served spans")
      // deleting an ingested all-short doc writes another zero-row
      // delta — the tombstone ledger row must land, the segment must
      // not, and the id becomes re-ingestable
      TextDedup.deleteFromSubstringIndex(spark, short.limit(1), dir,
        "doc_id", "text")
      assert(served == truth,
        "all-short delete on a compacted index changed served spans")
      TextDedup.appendToSubstringIndex(spark, short.limit(1), dir,
        "doc_id", "text")
      // a second compaction folds across the whole history cleanly
      TextDedup.compactSubstringSegments(spark, dir)
      assert(served == truth,
        "post-compaction serving changed after all-short cycles")
    }
  }

  test("segment-append commits are PURE ADDITION: they never consume " +
    "a superseded epoch's reader grace") {
    withTempDir("pure_add") { dir =>
      val e = Tables.embeddings(spark, sf).localCheckpoint(true)
      Similarity.buildIvfIndex(e.filter(col("vec_id") % 4 === 0),
        "vec_id", "embedding", dir, nLists = 8, assignments = 1)
      Similarity.appendToIvfIndex(spark,
        e.filter(col("vec_id") % 4 === 1), "vec_id", "embedding", dir)
      // a compaction supersedes the [legacy, segment] pair → both get
      // one-commit grace
      val graced = Warehouse.indexSnapshot(dir)
        .paths("assignments.parquet")
      Warehouse.compactIndexPartitions(spark, dir,
        "assignments.parquet", "list_id")
      assert(graced.forall(p => new java.io.File(p).exists()),
        "superseding commit must grace-retain the outgoing dirs")
      // TWO ingest appends land — pure addition, grace intact
      Similarity.appendToIvfIndex(spark,
        e.filter(col("vec_id") % 4 === 2), "vec_id", "embedding", dir)
      Similarity.appendToIvfIndex(spark,
        e.filter(col("vec_id") % 4 === 3), "vec_id", "embedding", dir)
      assert(graced.forall(p => new java.io.File(p).exists()),
        "segment appends must not consume the reader grace")
      // the next SUPERSEDING commit reclaims (floor is 0 in tests)
      Warehouse.compactIndexPartitions(spark, dir,
        "assignments.parquet", "list_id")
      assert(graced.forall(p => !new java.io.File(p).exists()),
        "grace must expire at the next superseding commit")
    }
  }

  test("per-index writer lock: a second concurrent maintainer refuses " +
    "loudly, same-thread ops nest, release restores access") {
    withTempDir("writer_lock") { dir =>
      val entered = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val holder = new Thread(() => {
        Warehouse.withIndexWriter(dir) {
          // same-thread re-entry must nest (public ops call shared
          // tombstone/purge machinery that takes the lock again)
          Warehouse.withIndexWriter(dir) {
            entered.countDown()
            release.await()
          }
        }
      })
      holder.start()
      entered.await()
      // a second maintainer — here a real mutating op — refuses
      // loudly while the lock is held
      val err = intercept[IllegalStateException] {
        Warehouse.withIndexWriter(dir) { fail("must not enter") }
      }
      assert(err.getMessage.contains("live writer"))
      val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
      val opErr = intercept[IllegalStateException] {
        graft.operators.Retrieval.deleteFromBm25Index(spark, docs,
          "doc_id", "text", dir)
      }
      assert(opErr.getMessage.contains("live writer"))
      release.countDown()
      holder.join(60000)
      // released: the next writer enters (and the op now fails on its
      // own meta gate, proving it got PAST the lock)
      intercept[IllegalArgumentException] {
        graft.operators.Retrieval.deleteFromBm25Index(spark, docs,
          "doc_id", "text", dir)
      }
    }
  }

  test("time-floored grace: two quick superseding commits inside the " +
    "floor leave the first epoch on disk; one after the floor " +
    "reclaims it") {
    withTempDir("grace_floor") { dir =>
      val docs = (0L until 8L).map(i => (i, s"t$i u$i v$i w$i"))
        .toDF("doc_id", "text")
      TextDedup.buildSubstringIndex(docs, "doc_id", "text", 3, dir)
      TextDedup.appendToSubstringIndex(spark,
        Seq((100L, "x y z q")).toDF("doc_id", "text"), dir,
        "doc_id", "text")
      spark.conf.set("spark.graft.index.graceMinAgeSec", "2")
      try {
        val first = Warehouse.indexSnapshot(dir).paths("ids.parquet")
        // commit 1 supersedes the ledger segments (grace starts)
        Warehouse.compactUnpartitionedLedger(spark, dir, "ids.parquet")
        // commit 2, back-to-back: inside the floor — the first
        // epoch's dirs MUST survive even though their one-commit
        // grace is spent
        Warehouse.compactIndexPartitions(spark, dir,
          "wdf.parquet", "pfx")
        assert(first.forall(p => new java.io.File(p).exists()),
          "a commit inside the retention floor reclaimed a " +
            "just-superseded epoch")
        Thread.sleep(2300)
        // commit 3, after the floor: reclaimed
        TextDedup.compactSubstringSegments(spark, dir)
        assert(first.forall(p => !new java.io.File(p).exists()),
          "past the floor, the superseded epoch must be reclaimed")
      } finally
        spark.conf.set("spark.graft.index.graceMinAgeSec", "0")
    }
  }
}
