package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token statistics, document fingerprinting. All are
  * per-row scalar pipelines (zero shuffle except final aggregations) —
  * the shapes that run over every document of a 100 TB corpus, so they
  * must stay inside whole-stage codegen: only `functions._`
  * combinators, no UDFs.
  *
  * Every formula here is engine-portable (length/replace/split
  * arithmetic — identical semantics in any SQL engine), so results are
  * oracle-checkable bit-for-bit.
  */
object TextAnalysis {

  /** Occurrence count of `marker` in `c` via the replace-length trick
    * (portable across engines, codegen'd). */
  def occurrences(c: Column, marker: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(marker), "")))
      / marker.length).cast("int")

  /** Stopword markers per language for the n-gram/stopword heuristic
    * language scorer. Padded with spaces so only whole words match. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " a "),
    "de" -> Seq(" der ", " und ", " die ", " das "),
    "fr" -> Seq(" le ", " et ", " la ", " les "),
    "es" -> Seq(" el ", " y ", " los ", " de "),
    "zh" -> Seq("的", "是", "在", "了"))

  /** Per-language stopword-hit score of a text column. */
  def langScore(textCol: Column, lang: String): Column =
    langMarkers(lang).map(m =>
      occurrences(concat(lit(" "), lower(textCol), lit(" ")), m))
      .reduce(_ + _)

  /** Heuristic language ID: argmax of stopword scores, deterministic
    * tie-break by language code. Returns a struct-free label column.
    *
    * Shape matters here: a fold of nested `when(sc > best.s, …)
    * .otherwise(best)` steps references `best` twice per step, so the
    * expression tree doubles per language — five languages produced a
    * tree janino could not compile (InternalCompilerException), and the
    * whole per-doc projection silently fell back to interpreted mode.
    * Instead each score is computed exactly once inside an
    * array-of-structs and `array_max` does the argmax: struct ordering
    * compares score first, then `r` — a rank that DESCENDS
    * alphabetically — so ties keep the earliest language code, exactly
    * the strict-> fold's semantics. Linear tree, stays in whole-stage
    * codegen (TextAnalysisSpec pins this with codegen.fallback=false). */
  def langId(textCol: Column): Column = {
    val langs = langMarkers.keys.toSeq.sorted
    val entries = langs.zipWithIndex.map { case (l, i) =>
      struct(langScore(textCol, l).as("s"),
        lit(langs.size - i).as("r"), lit(l).as("l"))
    }
    array_max(array(entries: _*)).getField("l")
  }

  /** Whitespace token array (lower-cased). */
  def tokens(textCol: Column): Column =
    filter(split(lower(textCol), " "), t => length(t) > 0)

  /** Quality metrics: token count, distinct-token ratio, mean token
    * length, stopword ratio — the standard cheap filters a pretraining
    * pipeline applies before anything expensive. All double math is
    * derived from exact integer counts then rounded, so it is
    * engine-deterministic. */
  def qualityMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t)
    val nDistinct = size(array_distinct(t))
    val totalLen = aggregate(t, lit(0L), (acc, x) => acc + length(x))
    val stopHits = langScore(col(textCol), "en")
    df.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      nTok.as("n_tokens"),
      nDistinct.as("n_distinct"),
      round(nDistinct.cast("double") / nTok, 6).as("distinct_ratio"),
      round(totalLen.cast("double") / nTok, 6).as("mean_token_len"),
      stopHits.as("stopword_hits"),
      round(stopHits.cast("double") / nTok, 6).as("stopword_ratio"))
  }

  /** Composite quality score in [0,0.9]: blend of distinct-ratio and a
    * length sweet-spot. The 0.4 weight is deliberate: multiplying a
    * 6-dp value by 0.4 makes the 7th decimal digit even, so round(…,6)
    * never sits on a .5 boundary (a ×0.5 weight does, and engines
    * disagree on double half-boundary rounding). */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    qualityMetrics(df, idCol, textCol).withColumn("quality",
      round(
        (col("distinct_ratio") * 0.4) +
          (when(col("n_tokens") >= 20 && col("n_tokens") <= 200, 0.3)
            .otherwise(0.0)) +
          (when(col("stopword_ratio") > 0.01, 0.2).otherwise(0.0)), 6))

  /** The same composite score as a single per-row Column over the raw
    * text — for plans that need the score WITHOUT the metrics
    * projection (e.g. sampling gates that must keep other columns in
    * flight, zero shuffle). The inner round(…,6)s mirror
    * [[qualityMetrics]]'s rounded ratio columns exactly;
    * TextAnalysisSpec pins columnar ≡ DataFrame equivalence so the two
    * formulations cannot drift. */
  def qualityColumn(textCol: Column): Column = {
    val t = tokens(textCol)
    val nTok = size(t)
    val distinctRatio =
      round(size(array_distinct(t)).cast("double") / nTok, 6)
    val stopRatio =
      round(langScore(textCol, "en").cast("double") / nTok, 6)
    round(
      (distinctRatio * 0.4) +
        (when(nTok >= 20 && nTok <= 200, 0.3).otherwise(0.0)) +
        (when(stopRatio > 0.01, 0.2).otherwise(0.0)), 6)
  }

  /** Per-document repetition metrics (the Gopher-style quality
    * signals a pretraining filter cuts on): word count, distinct-word
    * count, duplicate-word fraction, and the most-frequent-word
    * fraction. ENTIRELY per-row — the mode frequency comes from a
    * nested HOF (for each distinct word, count its occurrences in the
    * token array) instead of an explode + groupBy, so a 100 TB corpus
    * pays zero shuffle: the explode shape would shuffle every token of
    * every document just to find each row's own maximum. The inner
    * loop is O(words × distinct) per row — bounded by document length,
    * not corpus size, and fully codegen'd.
    *
    * THE LENGTH ASSUMPTION: O(words × distinct) is quadratic in the
    * worst case, so one pathological document (100k+ distinct tokens)
    * costs ~10⁹ comparisons inside a single task — far worse than the
    * explode+groupBy shape it replaces, and invisible until that row
    * arrives. `maxTokens > 0` caps it: metrics are computed over the
    * first `maxTokens` tokens only (a deliberate semantic truncation —
    * repetition signals saturate long before 10k tokens; a mirrored
    * oracle must slice identically). The default 0 keeps the exact
    * full-document semantics for the oracle-gated entries, whose
    * corpus is length-bounded; a 100 TB crawl pipeline should set
    * ~10k.
    *
    * Tokenization is a bare single-space split (no lower-casing, no
    * empty-token filter) so DuckDB's `string_split(text, ' ')` mirrors
    * it exactly — both engines count identical token multisets. */
  def repetitionMetrics(df: DataFrame, idCol: String,
      textCol: String, maxTokens: Int = 0): DataFrame = {
    val t0 = split(col(textCol), " ")
    val t = if (maxTokens > 0) slice(t0, 1, maxTokens) else t0
    val d = array_distinct(t)
    val nWords = size(t).cast("long")
    val nDistinct = size(d).cast("long")
    val topFreq = aggregate(d, lit(0L), (acc, w) =>
      greatest(acc, size(filter(t, x => x === w)).cast("long")))
    df.select(
      col(idCol),
      nWords.as("n_words"),
      nDistinct.as("n_distinct_words"),
      round(lit(1.0) - nDistinct.cast("double") / nWords, 6)
        .as("dup_word_frac"),
      round(topFreq.cast("double") / nWords, 6).as("top_word_frac"))
  }

  /** Per-document unigram (token) entropy in bits — the cheap
    * perplexity proxy a curation pipeline uses where a model-based
    * scorer is too expensive (low entropy ⇒ repetitive/templated
    * text; with [[repetitionMetrics]] it completes the repetition
    * family). Per-row nested HOF like repetitionMetrics — zero
    * shuffle, and the same O(words × distinct) per-row bound:
    * `maxTokens > 0` truncates to the first `maxTokens` tokens for
    * pathologically long rows (see [[repetitionMetrics]]'s length
    * note). Each −p·log₂p term is cast to DECIMAL(28,18) and the
    * fold accumulates exactly, so the sum is order-independent (the
    * oracle's GROUP BY addition order differs from the fold's
    * first-occurrence order; a double accumulator would diverge in
    * the last ulps) — the only cross-engine risk left is the final
    * 6-dp rounding of log₂'s own last-ulp variation. */
  def tokenEntropy(df: DataFrame, idCol: String,
      textCol: String, maxTokens: Int = 0): DataFrame = {
    val t0 = split(col(textCol), " ")
    val t = if (maxTokens > 0) slice(t0, 1, maxTokens) else t0
    val nTok = size(t).cast("double")
    val d = array_distinct(t)
    val h = aggregate(d,
      lit(0).cast("decimal(38,18)"),
      (acc, w) => {
        val p = size(filter(t, x => x === w)).cast("double") / nTok
        (acc + (-p * log2(p)).cast("decimal(28,18)"))
          .cast("decimal(38,18)")
      })
    df.select(col(idCol), round(h.cast("double"), 6).as("token_entropy"))
  }

  /** Per-document average unigram SURPRISAL against the corpus's own
    * unigram distribution: mean of −log₂ p(t) over the doc's token
    * multiset, p(t) = corpus frequency / corpus token count. The
    * statistical-LM quality proxy one step up from [[tokenEntropy]]
    * (which is per-doc only): a doc of corpus-common tokens scores
    * low (templated / boilerplate), one of corpus-rare tokens scores
    * high (novel or noise) — the KenLM-style filter signal computable
    * without a model artifact.
    *
    * Scale shape (100 TB): the frequency table is the classic
    * word-count (map-side-combined, one row per vocab entry
    * shuffles); the corpus total is an aggregation OVER that vocab
    * aggregation, cross-joined back as a broadcast scalar — the vocab
    * shuffle is computed once and ReusedExchange'd between the two
    * consumers (PlanSpec asserts it), so the corpus explodes exactly
    * once and no stage ever single-partitions the vocabulary (the
    * previous global-window total moved EVERY vocab row through one
    * task — vocabularies at corpus scale are hundreds of millions of
    * entries; Spark 4's EliminateWindowPartitions also strips a
    * foldable partition key, so `partitionBy(lit(1))` was the same
    * global window with a WARN). Scoring joins exploded tokens to the
    * frequency table on the token key — both sides hash the same key,
    * and the per-doc sum is a map-side-combinable aggregation. Each
    * −log₂p term is cast to DECIMAL(28,18) before summing (the
    * [[tokenEntropy]] trick) so per-doc sums are exact and
    * order-independent; only log₂'s final-ulp variation rides on the
    * 6-dp round. */
  def unigramSurprisal(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("t"))
    val vocab = tok.groupBy(col("t")).agg(count(lit(1)).as("n"))
    val total = vocab.agg(sum(col("n")).as("total"))
    val p = vocab.crossJoin(broadcast(total))
      .select(col("t"),
        (col("n").cast("double") / col("total")).as("p"))
    tok.join(p, Seq("t"))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        sum((-log2(col("p"))).cast("decimal(28,18)")).as("s"))
      .select(col("id").as(idCol), col("n_tokens"),
        round(col("s").cast("double") / col("n_tokens"), 6)
          .as("avg_surprisal"))
  }

  /** [[unigramSurprisal]] generalized to word n-GRAMS: per-doc average
    * −log₂ of the corpus n-gram probability, over the doc's gram
    * MULTISET (order and repeats kept — this is a sequence-model
    * signal, not a set signal; bigrams at n=2 are the cheapest step up
    * from the unigram proxy toward real LM perplexity: a doc of
    * common words in an uncommon ORDER scores high here but low
    * there). Docs shorter than `n` tokens have no grams and emit no
    * row — same on any mirrored oracle.
    *
    * Scale shape: identical to [[unigramSurprisal]] with the gram
    * table in place of the vocab table (one explode, one
    * map-side-combined frequency shuffle ReusedExchange'd between
    * total and scorer, broadcast scalar total, DECIMAL term sums) —
    * the gram table is larger than a vocabulary but still
    * sub-corpus-scale, and nothing single-partitions it. */
  /** Overlapping word n-gram MULTISET of `textCol` (every occurrence
    * counts, unlike [[TextDedup.shingleArray]]'s per-doc distinct
    * sets) — the token stream the surprisal family scores. */
  def gramArray(textCol: Column, n: Int): Column = {
    require(n >= 1, "n must be at least 1")
    val w = split(textCol, " ")
    filter(
      transform(sequence(lit(0), greatest(size(w) - n, lit(0))),
        i => when(i + n <= size(w), concat_ws(" ", slice(w, i + 1, lit(n))))),
      g => g.isNotNull)
  }

  def gramSurprisal(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(gramArray(col(textCol), n)).as("t"))
    val freq = tok.groupBy(col("t")).agg(count(lit(1)).as("cnt"))
    gramSurprisalFromToks(tok.join(freq, Seq("t")), idCol)
  }

  /** [[gramSurprisal]] from an EXISTING (id, t, cnt) token exchange
    * (one row per gram OCCURRENCE, `cnt` = its corpus frequency —
    * [[graft.operators.SharedPairs.tokenGramExchange]]): the corpus
    * total is the exchange's row count (Σ freq over occurrences ≡
    * |occurrences|), broadcast back as a scalar, so scoring is a
    * projection plus ONE map-side-combined shuffle on the doc id —
    * the gram-key join the non-exchange path pays is already baked
    * into the artifact. Per-term DECIMAL(28,18) casts keep doc sums
    * partition-order-independent, exactly as before. */
  def gramSurprisalFromToks(toks: DataFrame, idCol: String): DataFrame = {
    val total = toks.agg(count(lit(1)).as("total"))
    toks.crossJoin(broadcast(total))
      .select(col("id"),
        (col("cnt").cast("double") / col("total")).as("p"))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("int").as("n_grams"),
        sum((-log2(col("p"))).cast("decimal(28,18)")).as("s"))
      .select(col("id").as(idCol), col("n_grams"),
        round(col("s").cast("double") / col("n_grams"), 6)
          .as("avg_surprisal"))
  }

  /** Per-document n-gram-LM IMPORTANCE WEIGHT for target-domain data
    * selection — the DSIR recipe (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling") with unigram features:
    * log w(x) = Σ_t [log₂ p̂_target(t) − log₂ p̂_raw(t)] over the doc's
    * token multiset, both distributions add-one smoothed over the RAW
    * corpus vocabulary (the target sample is small, so unsmoothed
    * target probabilities would zero out every token it misses; raw is
    * smoothed identically so the ratio is 0 for a token the target has
    * never seen exactly when its raw count is the same — symmetric,
    * not biased). A high average log-ratio means "looks like the
    * target domain"; resampling by these weights is the selection
    * step. `isTargetCol` marks the target-domain rows INSIDE the same
    * corpus (a separate target corpus would union in with the flag
    * set).
    *
    * Scale shape (100 TB): one token explode feeds ONE vocab shuffle
    * whose conditional aggregate carries both counts (raw via
    * count(*), target via sum(flag)) — the target distribution costs
    * no second pass and no second exchange. The three totals
    * (Σn_raw, Σn_target, |V|) are an aggregation over that vocab
    * aggregation, broadcast back as a scalar row, so the vocab
    * exchange is computed once and reused ([[unigramSurprisal]]'s
    * pattern; PlanSpec asserts the ReusedExchange and that no global
    * window appears). Scoring joins tokens to vocab on the token key
    * and the per-doc sum is map-side combinable. Per-term
    * DECIMAL(28,18) casts keep doc sums order-independent. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTargetCol: Column): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      when(isTargetCol, 1L).otherwise(0L).as("tgt"),
      explode(split(col(textCol), " ")).as("t"))
    val vocab = tok.groupBy(col("t"))
      .agg(count(lit(1)).as("n"), sum(col("tgt")).as("nt"))
    val tot = vocab.agg(sum(col("n")).as("tot_raw"),
      sum(col("nt")).as("tot_tgt"), count(lit(1)).as("v"))
    val term = vocab.crossJoin(broadcast(tot))
      .select(col("t"),
        (log2((col("nt").cast("double") + 1) / (col("tot_tgt") + col("v"))) -
          log2((col("n").cast("double") + 1) / (col("tot_raw") + col("v"))))
          .cast("decimal(28,18)").as("s"))
    tok.join(term, Seq("t"))
      .groupBy(col("id"))
      .agg(max(col("tgt")).cast("int").as("in_target"),
        count(lit(1)).cast("int").as("n_tokens"),
        sum(col("s")).as("lw"))
      .select(col("id").as(idCol), col("in_target"), col("n_tokens"),
        // + 0.0 normalizes IEEE negative zero: the two engines' log2
        // differ in the last ulp, so a ~zero ratio sum can land at
        // -1e-18 on one side and exactly 0 on the other — round()
        // then renders -0.0 vs 0.0 and the hash gate splits on the
        // SIGN of nothing (first seen at sf0.1; the oracle adds the
        // same + 0)
        (round(col("lw").cast("double") / col("n_tokens"), 6) + lit(0.0))
          .as("avg_log_ratio"))
  }

  /** Per-document boilerplate fraction against the corpus's `topK`
    * most-frequent n-grams — the C4/CCNet-style template detector: a
    * doc whose shingles are mostly corpus-hot n-grams is navigation
    * chrome / licence text / SEO spam, not prose, and a curation run
    * cuts on this fraction.
    *
    * Scale shape (100 TB): the gram document-frequency aggregation is
    * the classic map-side-combined count (one shuffle of (gram, 1)
    * partials); the top-K selection is orderBy+limit, which Spark
    * plans as TakeOrderedAndProject — per-partition top-K then a
    * K-row driver merge, NO global sort shuffle. Scoring then
    * broadcasts those K grams as ONE array row and intersects per-row
    * (HOF, codegen'd) — the corpus itself is never shuffled to be
    * scored, and the only wide exchange in the whole plan carries
    * gram-count partials. Ties at the K boundary break
    * deterministically by gram text, so the boundary is
    * engine-portable. */
  def boilerplateStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, topK: Int = 100): DataFrame = {
    val grams = TextDedup.explodedShingles(df, idCol, textCol, n)
    val top = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("g").asc).limit(topK)
      .agg(sort_array(collect_list(col("g"))).as("bp"))
    val garr = TextDedup.shingleArray(col(textCol), n)
    df.crossJoin(broadcast(top))
      .select(col(idCol),
        size(garr).as("n_grams"),
        size(array_intersect(garr, col("bp"))).as("n_boiler"))
      .select(col(idCol), col("n_grams"), col("n_boiler"),
        round(when(col("n_grams") > 0,
          col("n_boiler").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)), 6).as("boiler_frac"))
  }

  /** Per-document gram novelty — what fraction of a doc's distinct
    * n-grams appear FIRST in that doc (first = min doc_id over the
    * corpus, a deterministic arrival order)? The contribution metric
    * behind dataset ablations: a source whose docs are mostly
    * never-seen-before grams adds new text; one near 0 re-treads the
    * corpus, however the pair-level dedup scored it.
    *
    * Scale shape (100 TB): one gram-keyed shuffle for the min-id
    * aggregation, then the gram→doc join lands on the SAME gram
    * hashing (no second exchange of the big side), then a per-doc
    * count. Docs below the shingle width surface with zero grams via
    * the final left join — the corpus is never re-shuffled for it. */
  def gramNovelty(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val grams = TextDedup.explodedShingles(df, idCol, textCol, n)
    val firstSeen = grams.groupBy(col("g")).agg(min(col("id")).as("first_id"))
    gramNoveltyFromExchange(df, idCol, grams.join(firstSeen, Seq("g")))
  }

  /** [[gramNovelty]] from an EXISTING exchange carrying (id,
    * first_id) per gram row
    * ([[graft.operators.SharedPairs.gramExchange]]): first-claimant
    * resolution is baked into the artifact, so novelty needs no
    * gram-keyed shuffle at all — one map-side-combined rollup on the
    * doc id, plus the cheap id-spine join that keeps zero-gram docs
    * in the result. */
  def gramNoveltyFromExchange(df: DataFrame, idCol: String,
      exchange: DataFrame): DataFrame = {
    val perDoc = exchange
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("int").as("n_grams"),
        sum(when(col("first_id") === col("id"), 1).otherwise(0))
          .cast("int").as("n_novel"))
    df.select(col(idCol))
      .join(perDoc.select(col("id").as(idCol), col("n_grams"), col("n_novel")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0)).as("n_grams"),
        coalesce(col("n_novel"), lit(0)).as("n_novel"),
        round(when(coalesce(col("n_grams"), lit(0)) > 0,
          col("n_novel").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)), 6).as("novelty_frac"))
  }

  /** Corpus token frequencies (the BPE-ish regex keeps alnum runs):
    * one explode + one count shuffle; at 100 TB this is the classic
    * word-count with map-side partial aggregation. */
  def tokenFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(
        split(lower(col(textCol)), "[^a-z0-9]+"), t => length(t) > 0))
        .as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))

  /** Heavy-hitter tokens with a Count-Min-Sketch cross-check — the
    * sketch-family member the GK (q61), HLL++ (q83), and Bloom
    * (q129/q136) twins don't cover: point-frequency estimation. Emits
    * the EXACT top-`k` tokens (count desc, token asc — deterministic)
    * plus a per-token flag asserting Spark's public
    * `CountMinSketch` estimate obeys both CMS laws against the exact
    * count: never an undercount, and overcount ≤ ε·N with the
    * sketch's own confidence. Raw estimates are sketch-internal (seed
    * + hash-family specific) and can never hash-match another engine,
    * so — the q61/q83 discipline — the output carries exact values
    * and constant-true flags, which the oracle asserts next to its
    * own exact top-k.
    *
    * Scale shape: the exact side is one map-side-combined hash
    * aggregate + a TakeOrdered k; the sketch side is one pass
    * folding into a fixed ε/δ-sized table (~100 KB here) merged
    * associatively across partitions — the flag computation touches
    * k driver-side rows, never the corpus. */
  def heavyHittersChecked(docs: DataFrame, textCol: String, k: Int,
      eps: Double, confidence: Double, seed: Int): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(explode(split(col(textCol), " ")).as("t"))
    val cnts = toks.groupBy(col("t")).agg(count(lit(1)).as("cnt"))
    val top = cnts.orderBy(col("cnt").desc, col("t")).limit(k)
      .collect() // bounded: k rows
    val sketch = toks.stat.countMinSketch("t", eps, confidence, seed)
    checkedRows(spark, top, sketch, eps)
  }

  /** The shared flag tail of the heavy-hitter pair (in-plan q150 /
    * stored q157): exact top rows + both CMS laws asserted against
    * the sketch — ONE definition so the bound formula and output
    * schema cannot drift between the paths that claim the same
    * oracle. N is the sketch's own item count — no extra corpus
    * pass. */
  private def checkedRows(spark: org.apache.spark.sql.SparkSession,
      top: Array[org.apache.spark.sql.Row],
      sketch: org.apache.spark.util.sketch.CountMinSketch,
      eps: Double): DataFrame = {
    val bound = math.ceil(eps * sketch.totalCount()).toLong
    val rows = top.zipWithIndex.map { case (r, i) =>
      val (t, cnt) = (r.getString(0), r.getLong(1))
      val est = sketch.estimateCount(t)
      (t, cnt, i + 1, if (est >= cnt && est - cnt <= bound) 1 else 0)
    }
    import spark.implicits._
    rows.toSeq.toDF("t", "cnt", "rank", "est_ok")
      .select(col("t"), col("cnt"), col("rank").cast("int").as("rank"),
        col("est_ok").cast("int").as("est_ok"))
  }

  /** Persist a CMS heavy-hitter artifact at `dir` — the sketch-family
    * maintenance story [[heavyHittersChecked]] lacked (round-17
    * verdict #2 of the missing list): a monitoring deployment merges
    * per-batch sketches, it never rescans the corpus, and
    * `CountMinSketch.mergeInPlace` is exactly as associative as the
    * Bloom OR the q136 artifact is built on (counter tables of
    * identical geometry ADD, so merged ≡ insert-by-insert rebuilt
    * byte for byte — TextAnalysisSpec pins the bin bytes). Layout:
    *  - `cms.bin` — the serialized sketch (`CountMinSketch.writeTo`,
    *    Spark's own stable format), rewritten whole per merge (one
    *    fixed ε/δ-sized table, ~100 KB at the q150 geometry — not a
    *    row store);
    *  - `counts.parquet` (t, cnt, pfx) — the EXACT token counts as
    *    pure-additive segments (the q151 LSM shape: each cycle
    *    appends its own batch's counts, serving sum-merges), hash-
    *    bucketed by `pfx` so [[Warehouse.compactIndexPartitions]]
    *    applies when segment files accumulate. Exact counts ride the
    *    artifact because the operator's contract is exact top-k +
    *    sketch LAW flags (estimates are seed-internal, never
    *    comparable cross-engine — the q61/q83 discipline);
    *  - `ids.parquet` — the indexed-id ledger: token counts are
    *    additive over disjoint doc sets, so a re-ingested doc would
    *    inflate its tokens' counts AND the sketch (the q139
    *    corruption class) — append-only, enforced;
    *  - `_meta.json` {version, epsE9, confidenceE6, seed} — the
    *    sketch GEOMETRY (two sketches merge iff eps/confidence/seed
    *    match, which fix depth, width, and the hash family); the
    *    append derives its batch sketch from the stored meta, never
    *    the caller. */
  def buildCmsArtifact(docs: DataFrame, idCol: String, textCol: String,
      dir: String, eps: Double, confidence: Double, seed: Int): Unit = {
    // materialize once: toks feeds BOTH the counts write and the
    // sketch fold — un-checkpointed, the corpus would be tokenized
    // twice per build (round-18 ADVICE; the append path already
    // checkpoints its batch toks for the same reason)
    val toks = docs.select(explode(split(col(textCol), " ")).as("t"))
      .localCheckpoint(true)
    new java.io.File(dir).mkdirs()
    segmentTokenCounts(toks)
      .write.mode("overwrite").partitionBy("pfx")
      .parquet(s"$dir/counts.parquet")
    docs.select(col(idCol).cast("long").as("id"))
      .write.mode("overwrite").parquet(s"$dir/ids.parquet")
    // the stored sketch is built from the SAME rounded values the
    // meta persists (round-18 review): the append reconstructs ε/δ
    // from epsE9/confidenceE6, and CMS geometry (width = ⌈2/ε⌉) is a
    // ceiling of the raw double — an un-roundtrippable ε would build
    // a different width than every later batch sketch and the first
    // mergeInPlace would throw AFTER the counts segment landed
    val (epsE9, confE6) = (math.round(eps * 1e9),
      math.round(confidence * 1e6))
    writeCmsBin(toks.stat.countMinSketch("t", epsE9 / 1e9,
      confE6 / 1e6, seed), dir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_meta.json"),
      s"""{"version":1,"epsE9":$epsE9,""" +
        s""""confidenceE6":$confE6,"seed":$seed}""")
  }

  /** One segment's (t, cnt) rows, hash-bucketed into 16 `pfx`
    * partitions (tokens are arbitrary strings — a first-char layout
    * would mint unbounded partition values, so the bucket key is a
    * hash residue; the partition column exists for compaction, not
    * pruning: top-k serving is global by nature). */
  private def segmentTokenCounts(toks: DataFrame): DataFrame =
    toks.groupBy(col("t")).agg(count(lit(1)).as("cnt"))
      .withColumn("pfx", pmod(xxhash64(col("t")), lit(16)).cast("int"))

  private def writeCmsBin(
      sketch: org.apache.spark.util.sketch.CountMinSketch,
      dir: String): Unit = {
    val tmp = java.nio.file.Paths.get(s"$dir/.cms.bin.tmp")
    val out = java.nio.file.Files.newOutputStream(tmp)
    try sketch.writeTo(out) finally out.close()
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(s"$dir/cms.bin"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def readCmsBin(snap: graft.operators.Warehouse.IndexSnapshot)
      : org.apache.spark.util.sketch.CountMinSketch = {
    val in = java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(snap.path("cms.bin")))
    try org.apache.spark.util.sketch.CountMinSketch.readFrom(in)
    finally in.close()
  }

  /** (epsE9, confidenceE6, seed) from the artifact meta, v1-gated. */
  private def readCmsMeta(
      snap: graft.operators.Warehouse.IndexSnapshot): (Long, Long, Long) = {
    val dir = snap.root
    val meta = Warehouse.readMetaJson(snap, "CMS artifact")
    Warehouse.requireMetaVersion(meta, dir, "CMS artifact", 1L,
      "merged sketch bytes + additive count segments")
    def f(key: String): Long = Warehouse.metaLong(meta, dir, key)
    (f("epsE9"), f("confidenceE6"), f("seed"))
  }

  /** Merge an ingest batch into a persisted CMS artifact — cost ∝
    * batch: the batch's tokens fold into a sketch with the ARTIFACT'S
    * OWN geometry (from `_meta.json`, never the caller) and
    * `mergeInPlace` adds the counter tables; the batch's exact counts
    * land as a new segment; the existing corpus is never read.
    * Append-only against the id ledger, intra-batch duplicates
    * refused ([[Warehouse.requireUniqueBatchIds]]); an empty batch is
    * a no-op. */
  def appendToCmsArtifact(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = Warehouse.withIndexWriter(dir) {
    val txn = new Warehouse.EpochTxn(spark, dir)
    val snap = txn.snap
    val (epsE9, confE6, seed) = readCmsMeta(snap)
    val batchIds = batch.select(col(idCol).cast("long").as("id"))
      .distinct().localCheckpoint(true)
    if (batchIds.isEmpty) return
    Warehouse.requireUniqueBatchIds(batch, col(idCol).cast("long"),
      "CMS artifact")
    Warehouse.requireAppendOnly(
      snap.read(spark, "ids.parquet"), batchIds, "id",
      s"CMS artifact at $dir",
      "inflate its tokens' counts and the sketch")
    val toks = batch.select(explode(split(col(textCol), " ")).as("t"))
      .localCheckpoint(true) // feeds the segment AND the batch sketch
    // read + merge IN MEMORY before any write (round-18 review): a
    // merge failure (corrupt bin, doctored geometry) must abort the
    // cycle with the artifact untouched
    val merged = readCmsBin(snap)
    merged.mergeInPlace(toks.stat.countMinSketch("t",
      epsE9 / 1e9, confE6 / 1e6, seed.toInt))
    // ledger segment + counts segment + merged sketch bytes land as
    // ONE manifest swap (round-20): a reader can never see new counts
    // under the old sketch (which would break the est ≥ cnt law the
    // artifact asserts) or vice versa, and a crash before the commit
    // leaves NO visible state — the retry re-runs cleanly, retiring
    // the round-18 ledger-first ordering
    txn.appendSegment("ids.parquet", batchIds)
    txn.appendSegment("counts.parquet", segmentTokenCounts(toks),
      Seq("pfx"))
    txn.replaceFile("cms.bin") { f =>
      val out = java.nio.file.Files.newOutputStream(f.toPath)
      try merged.writeTo(out) finally out.close()
    }
    txn.commit()
  }

  // NO DELETE TIER for the CMS artifact, by construction (round-19
  // delete-contract note): a Count-Min sketch is a sum of hashed
  // counter increments with no per-doc attribution, so removing a
  // document's tokens from `cms.bin` is impossible — subtracting a
  // batch sketch would break the never-undercount law for every
  // colliding token. The EXACT count segments are additive and could
  // cancel, but the sketch they cross-check cannot follow, and a
  // subtracted count table against an unsubtractable sketch would
  // fail the est ≥ cnt law this artifact exists to assert.
  // Takedown/opt-out here is REBUILD: drop the directory and re-run
  // [[buildCmsArtifact]] over the remaining corpus (cost ∝ corpus —
  // the documented trade of every irreversible sketch; the Bloom
  // artifact carries the same contract, see
  // [[TextDedup.buildBloomArtifact]]).

  /** [[heavyHittersChecked]] served from the persisted artifact: the
    * exact top-k comes from one sum-merge over the (vocabulary-sized)
    * count segments, the law flags from the stored (merged) sketch —
    * zero corpus rescan per serving call, and because merged ≡
    * rebuilt exactly, the result sits under the SAME self-gating
    * oracle as the in-plan pass. */
  def heavyHittersFromArtifact(spark: org.apache.spark.sql.SparkSession,
      dir: String, k: Int): DataFrame = {
    // ONE snapshot: meta, sketch bytes and count segments all resolve
    // from the same epoch — an append committing mid-serve can never
    // pair new counts with the old sketch
    val snap = Warehouse.indexSnapshot(dir)
    val (epsE9, _, _) = readCmsMeta(snap)
    val sketch = readCmsBin(snap)
    val top = snap.read(spark, "counts.parquet")
      .groupBy(col("t")).agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("t")).limit(k)
      .collect() // bounded: k rows
    checkedRows(spark, top, sketch, epsE9 / 1e9)
  }

  /** Canonical content fingerprint: digest of the sorted distinct
    * token set — catches shuffled/reordered copies that exact dedup
    * misses. Per-row, zero shuffle. */
  def fingerprint(textCol: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(textCol)))))

  /** Order-sensitive rolling hash over tokens (xxhash64 chaining —
    * no overflow under ANSI mode), per-row — the winnowing-style
    * signal that complements the order-invariant [[fingerprint]]. */
  def rollingHash(textCol: Column): Column =
    aggregate(tokens(textCol), lit(0L), (acc, t) => xxhash64(acc, t))
}
