package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-curation query entry points over the harness
  * `documents` / `embeddings` tables — dedup family, similarity
  * search, text analysis, multimodal plumbing. Each is a `queries`
  * entry in [[graft.SparkEntry]]; SQL-expressible ones carry a DuckDB
  * oracle. */
object Curation {

  // ── Deduplication ──────────────────────────────────────────────────
  def q20DedupExact(s: SparkSession, dir: String): DataFrame =
    TextDedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("digest"))

  def q21DedupNgram(s: SparkSession, dir: String): DataFrame =
    TextDedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, minJaccard = 0.8)
      .orderBy(col("a"), col("b"))

  def q22DedupMinhash(s: SparkSession, dir: String): DataFrame =
    TextDedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, numHashes = 128, bands = 32, minJaccard = 0.8)
      .orderBy(col("a"), col("b"))

  def q23DedupSimhash(s: SparkSession, dir: String): DataFrame =
    TextDedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, maxHamming = 7, minJaccard = 0.8)
      .orderBy(col("a"), col("b"))

  // ── Similarity search ──────────────────────────────────────────────
  def q24EmbedKnn(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  def q25EmbedAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    Similarity.lshTopK(
        e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 10,
        planes = 8, tables = 8)
      .orderBy(col("query_id"), col("rank"))
  }

  def q47EmbedAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    Similarity.ivfTopK(
        e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 10,
        nLists = 16, nProbe = 6)
      .orderBy(col("query_id"), col("rank"))
  }

  def q26EmbedNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(
        Tables.embeddings(s, dir), "vec_id", "embedding", minCosine = 0.4)
      .orderBy(col("a"), col("b"))

  // ── Text analysis ──────────────────────────────────────────────────
  def q27TextLangId(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("pred_lang"),
        col("lang").as("tagged_lang"))
      .orderBy(col("doc_id"))
  }

  def q28TextQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  def q29TokenFreq(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenFrequencies(Tables.documents(s, dir), "text")
      .orderBy(col("freq").desc, col("token"))
      .limit(50)

  def q30Fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  // ── Multimodal plumbing (decode stub; see Multimodal scaladoc) ─────
  def q31MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.withMediaColumn(
      Tables.documents(s, dir), "doc_id", "text")
    Multimodal.decodeFeatures(s, media).toDF()
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        col("head_hex"))
      .orderBy(col("doc_id"))
  }
}
