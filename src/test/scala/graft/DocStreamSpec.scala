package graft

import graft.operators.TextDedup
import graft.streaming.DocStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DocStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming ingest near-dup equals the batch incremental path") {
    // the q62 oracle defines the incremental semantics; this gate
    // transfers it to the streaming twin: same md5 content split, the
    // incoming side fed as TWO micro-batches (per-batch independence —
    // the operator holds no state between them), output compared
    // pair-for-pair with jaccard values against
    // TextDedup.incrementalNearDupPairs
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, SparkTestSession.sf)
    val existing = docs.filter(substring(md5($"text"), 1, 1) < "c")
    val incoming = docs.filter(substring(md5($"text"), 1, 1) >= "c")
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val out = DocStream.nearDupAgainstIndex(
      src.toDF().toDF("doc_id", "text"), existing, "doc_id", "text",
      minJaccard = 0.8)
    val q = out.writeStream.format("memory").queryName("ingest_neardup")
      .outputMode("append").start()
    try {
      val rows = incoming.select($"doc_id", $"text")
        .as[(Long, String)].collect()
      val (b1, b2) = rows.splitAt(rows.length / 2)
      src.addData(b1.toSeq)
      q.processAllAvailable()
      src.addData(b2.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("ingest_neardup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = TextDedup.incrementalNearDupPairs(
          existing, incoming, "doc_id", "text", minJaccard = 0.8)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batch.nonEmpty, "fixture produced no cross-side pairs")
      assert(streamed == batch,
        s"streaming vs batch mismatch: only-streamed=" +
          s"${(streamed -- batch).take(3)} only-batch=" +
          s"${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("pair dedup is stateless: multi-band collisions emit one row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // identical text shares EVERY band key with its existing twin —
    // without the min-band filter it would emit `bands` rows
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val existing = Seq((1L, text)).toDF("doc_id", "text")
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val out = DocStream.nearDupAgainstIndex(
      src.toDF().toDF("doc_id", "text"), existing, "doc_id", "text",
      minJaccard = 0.5)
    val q = out.writeStream.format("memory").queryName("ingest_one")
      .outputMode("append").start()
    try {
      src.addData(Seq((10L, text)))
      q.processAllAvailable()
      val got = spark.table("ingest_one").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSeq == Seq((1L, 10L, 1.0)))
    } finally q.stop()
  }
}
