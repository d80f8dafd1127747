package graft

import graft.operators.Mixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sequence packing assigns packs by running start offset") {
    // group a, budget 5, token counts 3,2,4,1 → starts 0,3,5,9
    val docs = Seq(
      (1L, "a", "w w w"), (2L, "a", "w w"),
      (3L, "a", "w w w w"), (4L, "a", "w"),
      (10L, "b", "w w w w w w")).toDF("doc_id", "source", "text")
    val got = Mixture.sequencePacking(docs, "doc_id", "text", "source", 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(got(1L) == ((3, 0, 0)))
    assert(got(2L) == ((2, 0, 3)))
    assert(got(3L) == ((4, 1, 0)))   // starts at 5 → pack 1, offset 0
    assert(got(4L) == ((1, 1, 4)))   // starts at 9 → pack 1, offset 4
    assert(got(10L) == ((6, 0, 0)))  // group b packs independently
  }

  test("shard manifest: hex-digit shards, (hash, id) in-shard order") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "a b c"), (4L, "f"))
      .toDF("doc_id", "text")
    val got = Mixture.shardManifest(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
    // exact duplicates (1, 3) share a shard and sit adjacent, id order
    assert(got(1L)._1 == got(3L)._1)
    assert(got(3L)._2 == got(1L)._2 + 1)
    assert(got(1L)._3 == 3 && got(2L)._3 == 2 && got(4L)._3 == 1)
    // shard = first md5 hex digit; positions are 1-based and dense
    got.values.groupBy(_._1).values.foreach { members =>
      assert(members.map(_._2).toSeq.sorted == (1 to members.size))
    }
    assert(got.values.forall(v => v._1 >= 0 && v._1 <= 15))
  }

  test("keep rates follow weights and cap at 1.0") {
    // counts a=4, b=1; weights a=1, b=3; outF=0.5; total=5, Σw=4
    // rate_a = 0.5·5·1/(4·4) = 0.15625; rate_b = 1.875 → capped 1.0
    val docs = (1 to 4).map(i => (i.toLong, "a", s"t$i")) :+
      ((9L, "b", "t9"))
    val rates = Mixture.keepRates(docs.toDF("doc_id", "source", "text"),
        "source", when(col("source") === "b", 3).otherwise(1), 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates == Map("a" -> 0.15625, "b" -> 1.0))
  }

  test("rebalance keeps every doc of a rate-1.0 group, deterministically") {
    val docs = ((1 to 40).map(i => (i.toLong, "a", s"text number $i")) :+
      ((99L, "b", "rare"))).toDF("doc_id", "source", "text")
    val run1 = Mixture.rebalance(docs, "doc_id", "text", "source",
      when(col("source") === "b", 3).otherwise(1), 0.5)
      .select("doc_id").as[Long].collect().sorted
    val run2 = Mixture.rebalance(docs.repartition(7), "doc_id", "text",
      "source", when(col("source") === "b", 3).otherwise(1), 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(run1.sameElements(run2))      // re-partition-proof
    assert(run1.contains(99L))           // capped group fully kept
    assert(run1.length < 41)             // group a actually sampled
  }
}
