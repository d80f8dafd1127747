package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def points = spark.range(300).select(
    (col("id") % 5).as("k"), (col("id") * 7 % 997).as("t"),
    col("id").as("pid"))
  private def intervals = spark.range(60).select(
    (col("id") % 5).as("k"), (col("id") * 31 % 900).as("s"),
    col("id").as("iid"))
    .withColumn("e", col("s") + (col("iid") % 4) * 40 + 10)

  test("containmentJoin equals the naive BETWEEN join") {
    val bucketed = RangeJoin.containmentJoin(points, intervals,
        "k", "t", "s", "e", bucketWidth = 50)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") &&
          col("p.t") >= col("i.s") && col("p.t") <= col("i.e"))
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(bucketed.nonEmpty)
  }

  test("the bucketed plan joins on an equi-key, not a cartesian") {
    val plan = RangeJoin.containmentJoin(points, intervals,
      "k", "t", "s", "e", bucketWidth = 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("bucket ids stay exact at nanosecond-epoch magnitudes") {
    // 2⁶⁰-scale values: double division would misbucket these
    val big = Seq((1L, 1152921504606846975L, 1L)).toDF("k", "t", "pid")
    val ivs = Seq((1L, 1152921504606846000L, 1152921504606846999L, 7L))
      .toDF("k", "s", "e", "iid")
    val out = RangeJoin.containmentJoin(big, ivs, "k", "t", "s", "e",
      bucketWidth = 3600000000000L).select("pid", "iid")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 7L)))
  }
}
