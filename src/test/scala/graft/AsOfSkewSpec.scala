package graft

import graft.operators.{AsOf, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asOfJoin attaches the latest right row at or before each left ts") {
    val left = Seq((1L, 10L, "c1"), (1L, 25L, "c2"), (2L, 5L, "c3"),
        (2L, 30L, "c4"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (2L, 6L, 300.0),
        (2L, 29L, 400.0))
      .toDF("k", "t", "v")
    val out = AsOf.asOfJoin(left, right, "k", "t", Seq("v"))
      .select("name", "v").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "c1" -> Some(100.0), // equal ts IS visible (>= semantics)
      "c2" -> Some(200.0), // latest of the two candidates
      "c3" -> None,        // right row is later — no match
      "c4" -> Some(400.0)))
  }

  test("asOfJoin equals the naive range-join formulation") {
    val n = 400
    val left = spark.range(n).select(
      (col("id") % 7).as("k"), (col("id") * 13 % 101).as("t"),
      col("id").as("lid"))
    val right = spark.range(n).select(
      (col("id") % 7).as("k"), (col("id") * 17 % 101).as("t"),
      col("id").as("rid"))
    val composed = AsOf.asOfJoin(left, right, "k", "t", Seq("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    // naive: max-ts right row per left via range join. Ties on (k, t)
    // broken by max rid in BOTH formulations? The window orders only
    // by (t, tag), so compare on the matched ts instead, which is
    // uniquely determined.
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("l.lid").as("lid"))
      .agg(max(col("r.t")).as("best_t"))
      .as[(Long, Option[Long])].collect().toMap
    val composedTs = AsOf.asOfJoin(left,
        right.withColumnRenamed("t", "rt")
          .withColumn("t", col("rt")), "k", "t", Seq("rt"))
      .select("lid", "rt").as[(Long, Option[Long])].collect().toMap
    assert(composedTs == naive)
    assert(composed.keySet == naive.keySet)
  }

  test("asOfJoin tie-break makes equal-ts right rows deterministic") {
    val left = Seq((1L, 10L, "c")).toDF("k", "t", "name")
    // two right rows at the SAME (k, t): without a tie-break the
    // winner is partition-order dependent; with rid as tie-break the
    // highest rid wins, every run
    val right = Seq((1L, 10L, 5L, 50.0), (1L, 10L, 9L, 90.0),
        (1L, 10L, 7L, 70.0))
      .toDF("k", "t", "rid", "v")
    (1 to 3).foreach { _ =>
      val out = AsOf.asOfJoin(left, right.repartition(4), "k", "t",
        Seq("rid", "v"), tieBreakCols = Seq("rid")).head()
      assert(out.getAs[Long]("rid") == 9L &&
        out.getAs[Double]("v") == 90.0)
    }
  }

  test("asOfJoin rejects rightCols that would duplicate output names") {
    val left = Seq((1L, 10L, "c")).toDF("k", "t", "name")
    val right = Seq((1L, 10L, 5.0)).toDF("k", "t", "v")
    // keyCol/tsCol are already emitted from the left side — a payload
    // column with the same name would produce two output columns `k`
    val e1 = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(left, right, "k", "t", Seq("k", "v"))
    }
    assert(e1.getMessage.contains("keyCol/tsCol"))
    val e2 = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(left, right, "k", "t", Seq("t"))
    }
    assert(e2.getMessage.contains("keyCol/tsCol"))
    // a payload column shadowing a non-key left column is still caught
    val e3 = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(left, right.withColumnRenamed("v", "name"),
        "k", "t", Seq("name"))
    }
    assert(e3.getMessage.contains("duplicate left"))
  }

  test("saltedJoin is row-identical to the plain equi-join") {
    val skewed = spark.range(1000).select(
      when(col("id") % 10 < 8, lit(1L)).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val compact = spark.range(500).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("name"))
    val salted = Skew.saltedJoin(skewed, compact, "k", salt = 8,
        scatterCols = Seq("payload"))
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val plain = skewed.join(compact, Seq("k"))
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
  }
}
