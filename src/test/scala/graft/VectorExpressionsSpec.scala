package graft

import graft.functions.VectorExpressions
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0f, 2.0f, 3.0f)), (1L, Seq(3.0f, 2.0f, 1.0f)),
    (2L, Seq(1.0f, 2.0f, 3.0f)))
    .toDF("vec_id", "embedding")

  test("native expression matches the HOF formulation bit-for-bit") {
    def hofCosine(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) = {
      def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    }
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        VectorExpressions.cosineSimilarity(
          col("a.embedding"), col("b.embedding")).as("native"),
        hofCosine(col("a.embedding"), col("b.embedding")).as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("identical vectors score 1.0 exactly") {
    val r = vecs.as("a").join(vecs.as("b"),
        col("a.vec_id") === 0 && col("b.vec_id") === 2)
      .select(VectorExpressions.cosineSimilarity(
        col("a.embedding"), col("b.embedding"))).head().getDouble(0)
    assert(r == 1.0)
  }

  test("expression participates in whole-stage codegen") {
    // a real parquet scan (literal local relations get evaluated
    // driver-side and never enter codegen)
    val e = Tables.embeddings(spark, SparkTestSession.sf)
    val df = e.select(VectorExpressions.cosineSimilarity(
      col("embedding"), col("embedding")).as("c"))
    df.collect() // finalize the adaptive plan so codegen stages appear
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd operators render as "*(n)" in the final adaptive plan
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[cosine_similarity.*"),
      s"expected codegen'd cosine projection in:\n$plan")
  }

  test("SQL registration via GraftExtensions-style injection") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => graft.functions.CosineSimilarityExpr(exprs(0), exprs(1)),
      "built-in")
    vecs.createOrReplaceTempView("v")
    val r = spark.sql(
      """SELECT cosine_similarity(a.embedding, b.embedding) AS c
        |FROM v a JOIN v b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(r - 10.0 / 14.0) < 1e-12)
  }

  test("similarity operators produce identical results through the kernel") {
    val top = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(top.toSeq == Seq((2L, 1), (1L, 2)))
  }

  test("lsh_sign_keys registers as a SQL function via extensions") {
    // same registration shape as GraftExtensions (int args must be
    // literals there; fixed here since temp functions see only exprs)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_sign_keys",
      exprs => graft.functions.LshSignKeysExpr(exprs(0),
        2, 3),
      "built-in")
    vecs.createOrReplaceTempView("v_lsh")
    val keys = spark.sql(
      "SELECT lsh_sign_keys(embedding, 2, 3) AS k FROM v_lsh WHERE vec_id = 0")
      .head().getSeq[Long](0)
    assert(keys.length == 3)
    assert(keys.map(_ >> 32).toSeq == Seq(0L, 1L, 2L)) // table salts
  }

  test("fused LSH keys match an independent sign computation") {
    val planes = 3; val tables = 4; val dims = 5
    val data = Seq(
      (1L, Array(0.5f, -1.0f, 2.0f, 0.25f, -0.75f)),
      (2L, Array(-0.1f, 0.0f, 1.5f, -2.0f, 0.3f)))
    val df = data.toDF("vec_id", "embedding")
    val got = df.select($"vec_id",
        graft.functions.VectorExpressions.lshSignKeys(
          $"embedding", planes, tables).as("keys"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    // reference computation straight from the mix64 definition
    def plane(p: Int): Array[Double] = Array.tabulate(dims)(i =>
      graft.functions.VectorExpressions
        .mix64((p.toLong << 32) | i.toLong).toDouble / Long.MaxValue.toDouble)
    val want = data.map { case (id, v) =>
      id -> (0 until tables).map { t =>
        (0 until planes).foldLeft(t.toLong << 32) { (key, j) =>
          val dot = plane(t * planes + j).zip(v.map(_.toDouble))
            .map { case (a, b) => a * b }.sum
          if (dot >= 0) key | (1L << j) else key
        }
      }.toSeq
    }.toMap
    assert(got == want)
    // interpreted path agrees with codegen
    val expr = graft.functions.LshSignKeysExpr(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression($"embedding"),
      planes, tables)
    data.foreach { case (id, v) =>
      val interp = expr.nullSafeEval(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      assert(interp == want(id))
    }
  }
}
