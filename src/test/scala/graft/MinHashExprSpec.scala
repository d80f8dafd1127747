package graft

import graft.functions.MinHashExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native [[graft.functions.MinHashSignatureExpr]]
  * bit-identical to the HOF formula it replaced — the seed-chain
  * semantics of Spark's two-argument `xxhash64` are subtle (default
  * seed 42 threads through BOTH children, int vs long element
  * hashing differ), so equality is asserted, not assumed. */
class MinHashExprSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def hofSignature(c: org.apache.spark.sql.Column, k: Int) =
    aggregate(c, array_repeat(lit(Long.MaxValue), k),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(k - 1)),
        (m, seed) => least(m, xxhash64(h, seed))))

  test("native signature equals the HOF formula on random gram sets") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rng.nextInt(80))(rng.nextLong()))
    } :+ (999L, Seq.empty[Long]) // empty gram set: all-MaxValue lanes
    val df = rows.toDF("id", "hs")
    for (k <- Seq(4, 32, 128)) {
      val bad = df.select(col("id"),
          MinHashExpressions.minhashSignature(col("hs"), k).as("native"),
          hofSignature(col("hs"), k).as("hof"))
        .filter(not(col("native") === col("hof")))
        .count()
      assert(bad == 0, s"native != HOF for $bad rows at numHashes=$k")
    }
  }

  test("signature AGGREGATE equals the per-row expression on exploded rows") {
    import spark.implicits._
    // the batch formulation ([[graft.functions.MinHashSigAgg]]) must
    // produce the same lanes as the per-row expression whatever the
    // partition split — fixed-width partials + element-wise-min merge
    val rng = new scala.util.Random(11)
    val rows = (0 until 60).map { i =>
      (i.toLong, Seq.fill(1 + rng.nextInt(50))(rng.nextLong()))
    }
    val df = rows.toDF("id", "hs")
    for (k <- Seq(8, 128); parts <- Seq(1, 7)) {
      val exploded = df.select(col("id"), explode(col("hs")).as("h"))
        .repartition(parts)
      val agg = exploded.groupBy(col("id"))
        .agg(MinHashExpressions.minhashSignatureAgg(col("h"), k).as("sig"))
      val expr = df.select(col("id"),
        MinHashExpressions.minhashSignature(col("hs"), k).as("sig"))
      val bad = agg.as("a").join(expr.as("e"), Seq("id"))
        .filter(not(col("a.sig") === col("e.sig"))).count()
      assert(bad == 0, s"agg != expr for $bad docs at k=$k parts=$parts")
    }
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq((1L, Seq(3L, -9L, 42L, Long.MinValue, Long.MaxValue)))
      .toDF("id", "hs")
    val sig = MinHashExpressions.minhashSignature(col("hs"), 16)
    // force the interpreted path through a non-codegen parent: a HOF
    // wrapping the native child falls back to interpreted eval
    val bad = df.select(sig.as("cg"),
        element_at(transform(array(sig), x => x), 1).as("interp"))
      .filter(not(col("cg") === col("interp")))
      .count()
    assert(bad == 0)
  }

  test("native simhash64 equals the HOF formula on random gram sets") {
    import spark.implicits._
    def hofSimhash(c: org.apache.spark.sql.Column) =
      (0 until 64).map { j =>
        when(aggregate(c, lit(0L),
          (acc, h) => acc +
            when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L)
              .otherwise(-1L)) > 0,
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    val rng = new scala.util.Random(11)
    val rows = (0 until 150).map { i =>
      (i.toLong, Seq.fill(rng.nextInt(60))(rng.nextLong()))
    } :+ (998L, Seq.empty[Long])
    val df = rows.toDF("id", "hs")
    val bad = df.select(col("id"),
        MinHashExpressions.simhash64(col("hs")).as("native"),
        hofSimhash(col("hs")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(bad == 0, s"native simhash != HOF for $bad rows")
  }

  test("type check rejects non-long arrays") {
    import spark.implicits._
    val df = Seq((1, Seq("a", "b"))).toDF("id", "ss")
    val e = intercept[Exception] {
      df.select(MinHashExpressions.minhashSignature(col("ss"), 8)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("minhash_signature") ||
      e.getMessage.toLowerCase.contains("array<bigint>"))
  }
}
