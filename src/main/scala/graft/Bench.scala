package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query at the target scale
  * factor and prints ONE JSON line for the driver. Queries materialize
  * through the `noop` sink — a bare count() would let Catalyst prune
  * aggregate expressions and joins, under-measuring the real work. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up outside the timed region: a representative
    // join+aggregate query, so scan/join/agg/codegen paths are all JIT'd
    // before the first timed query (a bare limit(10) left ~7 s of JIT
    // inside whichever query ran first)
    graft.operators.Reports.q04CrossNation(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // dev-only subset filter (same contract as Verify); the driver
    // sets no filter and always benches every query
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').toSeq.filter(_.nonEmpty))
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val secs = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name%-40s $secs%8.2f s")
        name -> secs
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
