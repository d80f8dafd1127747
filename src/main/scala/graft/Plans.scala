package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: dump `.explain("formatted")` for declared queries into
  * text files — the optimization-round evidence trail
  * (`plans/r21/<query>_{before,after}.txt`). Not part of the driver
  * contract; session config mirrors Bench so the captured plans are
  * the ones the bench executes (AQE on, shuffle partitions = cpus).
  *
  * Usage: runMain graft.Plans <sfDir> <outDir> <suffix> [q1,q2,...]
  * (empty or missing filter = every declared query).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = new java.io.File(args(1))
    val suffix = args(2)
    val only: Option[Seq[String]] =
      if (args.length > 3 && args(3).nonEmpty)
        Some(args(3).split(',').toSeq.filter(_.nonEmpty))
      else None
    outDir.mkdirs()
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
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
    for ((name, fn) <- queries) {
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(FormattedMode)
        val f = new java.io.File(outDir, s"${name}_$suffix.txt")
        val w = new java.io.PrintWriter(f, "UTF-8")
        try w.println(txt) finally w.close()
        System.err.println(s"[plans] wrote $f")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
