package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual fallback when AQE's
  * skew-join split can't help (e.g. a build side that must replicate,
  * or an aggregation hot key).
  *
  * A skewed join key (one customer with 10% of all rows) pins its
  * whole bucket on one task at 100 TB. [[saltedJoin]] scatters the
  * skewed side's rows across `salt` sub-keys with a DETERMINISTIC
  * hash of scatter columns (no `rand()` — retried tasks must re-salt
  * identically or shuffle retries duplicate/lose rows), and
  * replicates the other side `salt`× so every sub-key still finds its
  * match. Output is row-identical to the plain equi-join; only the
  * partitioning changes: the hot key's rows now spread over `salt`
  * tasks.
  */
object Skew {

  /** Equi-join `skewed ⋈ compact` on `keyCol` with the skewed side
    * scattered over `salt` sub-keys derived from `scatterCols`
    * (pick high-cardinality non-key columns) and the compact side
    * replicated `salt`×. Semantically identical to
    * `skewed.join(compact, keyCol)`. */
  def saltedJoin(skewed: DataFrame, compact: DataFrame, keyCol: String,
      salt: Int, scatterCols: Seq[String]): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val l = skewed.withColumn("__salt",
      pmod(xxhash64(scatterCols.map(col).toIndexedSeq: _*), lit(salt.toLong)))
    val r = compact.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    l.join(r, Seq(keyCol, "__salt")).drop("__salt")
  }
}
