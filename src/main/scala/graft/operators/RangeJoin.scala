package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Containment range join — points matched to the intervals that
  * contain them — without the cartesian-then-filter plan Spark picks
  * for a raw `BETWEEN` join condition (a non-equi join has no
  * hashable key, so every (point, interval) pair of a key meets).
  *
  * Buckets restore an equi-key: intervals replicate over the
  * fixed-width buckets they overlap (⌈len/width⌉+1 rows each), points
  * land in exactly one bucket, and the join runs on
  * (key, bucket) — hashable, AQE-planable, skew-splittable — with the
  * exact `BETWEEN` applied as a post-filter. With `bucketWidth` near
  * the typical interval length, replication is ~2× and every bucket's
  * population is bounded by time-locality, so the plan scales linearly
  * where the naive condition is quadratic per key.
  *
  * Bucket ids use integer `div` — floating-point division would lose
  * sub-microsecond precision above 2⁵³ (nanosecond epochs are 2⁶¹).
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` rows with
    * `start <= pt <= end` for the same `keyCol`. All of `ptCol`,
    * `startCol`, `endCol` must be integral (e.g. epoch nanos).
    * Output: every point column + every interval column (key once). */
  def containmentJoin(points: DataFrame, intervals: DataFrame,
      keyCol: String, ptCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points.withColumn("__bk", expr(s"$ptCol div $bucketWidth"))
    val i = intervals.withColumn("__bk", explode(
      sequence(expr(s"$startCol div $bucketWidth"),
        expr(s"$endCol div $bucketWidth"))))
    p.join(i, Seq(keyCol, "__bk"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bk")
  }
}
