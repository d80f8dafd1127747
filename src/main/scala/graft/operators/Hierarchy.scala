package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive hierarchy traversal (SURVEY §2.4 R13/R14).
  *
  * The reference walks group trees with recursive CTEs
  * (`reports/mssql/group-tree-parent-child.sql:4-9`, capped by
  * `option (maxrecursion 500)` in daily-cash-movement.sql:30). Spark has
  * no recursive CTE, so the closure is an iterative driver loop of
  * self-joins to fixpoint — each step joins the frontier (paths of
  * length k) to the edge set; real-world trees are shallow so the loop
  * runs O(depth) Spark jobs.
  *
  * Scale: the edge set is a dimension (small relative to facts) and is
  * broadcast on every step, so no shuffle of the growing closure.
  * Frontiers are localCheckpoint'ed to sever lineage — without it the
  * plan doubles per iteration and the driver chokes long before the
  * data does.
  */
object Hierarchy {

  /** Transitive closure of `edges(parent, child)` →
    * `(ancestor, descendant, depth)`, depth ≥ 1.
    *
    * @param maxDepth hard cap mirroring the reference's maxrecursion
    *                 guard — also the cycle protection.
    */
  def closure(edges: DataFrame, maxDepth: Int = 500): DataFrame = {
    val e = edges.select(col("parent"), col("child"))
    val base = e.select(col("parent").as("ancestor"),
      col("child").as("descendant"), lit(1).as("depth"))
    var acc = base
    var frontier = base
    var depth = 1
    while (depth < maxDepth && !frontier.isEmpty) {
      val next = frontier.alias("f")
        .join(broadcast(e.alias("e")), col("f.descendant") === col("e.parent"))
        .select(col("f.ancestor").as("ancestor"),
          col("e.child").as("descendant"),
          (col("f.depth") + 1).as("depth"))
        .localCheckpoint(eager = true)
      frontier = next
      if (!next.isEmpty) acc = acc.unionByName(next)
      depth += 1
    }
    acc
  }

  /** Descendants of one root (inclusive of depth-1 children), i.e. the
    * `$$IsLedOfGrp` subtree-membership set (R14). */
  def subtree(edges: DataFrame, root: String, maxDepth: Int = 500): DataFrame =
    closure(edges, maxDepth).filter(col("ancestor") === root)
      .select(col("descendant")).distinct()
}
