package graft

import graft.operators.Hierarchy
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HierarchySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4-level chain + branch:  root → a → b → c ;  a → d
  private def edges = Seq(
    ("root", "a"), ("a", "b"), ("b", "c"), ("a", "d"))
    .toDF("parent", "child")

  test("closure finds all ancestor-descendant pairs with depth") {
    val c = Hierarchy.closure(edges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(c == Set(
      ("root", "a", 1), ("a", "b", 1), ("b", "c", 1), ("a", "d", 1),
      ("root", "b", 2), ("a", "c", 2), ("root", "d", 2),
      ("root", "c", 3)))
  }

  test("maxDepth caps traversal (cycle protection)") {
    val cyc = Seq(("x", "y"), ("y", "x")).toDF("parent", "child")
    val c = Hierarchy.closure(cyc, maxDepth = 5)
    assert(c.count() == 10)  // 2 paths per depth 1..5, loop stops at cap
  }

  test("subtree returns unique descendants of a root") {
    val d = Hierarchy.subtree(edges, "a").as[String].collect().toSet
    assert(d == Set("b", "c", "d"))
  }

  test("closure runs the bulk forest to depth >= 6 and matches a ground truth") {
    // round-12 verdict #7: the fixpoint loop was never oracle- or
    // spec-exercised past trivial depth. The bulk group forest (280
    // nodes, 40 chains under a depth-3 spine) forces ~10 frontier
    // iterations — each localCheckpoint'ed, so this is also the
    // severed-lineage path under real depth. Ground truth is the same
    // law closed in plain Scala.
    val g = graft.tally.TallyFixtures
      .df(spark, "mst_group", bulk = true)
      .select(col("parent"), col("name").as("child"))
      .filter(col("parent") =!= "")
    val got = Hierarchy.closure(g).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // pure-Scala closure over the identical edge law
    val parents: Map[String, String] = {
      val chains = graft.tally.TallyFixtures.BulkGroupChains
      val n = graft.tally.TallyFixtures.BulkGroups
      val hand = Map(
        "Advances" -> "Loans & Advances (Asset)",
        "Staff Advances" -> "Advances",
        "Field Advances" -> "Staff Advances",
        "Temp Advances" -> "Field Advances")
      hand ++ (0 until n).map(i => s"BG $i" ->
        (if (i < chains) "Staff Advances" else s"BG ${i - chains}"))
    }
    val expected = parents.keys.flatMap { node =>
      Iterator.iterate(Option(node))(_.flatMap(parents.get))
        .drop(1).takeWhile(_.isDefined).zipWithIndex
        .map { case (anc, d) => (anc.get, node, d + 1) }
    }.toSet
    assert(got == expected)
    assert(got.map(_._3).max >= 6,
      s"forest too shallow: max depth ${got.map(_._3).max}")
  }
}
