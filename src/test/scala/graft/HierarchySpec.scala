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
}
