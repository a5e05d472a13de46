package graft.resolver

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Incremental decide ([[Resolver.addEdges]]): folding a new edge batch
  * into stored components must equal a full re-cluster of the union
  * edge set, label for label — across every batch shape: cluster-merge,
  * new-vertex attach, isolated new pair, intra-cluster no-op edge, and
  * a chain that merges three clusters transitively through new nodes.
  */
class AddEdgesSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  private def check(base: Seq[(String, String)],
      delta: Seq[(String, String)]): Unit = {
    val cc = Resolver.connectedComponents(base.toDF("src", "dst"))
    val got = asMap(Resolver.addEdges(cc, delta.toDF("src", "dst")))
    val want = asMap(Resolver.connectedComponents(
      (base ++ delta).toDF("src", "dst")))
    assert(got === want)
  }

  val base = Seq("b" -> "c", "c" -> "d", // cluster b
    "f" -> "g", // cluster f
    "x" -> "y") // cluster x

  test("merging two stored clusters relabels both to the joint min") {
    check(base, Seq("d" -> "g"))
  }

  test("a new vertex attaching to a cluster keeps or takes the label") {
    check(base, Seq("e" -> "f")) // new e < f: cluster relabels to e
    check(base, Seq("z" -> "x")) // new z > x: z joins cluster x
  }

  test("an isolated new pair forms its own cluster") {
    check(base, Seq("p" -> "q"))
  }

  test("an intra-cluster edge is a no-op") {
    check(base, Seq("b" -> "d"))
  }

  test("a delta chain merges three clusters through new vertices") {
    check(base, Seq("c" -> "n1", "n1" -> "g", "g" -> "n2", "n2" -> "y",
      "a" -> "b")) // and 'a' becomes the global min label of the merge
  }

  test("an all-no-op batch returns the stored state unchanged") {
    val cc = Resolver.connectedComponents(base.toDF("src", "dst"))
    val got = asMap(Resolver.addEdges(cc,
      Seq("b" -> "c", "x" -> "y").toDF("src", "dst")))
    assert(got === asMap(cc))
  }
}
