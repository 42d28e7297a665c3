package graft

import graft.ext.Graph

/** Convergence shape of connected components on adversarial chain graphs —
  * pointer jumping must keep rounds logarithmic in the path length. */
class GraphChainSpec extends SparkTestBase {
  import spark.implicits._

  test("64-node path collapses to one component, logarithmic rounds") {
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("src", "dst")
    // smallGraphNodes = 0 forces the distributed loop — this test pins
    // ITS convergence, not the driver fast path's
    val comp = Graph.connectedComponents(edges, "src", "dst", maxIter = 40,
        smallGraphNodes = 0L)
      .as[(Long, Long)].collect().toMap
    assert(comp.size === 64)
    assert(comp.values.toSet === Set(1L))
  }

  test("driver union-find fast path equals the distributed fixpoint") {
    // several components, a chain, a clique, dup edges, both directions
    val edges = ((1L until 20L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (102L, 100L), (101L, 100L)) ++
      Seq((200L, 201L)) ++
      (300L until 310L).flatMap(i => (i + 1 to 309L).map(j => (i, j))))
      .toDF("src", "dst")
    val dist = Graph.connectedComponents(edges, "src", "dst", maxIter = 40,
        smallGraphNodes = 0L)
      .as[(Long, Long)].collect().toMap
    val fast = Graph.connectedComponents(edges, "src", "dst", maxIter = 40)
      .as[(Long, Long)].collect().toMap
    assert(fast === dist)
    assert(fast.values.toSet === Set(1L, 100L, 200L, 300L))
  }
}
