package graft

import graft.ext.Graph

/** Convergence shape of connected components on adversarial chain graphs —
  * pointer jumping must keep rounds logarithmic in the path length. */
class GraphChainSpec extends SparkTestBase {
  import spark.implicits._

  test("64-node path collapses to one component, logarithmic rounds") {
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("src", "dst")
    val comp = Graph.connectedComponents(edges, "src", "dst", maxIter = 40)
      .as[(Long, Long)].collect().toMap
    assert(comp.size === 64)
    assert(comp.values.toSet === Set(1L))
  }
}
