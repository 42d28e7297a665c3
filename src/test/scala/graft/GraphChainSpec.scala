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

  test("incremental CC: star compression + batch edges == full recompute") {
    def cc(edges: Seq[(Long, Long)]) =
      Graph.connectedComponents(edges.toDF("src", "dst"), "src", "dst")
    // history: {1,2,3}, {10,11}, {20,21} — three components
    val hist = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val assignments = cc(hist)
    // batch exercises every shape at once:
    //  (3,10)  merges {1,2,3} with {10,11}
    //  (21,22) extends {20,21} with a new node
    //  (30,31) creates a brand-new component
    //  (0,20)  new node with a SMALLER id than the old root → relabel
    val batch = Seq((3L, 10L), (21L, 22L), (30L, 31L), (0L, 20L))
    val incr = Graph.incrementalConnectedComponents(assignments,
        batch.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    val full = cc(hist ++ batch).as[(Long, Long)].collect().toMap
    assert(incr === full)
    assert(incr(11L) === 1L)  // merged cluster takes the global min id
    assert(incr(22L) === 0L)  // new smaller id relabels the whole cluster
    assert(incr(31L) === 30L) // brand-new component labels itself

    // a batch touching NOTHING passes every assignment through unchanged
    val untouched = Graph.incrementalConnectedComponents(assignments,
        Seq((100L, 101L)).toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(untouched === cc(hist).as[(Long, Long)].collect().toMap
      ++ Map(100L -> 100L, 101L -> 100L))

    // an empty batch is the identity
    val idty = Graph.incrementalConnectedComponents(assignments,
        Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(idty === cc(hist).as[(Long, Long)].collect().toMap)
  }
}
