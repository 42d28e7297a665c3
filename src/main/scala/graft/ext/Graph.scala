package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup pipelines. The one that matters
  * for training data: collapsing pairwise near-duplicate edges into
  * clusters so each cluster keeps exactly one representative document.
  *
  * Scale notes (100 TB): near-dup graphs are sparse (LSH emits O(n)
  * candidate edges) with small diameter (duplicate clusters are near-
  * cliques), which is exactly the regime where HashMin label propagation
  * converges in a handful of rounds. Each round is one join + one
  * hash-aggregation — all shuffles keyed on node id, no driver-side data
  * beyond a convergence counter. For adversarial long-chain graphs swap in
  * large-star/small-star (Kiveris et al.) which contracts paths
  * logarithmically; near-dup workloads don't need it.
  */
object Graph {

  /** Connected components by HashMin label propagation: every node starts
    * labeled with its own id; each round every node takes the minimum label
    * in its closed neighborhood; converged when no label changes. Returns
    * (id, cluster_id) where cluster_id is the minimum node id in the
    * component — deterministic for any edge order.
    *
    * `edges` is an undirected edge list (each pair once, either direction).
    * Isolated nodes don't appear (callers union them in if needed —
    * near-dup clustering only cares about nodes with at least one edge).
    *
    * Per-iteration lineage is truncated with localCheckpoint: an iterative
    * plan otherwise doubles in depth every round and the optimizer
    * re-analyzes the whole history each action. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .union(edges.select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // min label over the closed neighborhood: own label ∪ neighbors'.
      val fromNeighbors = sym.join(labels, sym("a") === labels("id"))
        .select(col("b").as("id"), col("label"))
      val next = labels.unionByName(fromNeighbors)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(true)
      changed = next.as("n")
        .join(labels.select(col("id"), col("label").as("old")), "id")
        .filter(col("label") =!= col("old"))
        .count()
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** Components plus per-cluster sizes — the direct input to "keep one doc
    * per cluster" retention policies. */
  def componentsWithSize(edges: DataFrame, srcCol: String, dstCol: String,
                         maxIter: Int = 20): DataFrame = {
    val comp = connectedComponents(edges, srcCol, dstCol, maxIter)
    val sizes = comp.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "cluster_id")
      .select(col("id"), col("cluster_id"), col("cluster_size"))
  }
}
