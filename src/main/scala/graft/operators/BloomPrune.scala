package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction.
  *
  * At 100 TB the dominant cost of a selective fact-to-dim join is
  * shuffling fact rows that the join will immediately discard. Spark's
  * runtime-filter rule injects exactly this optimization, but only under
  * its own heuristics (equi-join, creation-side selectivity, size
  * thresholds) and never across stages the optimizer can't see — e.g. a
  * probe side that feeds a multi-step pipeline (dedup, contamination
  * checks) before the join, or a build side computed by an iterative
  * loop. This operator is the explicit form: build one fixed-size bloom
  * sketch over the build-side keys with a distributed
  * `TypedImperativeAggregate` (partials merged by OR — one binary ever
  * reaches the driver, never the rows), then prefilter the probe side
  * with the codegen `might_contain` predicate BEFORE its shuffle.
  *
  * Exactness: a bloom filter has no false negatives, so the prefilter
  * never drops a matching row; the real join that follows removes the
  * false positives. Result ≡ plain join — the sketch is an execution
  * detail, verified by the `j_bloom_prefilter_join` oracle.
  */
object BloomPrune {

  /** Distributed bloom build over `key`: one `BloomFilterAggregate` whose
    * per-partition sketches merge associatively; the single merged binary
    * (≤ numBits/8 bytes, independent of row count) is collected like any
    * scalar aggregate. */
  def keyBloom(build: DataFrame, key: Column, expectedItems: Long,
               numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits))
    build.agg(column(agg.toAggregateExpression()).as("bloom"))
      .head().getAs[Array[Byte]]("bloom")
  }

  /** Codegen membership probe: `might_contain(bloom, xxhash64(key))`.
    * The sketch rides in the plan as a foldable literal (shipped once per
    * task with the serialized plan, like a broadcast of a small side). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    column(BloomFilterMightContain(
      Literal(bloom, BinaryType), expression(xxhash64(key))))

  /** Inner equi-join with the probe side bloom-prefiltered on the join
    * key. `expectedItems` sizes the sketch to the build side's distinct
    * keys (overshooting costs bits, undershooting costs false-positive
    * rate — never correctness). */
  def prefilteredJoin(probe: DataFrame, build: DataFrame,
                      probeKey: String, buildKey: String,
                      expectedItems: Long = 1000000L,
                      numBits: Long = 8388608L): DataFrame = {
    val bloom = keyBloom(build, col(buildKey), expectedItems, numBits)
    probe.filter(mightContain(bloom, col(probeKey)))
      .join(build, col(probeKey) === col(buildKey))
  }
}
