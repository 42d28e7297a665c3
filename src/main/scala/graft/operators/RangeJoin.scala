package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-overlap) joins, bucketized into equi-joins.
  *
  * A join whose ONLY predicate is a range test (`t >= start AND t < end`)
  * has no equi-key, so Spark plans it as BroadcastNestedLoopJoin — every
  * point row probed against every interval: |P|·|I| comparisons, a
  * driver-killing broadcast when neither side is small, and the classic
  * silent scale cliff of time-series enrichment jobs. Bucketizing
  * restores an equi-key: slice the axis into fixed-width buckets,
  * replicate each interval to the buckets it covers (ceil(len/width)
  * copies — bounded by construction when callers pick width near the
  * typical interval length), map each point to its single bucket, then
  * hash/sort-merge join on the bucket id and re-check the exact range
  * predicate. Cost: one shuffle of |P| + |I|·avg_buckets rows — the same
  * shape as any other equi-join, AQE/skew handling included.
  *
  * Both operators take a LONG axis (days, epoch seconds, …): callers cast
  * dates/timestamps down, which keeps bucket arithmetic exact and
  * engine-portable. Empty intervals (end <= start) match nothing.
  */
object RangeJoin {

  private def bucketsFor(start: Column, end: Column, width: Long): Column =
    // [start, end) covers floor(start/w) .. floor((end-1)/w); the guard
    // keeps sequence() from generating a DESCENDING range for an empty
    // interval (Spark's sequence(5,3) yields [5,4,3], not [])
    sequence(floor(start / width).cast("long"),
      floor((end - 1) / width).cast("long"))

  /** Inner-join point rows to the interval rows containing them
    * (`points.pointCol` in `[intervals.startCol, intervals.endCol)`).
    * Output: all point columns + all interval columns, one row per
    * (point, containing interval) pair. `bucketWidth` trades replication
    * (intervals copy to ceil(len/width) buckets) against per-bucket
    * probe selectivity; the typical interval length is the right order
    * of magnitude. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(Set(pointCol, startCol, endCol).size == 3,
      "pointCol/startCol/endCol must be three distinct column names")
    // distinct internal names on the two sides: df("col")-style
    // disambiguation is unreliable when both inputs derive from the same
    // base table (the classic self-join resolution trap)
    val ib = intervals.filter(col(endCol) > col(startCol))
      .withColumn("_ib",
        explode(bucketsFor(col(startCol), col(endCol), bucketWidth)))
    val pb = points
      .withColumn("_pb", floor(col(pointCol) / bucketWidth).cast("long"))
    pb.join(ib,
        col("_pb") === col("_ib") &&
          col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_pb", "_ib")
  }

  /** Inner-join two interval tables on overlap:
    * `[ls, le) ∩ [rs, re) ≠ ∅` i.e. `ls < re AND rs < le`. Both sides
    * replicate to their covered buckets; a pair sharing several buckets
    * is emitted exactly once by keeping only the bucket that contains
    * `max(ls, rs)` — the first bucket the two coverage sets share, a
    * per-row predicate (no post-join distinct over the pair blowup). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          leftStart: String, leftEnd: String,
                          rightStart: String, rightEnd: String,
                          bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(Set(leftStart, leftEnd, rightStart, rightEnd).size == 4,
      "the four bound columns must have distinct names")
    val lb = left.filter(col(leftEnd) > col(leftStart))
      .withColumn("_lgb",
        explode(bucketsFor(col(leftStart), col(leftEnd), bucketWidth)))
    val rb = right.filter(col(rightEnd) > col(rightStart))
      .withColumn("_rgb",
        explode(bucketsFor(col(rightStart), col(rightEnd), bucketWidth)))
    lb.join(rb,
        col("_lgb") === col("_rgb") &&
          col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd) &&
          col("_lgb") === floor(greatest(col(leftStart), col(rightStart)) /
            bucketWidth).cast("long"))
      .drop("_lgb", "_rgb")
  }
}
