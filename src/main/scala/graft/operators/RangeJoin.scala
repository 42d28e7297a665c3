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
    // Output-schema contract: all point columns + all interval columns,
    // bound columns under their caller-given names. A bound name that
    // ALSO exists on the other side (the shared-base-table case: points
    // carrying its own `start` payload column) would make the rename-back
    // emit two identically named columns — the join would succeed and
    // every downstream col(name) would then throw ambiguity. Fail loudly
    // at the call site instead; non-bound names shared by both sides
    // follow ordinary Spark join duplicate semantics (caller's contract).
    require(!points.columns.contains(startCol) &&
        !points.columns.contains(endCol),
      s"points already carries a column named '$startCol' or '$endCol': " +
        "the output would hold two identically named columns; rename the " +
        "points column before the join")
    require(!intervals.columns.contains(pointCol),
      s"intervals already carries a column named '$pointCol': the output " +
        "would hold two identically named columns; rename the intervals " +
        "column before the join")
    // Rename the bound columns to side-unique internal names BEFORE the
    // join: df("col")-style disambiguation is unreliable when both inputs
    // derive from the same base table (the classic self-join resolution
    // trap), and an unqualified col(startCol) would be ambiguous the
    // moment `points` happens to carry a column of the same name. With
    // internal names every predicate reference resolves to exactly one
    // side regardless of what else the two schemas share.
    val pb = points.withColumnRenamed(pointCol, "_graft_rj_p")
      .withColumn("_pb", floor(col("_graft_rj_p") / bucketWidth).cast("long"))
    val ib = intervals.withColumnRenamed(startCol, "_graft_rj_s")
      .withColumnRenamed(endCol, "_graft_rj_e")
      .filter(col("_graft_rj_e") > col("_graft_rj_s"))
      .withColumn("_ib",
        explode(bucketsFor(col("_graft_rj_s"), col("_graft_rj_e"), bucketWidth)))
    pb.join(ib,
        col("_pb") === col("_ib") &&
          col("_graft_rj_p") >= col("_graft_rj_s") &&
          col("_graft_rj_p") < col("_graft_rj_e"))
      .drop("_pb", "_ib")
      .withColumnRenamed("_graft_rj_p", pointCol)
      .withColumnRenamed("_graft_rj_s", startCol)
      .withColumnRenamed("_graft_rj_e", endCol)
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
    // Same output-schema contract as pointInInterval: each side's bound
    // names must be absent from the OTHER side, or the rename-back would
    // emit duplicate column names (see the collision note there).
    require(!left.columns.contains(rightStart) &&
        !left.columns.contains(rightEnd),
      s"left already carries a column named '$rightStart' or '$rightEnd': " +
        "the output would hold two identically named columns; rename it " +
        "before the join")
    require(!right.columns.contains(leftStart) &&
        !right.columns.contains(leftEnd),
      s"right already carries a column named '$leftStart' or '$leftEnd': " +
        "the output would hold two identically named columns; rename it " +
        "before the join")
    // Same internal-rename discipline as pointInInterval: the overlap
    // predicate must stay unambiguous even when the two inputs share
    // other column names (both deriving from one base table is the
    // common case for overlap joins).
    val lb = left.withColumnRenamed(leftStart, "_graft_rj_ls")
      .withColumnRenamed(leftEnd, "_graft_rj_le")
      .filter(col("_graft_rj_le") > col("_graft_rj_ls"))
      .withColumn("_lgb",
        explode(bucketsFor(col("_graft_rj_ls"), col("_graft_rj_le"), bucketWidth)))
    val rb = right.withColumnRenamed(rightStart, "_graft_rj_rs")
      .withColumnRenamed(rightEnd, "_graft_rj_re")
      .filter(col("_graft_rj_re") > col("_graft_rj_rs"))
      .withColumn("_rgb",
        explode(bucketsFor(col("_graft_rj_rs"), col("_graft_rj_re"), bucketWidth)))
    lb.join(rb,
        col("_lgb") === col("_rgb") &&
          col("_graft_rj_ls") < col("_graft_rj_re") &&
          col("_graft_rj_rs") < col("_graft_rj_le") &&
          col("_lgb") === floor(greatest(col("_graft_rj_ls"), col("_graft_rj_rs")) /
            bucketWidth).cast("long"))
      .drop("_lgb", "_rgb")
      .withColumnRenamed("_graft_rj_ls", leftStart)
      .withColumnRenamed("_graft_rj_le", leftEnd)
      .withColumnRenamed("_graft_rj_rs", rightStart)
      .withColumnRenamed("_graft_rj_re", rightEnd)
  }
}
