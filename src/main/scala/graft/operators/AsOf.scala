package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) lookups over time-ordered streams — the
  * time-series enrichment operator the reference's star schema implies
  * (fact rows joined to the dimension state in effect at event time).
  *
  * Two formulations, both pure compositions of built-ins (no custom
  * physical operator needed — a sort within the key partition gives the
  * same effect as a dedicated as-of join exec):
  *
  *  - `asofSelf`: within one stream, carry forward the last value
  *    matching a predicate (e.g. "the id of the most recent prior signup
  *    event for this user"). One window over (key, time) — a single
  *    shuffle+sort, linear scan per partition.
  *
  *  - `asofJoin`: classic two-table as-of. Union the right rows into the
  *    left's (key, time) timeline, carry the right values forward with a
  *    last-ignoring-nulls window, then keep the left rows. Cost: one
  *    shuffle of |L|+|R| — no range join, no per-row probing, and skew
  *    handling falls out of the window partitioning.
  */
object AsOf {

  /** Carry forward the last `valueCol` from rows satisfying `cond`,
    * looking at strictly-prior rows per key (rowsBetween(-inf, -1)). */
  def asofSelf(df: DataFrame, partitionKeys: Seq[String], order: Seq[Column],
               valueCol: Column, cond: Column, outCol: String): DataFrame = {
    val w = Window.partitionBy(partitionKeys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(outCol,
      last(when(cond, valueCol), ignoreNulls = true).over(w))
  }

  /** As-of join: for every left row, attach the most recent right row
    * (same `key`, right.time <= left.time). `rightVals` are the columns to
    * carry; they appear in the output with their right-side names. Ties on
    * time resolve right-row-first (the right value at exactly t is visible
    * to a left row at t). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightVals: Seq[String]): DataFrame = {
    val l = left.withColumn("_t", col(leftTime)).withColumn("_side", lit(1))
    val r = right.select((key +: rightVals).map(col) :+
        col(rightTime).as("_t"): _*)
      .withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col("_t").asc, col("_side").asc) // right row at t sorts first
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightVals.foldLeft(unioned) { (df, c) =>
      df.withColumn(c + "_asof",
        last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .drop((rightVals :+ "_t" :+ "_side"): _*)
  }
}
