package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization (gaps-and-islands): group a per-key event stream into
  * sessions separated by inactivity gaps longer than `gapSeconds`.
  *
  * Built from ranking windows rather than Spark's `session_window` so the
  * semantics are engine-portable (the DuckDB oracle runs the identical
  * lag/sum-over formulation) and the session INDEX is stable: the i-th
  * session of a key is `i`, independent of absolute timestamps.
  *
  * Scale notes (100 TB): one shuffle on the session keys, then two
  * sort-window passes over each partition — the same cost profile as the
  * keep-latest dedup (W1). Key skew (one user with millions of events)
  * is the thing to watch; the window sort is O(n log n) per key.
  */
object Sessionize {

  /** Adds `session_idx` (1-based per key): a new session starts at the
    * first event and whenever the gap from the previous event exceeds
    * `gapSeconds`. `orderCols` must be a total order (tie-break!) for
    * deterministic lag(). */
  def assign(df: DataFrame, keys: Seq[String], timeCol: String,
             orderCols: Seq[Column], gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    val us = unix_micros(col(timeCol))
    val prevUs = lag(us, 1).over(w)
    val newSession = when(prevUs.isNull || us - prevUs > gapSeconds * 1000000L,
      lit(1)).otherwise(lit(0))
    df.withColumn("_new_s", newSession)
      .withColumn("session_idx",
        sum(col("_new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_new_s")
  }

  /** Per-session rollup: event count, first/last event time, duration in
    * microseconds (integral — no float drift across engines). */
  def sessionAgg(df: DataFrame, keys: Seq[String], timeCol: String,
                 orderCols: Seq[Column], gapSeconds: Long): DataFrame =
    assign(df, keys, timeCol, orderCols, gapSeconds)
      .groupBy((keys :+ "session_idx").map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"))
      .withColumn("duration_us",
        unix_micros(col("session_end")) - unix_micros(col("session_start")))
}
