package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Silver→Gold tumbling-window aggregations (SURVEY §2.4 A1-A4).
  *
  * Scale notes (100 TB):
  *  - All of these are single `groupBy().agg()` hash aggregations; Catalyst
  *    plans partial (map-side) + final aggregation automatically, so the
  *    shuffle carries pre-combined partial states, not raw rows.
  *  - `countDistinct` rewrites to expand+two-phase aggregate; where an
  *    approximate answer is acceptable at scale prefer
  *    `approx_count_distinct` (HLL, no expand) — both are offered.
  *  - Exact percentiles (`percentile`) buffer each group's values (an
  *    ObjectHashAggregate); that is fine for bounded groups (a sensor
  *    emits ≤300 rows per 5-min window) but for unbounded groups use the
  *    `approxPercentiles=true` variant (`percentile_approx`, a fixed-size
  *    KLL-style sketch) — the reference itself uses the approximate form
  *    (silver_to_gold.py:64-66).
  */
object Gold {

  private def nanToNull(c: Column): Column = when(isnan(c), lit(null)).otherwise(c)

  /** Shared stats block: avg/min/max/count/stddev + p50/p95/p99
    * (silver_to_gold.py:58-67). stddev is the sample stddev; a 1-row group
    * yields NULL (not NaN) for ANSI parity. */
  def statsAggs(valueCol: String, approxPercentiles: Boolean): Seq[Column] = {
    def pct(p: Double): Column =
      if (approxPercentiles) percentile_approx(col(valueCol), lit(p), lit(10000))
      else expr(s"percentile($valueCol, $p)")
    Seq(
      avg(col(valueCol)).as("avg_value"),
      min(col(valueCol)).as("min_value"),
      max(col(valueCol)).as("max_value"),
      count(lit(1)).as("reading_count"),
      nanToNull(stddev_samp(col(valueCol))).as("stddev_value"),
      pct(0.5).as("p50_value"),
      pct(0.95).as("p95_value"),
      pct(0.99).as("p99_value"))
  }

  /** A1: tumbling-window aggregation keyed by `groupCols` + a window over
    * `timeCol` (silver_to_gold.py:52-68). Returns window_start/window_end
    * flattened out of the window struct. */
  def windowAgg(df: DataFrame, groupCols: Seq[String], timeCol: String,
                valueCol: String, duration: String,
                approxPercentiles: Boolean = false,
                extraAggs: Seq[Column] = Nil): DataFrame = {
    val aggs = statsAggs(valueCol, approxPercentiles) ++ extraAggs
    df.groupBy(groupCols.map(col) :+ window(col(timeCol), duration): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** A2: derived sensor-health percentage — reading_count vs the expected
    * readings per window (silver_to_gold.py:69-75; can exceed 100). */
  def withHealthPct(df: DataFrame, expectedPerWindow: Int = 300): DataFrame =
    df.withColumn("sensor_health_pct",
      col("reading_count") * lit(100.0) / lit(expectedPerWindow))

  /** A3: hourly per-location aggregation with distinct-sensor count
    * (silver_to_gold.py:102-118). */
  def locationHourly(df: DataFrame, locationCol: String, typeCol: String,
                     timeCol: String, valueCol: String, idCol: String,
                     approxPercentiles: Boolean = false,
                     approxDistinct: Boolean = false): DataFrame = {
    val uniq =
      if (approxDistinct) approx_count_distinct(col(idCol)).as("unique_sensor_count")
      else countDistinct(col(idCol)).as("unique_sensor_count")
    windowAgg(df, Seq(locationCol, typeCol), timeCol, valueCol, "1 hour",
      approxPercentiles, Seq(uniq))
      .withColumnRenamed("window_start", "hour_start")
      .withColumnRenamed("window_end", "hour_end")
  }

  /** A4: daily summary per type — core stats + conditional anomaly count +
    * distinct sensors + a formatted date string
    * (silver_to_gold.py:144-161). */
  def dailySummary(df: DataFrame, typeCol: String, timeCol: String,
                   valueCol: String, idCol: String,
                   anomalyCol: String = "is_anomaly"): DataFrame =
    df.groupBy(to_date(col(timeCol)).as("date"), col(typeCol))
      .agg(
        avg(col(valueCol)).as("avg_value"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"),
        count(lit(1)).as("total_readings"),
        nanToNull(stddev_samp(col(valueCol))).as("stddev_value"),
        sum(when(col(anomalyCol), 1).otherwise(0)).as("anomaly_count"),
        countDistinct(col(idCol)).as("unique_sensor_count"))
      .withColumn("date_str", date_format(col("date"), "yyyy-MM-dd"))
}
