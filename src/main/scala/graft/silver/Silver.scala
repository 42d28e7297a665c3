package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bronze→Silver operators: cleaning, deduplication, anomaly flagging,
  * lineage, late-data merge (SURVEY §2.2/§2.5/§2.7).
  *
  * Scale notes (100 TB):
  *  - `dedupLatest` and `zscoreFlags` shuffle-by-key once on the partition
  *    columns; both windows over the SAME partitioning key reuse one
  *    exchange (Catalyst `ReuseExchange` / EnsureRequirements), so chaining
  *    dedup→zscore on sensor_id costs a single shuffle.
  *  - Hot keys (one sensor emitting a large share of traffic) skew a
  *    `partitionBy(sensor_id)` window; AQE cannot split a window partition,
  *    so for known-skewed streams pre-split by a time bucket:
  *    partition (sensor_id, to_date(event_time)) bounds any one task by a
  *    day of one sensor while preserving rolling-window semantics within
  *    the day (cross-day frames then need a small overlap pass).
  *  - All flags are expressed as codegen'd Column expressions (no UDFs), so
  *    the whole silver stage stays inside WholeStageCodegen between
  *    exchanges.
  */
object Silver {

  /** Keep-latest deduplication: for each key keep exactly one row, the first
    * under `order` (reference semantics "latest ingestion wins",
    * bronze_to_silver.py:40-52; W1). Pass a total order (e.g. ingestion
    * time DESC then a unique id DESC) to make ties deterministic —
    * the reference is nondeterministic on exact ties (SURVEY §7.4). */
  def dedupLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Reject rows with nulls in required columns (P8,
    * bronze_to_silver.py:118-124). */
  def nullFilter(df: DataFrame, required: Seq[String]): DataFrame =
    df.na.drop("any", required)

  /** Static per-type range anomaly flag (P10, bronze_to_silver.py:55-69):
    * is_anomaly := OR over (type == t AND (value < lo OR value > hi)),
    * false for unknown types and null values. */
  def rangeFlag(typeCol: Column, valueCol: Column,
                ranges: Map[String, (Double, Double)]): Column = {
    val cond = ranges.toSeq.sortBy(_._1).foldLeft(lit(false)) {
      case (acc, (t, (lo, hi))) =>
        acc || (typeCol === lit(t) && (valueCol < lo || valueCol > hi))
    }
    coalesce(cond, lit(false))
  }

  def rangeAnomaly(df: DataFrame, typeCol: String, valueCol: String,
                   ranges: Map[String, (Double, Double)],
                   flagCol: String = "is_anomaly"): DataFrame =
    df.withColumn(flagCol, rangeFlag(col(typeCol), col(valueCol), ranges))

  /** Rolling z-score anomaly detection (W2/W3,
    * bronze_to_silver.py:72-115): per partition key, over a frame of the
    * previous `lookback` rows plus the current one ordered by `order`,
    * z = |value - avg| / stddev (0 when stddev is null/<=0); merges
    * `z > threshold` into an existing boolean flag column with OR.
    * Adds columns: rolling_avg, rolling_std, zscore and OR-merges flagCol.
    * Pass a total order (time + unique id) for deterministic frames. */
  def zscoreFlags(df: DataFrame, partitionKeys: Seq[String], order: Seq[Column],
                  valueCol: String, lookback: Int = 100, threshold: Double = 3.0,
                  flagCol: String = "is_anomaly"): DataFrame = {
    val w = Window.partitionBy(partitionKeys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(-lookback, Window.currentRow)
    val rollAvg = avg(col(valueCol)).over(w)
    // stddev_samp of a 1-row frame is NaN in Spark but NULL in ANSI
    // engines; normalize to NULL so the guard below (and oracle SQL
    // parity) behaves identically.
    val rollStdRaw = stddev_samp(col(valueCol)).over(w)
    val rollStd = when(isnan(rollStdRaw), lit(null)).otherwise(rollStdRaw)
    val withRoll = df
      .withColumn("rolling_avg", rollAvg)
      .withColumn("rolling_std", rollStd)
    val z = when(col("rolling_std").isNull || col("rolling_std") <= 0.0, lit(0.0))
      .otherwise(abs((col(valueCol) - col("rolling_avg")) / col("rolling_std")))
    val base = if (withRoll.columns.contains(flagCol)) col(flagCol) else lit(false)
    withRoll
      .withColumn("zscore", z)
      .withColumn(flagCol,
        when(coalesce(base, lit(false)) || col("zscore") > threshold, lit(true))
          .otherwise(lit(false)))
  }

  /** Lineage columns (P6, bronze_to_silver.py:137-142,204). The clock is
    * injected so golden tests and the oracle stay deterministic
    * (SURVEY §7.4). */
  def withLineage(df: DataFrame, sourceFile: String, pipelineVersion: String,
                  clock: Option[java.sql.Timestamp] = None): DataFrame = {
    val now = clock.map(lit(_)).getOrElse(current_timestamp())
    df.withColumn("source_file", lit(sourceFile))
      .withColumn("processing_timestamp", now)
      .withColumn("pipeline_version", lit(pipelineVersion))
      .withColumn("ingestion_timestamp", now)
  }

  /** Late-data merge (U1, bronze_to_silver.py:145-159): union the fresh
    * batch with the existing silver rows by name (tolerating missing
    * columns on either side) and re-deduplicate so the row with the newest
    * ingestion order wins. */
  def mergeLateData(existing: DataFrame, fresh: DataFrame, keys: Seq[String],
                    order: Seq[Column]): DataFrame =
    dedupLatest(existing.unionByName(fresh, allowMissingColumns = true), keys, order)
}
