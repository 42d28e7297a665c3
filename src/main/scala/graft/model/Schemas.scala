package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Typed contract for one sensor reading at the ingest edge.
  * Mirrors the reference's fixed input schema
  * (reference: src/consumers/spark_streaming.py:26-33). */
final case class SensorReading(
    sensor_id: String,
    sensor_type: String,
    timestamp: String, // raw ISO-8601 as produced; cast to event_time downstream
    value: Double,
    unit: String,
    location: Option[String])

/** Bronze-layer row: the parsed reading plus ingest metadata
  * (reference: src/consumers/spark_streaming.py:129-139). */
final case class BronzeReading(
    sensor_id: String,
    sensor_type: String,
    value: Double,
    unit: String,
    location: Option[String],
    event_time: Timestamp,
    ingestion_time: Timestamp,
    kafka_timestamp: Option[Timestamp])

object Schemas {
  /** Fixed JSON event schema; schema inference is intentionally disabled at
    * the ingest edge — parse-or-dead-letter (SURVEY §1.2). */
  val sensorSchema: StructType = StructType(Seq(
    StructField("sensor_id", StringType, nullable = false),
    StructField("sensor_type", StringType, nullable = false),
    StructField("timestamp", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("unit", StringType, nullable = false),
    StructField("location", StringType, nullable = true)))

  /** Value ranges used for static range-based anomaly flags on the sensor
    * model (reference: src/transformations/bronze_to_silver.py:32-37). */
  val sensorValueRanges: Map[String, (Double, Double)] = Map(
    "temperature" -> (-20.0, 60.0),
    "humidity" -> (5.0, 95.0),
    "pressure" -> (950.0, 1070.0),
    "vibration" -> (0.0, 2.0))

  /** Wider "physically possible" ranges used by the data-quality layer
    * (reference: src/quality/expectations.py:21-26). */
  val sensorPhysicalRanges: Map[String, (Double, Double)] = Map(
    "temperature" -> (-50.0, 150.0),
    "humidity" -> (0.0, 100.0),
    "pressure" -> (300.0, 1100.0),
    "vibration" -> (0.0, 10.0))

  /** Range flags for the driver testdata `events` table (event_type plays
    * the sensor_type role — FIXTURES.md §B). Bounds chosen so a small,
    * stable fraction of rows flag as anomalous. */
  val eventValueRanges: Map[String, (Double, Double)] = Map(
    "click" -> (0.0, 400.0),
    "view" -> (0.0, 300.0),
    "purchase" -> (0.0, 320.0),
    "signup" -> (0.0, 300.0),
    "error" -> (0.0, 300.0))

  /** Wider "physically possible" bounds for the events table (quality
    * layer analogue of sensorPhysicalRanges). */
  val eventPhysicalRanges: Map[String, (Double, Double)] =
    Seq("click", "view", "purchase", "signup", "error")
      .map(_ -> (0.0, 350.0)).toMap
}

/** Loaders for the driver-generated testdata (TESTDATA.md). One parquet file
  * per table; at cluster scale these would be partitioned directories and
  * the same `spark.read.parquet(dir)` call partition-prunes. */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is TIMESTAMP(NANOS) in parquet; with nanosAsLong it arrives
    * as long nanos — normalize to a micros TimestampType (floor division,
    * identical to DuckDB's nanos→micros conversion). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Adapt the generic `events` stream table to the sensor-reading column
    * contract so every medallion operator runs unchanged on it
    * (FIXTURES.md §B mapping: user_id→sensor_id, ts→event_time,
    * event_type→sensor_type). `ingestion_time` is synthesized
    * deterministically from event_id so keep-latest dedup is testable. */
  def eventsAsReadings(events: DataFrame): DataFrame =
    events.select(
      col("user_id").cast(StringType).as("sensor_id"),
      col("event_type").as("sensor_type"),
      col("ts").cast(TimestampType).as("event_time"),
      col("value"),
      // coalesce to a fixed sentinel: Spark's concat returns NULL on a null
      // arg while DuckDB's CONCAT skips nulls — guard both sides identically
      // (the oracle zoneSql carries the same COALESCE) so malformed props
      // can't diverge.
      concat(lit("zone-"),
        coalesce((get_json_object(col("props"), "$.k").cast("int") % 4)
          .cast(StringType), lit("na"))).as("location"),
      col("event_id"))
}
