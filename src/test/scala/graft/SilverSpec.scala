package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.silver.Silver
import graft.model.Schemas

/** Ports the reference's silver-layer invariants (SURVEY §5.2):
  * keep-latest dedup, range flags, z-score guards, late-data merge. */
class SilverSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // Fixture A2 (FIXTURES.md): sensor-001@10:00 appears twice — value 22.5
  // ingested 10:00:01 and value 22.7 ingested 10:00:05.
  private def bronzeFixture = Seq(
    ("sensor-001", "temperature", 22.5, ts("2024-06-15 10:00:00"), ts("2024-06-15 10:00:01")),
    ("sensor-001", "temperature", 22.7, ts("2024-06-15 10:00:00"), ts("2024-06-15 10:00:05")),
    ("sensor-002", "humidity", 45.0, ts("2024-06-15 10:00:00"), ts("2024-06-15 10:00:01")),
    ("sensor-003", "pressure", 1013.0, ts("2024-06-15 10:00:00"), ts("2024-06-15 10:00:01")),
    ("sensor-004", "vibration", 0.5, ts("2024-06-15 10:00:00"), ts("2024-06-15 10:00:01"))
  ).toDF("sensor_id", "sensor_type", "value", "event_time", "ingestion_time")

  test("W1 dedup keeps exactly the max-ingestion_time row") {
    val out = Silver.dedupLatest(bronzeFixture, Seq("sensor_id", "event_time"),
      Seq(col("ingestion_time").desc, col("value").desc))
    assert(out.count() === 4)
    val kept = out.filter($"sensor_id" === "sensor-001").select("value").as[Double].head()
    assert(kept === 22.7)
  }

  test("W1 dedup is idempotent") {
    val once = Silver.dedupLatest(bronzeFixture, Seq("sensor_id", "event_time"),
      Seq(col("ingestion_time").desc, col("value").desc))
    val twice = Silver.dedupLatest(once, Seq("sensor_id", "event_time"),
      Seq(col("ingestion_time").desc, col("value").desc))
    assert(twice.count() === once.count())
  }

  test("P8 null filter drops rows missing required fields") {
    val df = Seq(
      (Some("s1"), Some(1.0)), (None, Some(2.0)), (Some("s3"), None)
    ).toDF("sensor_id", "value")
    assert(Silver.nullFilter(df, Seq("sensor_id", "value")).count() === 1)
  }

  test("P10 range flags match reference bounds") {
    // Anomalous fixture values (conftest.py:55-83): temp 75.0, humidity
    // 99.5, vibration 5.5 are out of silver ranges.
    val df = Seq(
      ("temperature", 75.0), ("humidity", 99.5), ("vibration", 5.5),
      ("temperature", 22.5), ("pressure", 1013.0), ("unknown", 9999.0)
    ).toDF("sensor_type", "value")
    val out = Silver.rangeAnomaly(df, "sensor_type", "value", Schemas.sensorValueRanges)
    val flags = out.select("sensor_type", "is_anomaly").as[(String, Boolean)].collect().toMap
    assert(flags("unknown") === false) // unknown types never flag
    assert(out.filter($"is_anomaly").count() === 3)
  }

  test("W2/W3 z-score: zero for degenerate stddev, flags spikes, ORs with existing flag") {
    val rows = (1 to 50).map(i => ("s1", i, 10.0)) :+ (("s1", 51, 1000.0))
    val df = rows.toDF("sensor_id", "seq", "value")
      .withColumn("is_anomaly", lit(false))
    val out = Silver.zscoreFlags(df, Seq("sensor_id"), Seq(col("seq").asc), "value")
    val first = out.filter($"seq" === 1).select("zscore").as[Double].head()
    assert(first === 0.0) // single-row frame → stddev null → z = 0
    val constant = out.filter($"seq" === 25).select("zscore").as[Double].head()
    assert(constant === 0.0) // zero variance → guard → 0
    assert(out.filter($"seq" === 51).select("is_anomaly").as[Boolean].head())
  }

  test("U1 late merge: later-ingested corrected value wins (invariant 5)") {
    val existing = bronzeFixture
    val late = Seq(
      ("sensor-002", "humidity", 47.5, ts("2024-06-15 10:00:00"), ts("2024-06-15 10:30:00"))
    ).toDF("sensor_id", "sensor_type", "value", "event_time", "ingestion_time")
    val merged = Silver.mergeLateData(existing, late, Seq("sensor_id", "event_time"),
      Seq(col("ingestion_time").desc, col("value").desc))
    assert(merged.count() === 4)
    val v = merged.filter($"sensor_id" === "sensor-002").select("value").as[Double].head()
    assert(v === 47.5)
  }

  test("P6 lineage columns with injected clock are deterministic") {
    val clock = ts("2024-06-15 12:00:00")
    val out = Silver.withLineage(bronzeFixture, "file.parquet", "1.2.0", Some(clock))
    assert(out.select("processing_timestamp").distinct().as[Timestamp].head() === clock)
    assert(out.select("pipeline_version").distinct().as[String].head() === "1.2.0")
  }
}
