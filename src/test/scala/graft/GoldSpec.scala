package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.gold.Gold

/** Ports the reference's gold-layer invariants (SURVEY §5.2 #2,3,4,6). */
class GoldSpec extends SparkTestBase {
  import spark.implicits._

  private def minuteSeries(sensor: String, n: Int, base: Double) =
    (0 until n).map { i =>
      (sensor, "temperature", Timestamp.valueOf(f"2024-06-15 10:${i}%02d:00"),
        base + 0.1 * i, false)
    }

  test("invariant 2: 30 one-minute readings => 6 five-minute windows; first window stats") {
    val df = minuteSeries("s1", 30, 22.0)
      .toDF("sensor_id", "sensor_type", "event_time", "value", "is_anomaly")
    val out = Gold.windowAgg(df, Seq("sensor_id", "sensor_type"), "event_time",
      "value", "5 minutes")
    assert(out.count() === 6)
    val first = out.orderBy("window_start").head()
    assert(first.getAs[Long]("reading_count") === 5L)
    assert(first.getAs[Double]("min_value") === 22.0)
    assert(math.abs(first.getAs[Double]("max_value") - 22.4) < 1e-9)
    assert(math.abs(first.getAs[Double]("avg_value") - 22.2) < 1e-9)
  }

  test("invariant 3: 4 sensors x 30 minutes => 24 window groups of 5") {
    val df = (1 to 4).flatMap(k => minuteSeries(s"s$k", 30, 20.0 + k))
      .toDF("sensor_id", "sensor_type", "event_time", "value", "is_anomaly")
    val out = Gold.windowAgg(df, Seq("sensor_id", "sensor_type"), "event_time",
      "value", "5 minutes")
    assert(out.count() === 24)
    assert(out.filter($"reading_count" =!= 5).count() === 0)
  }

  test("invariant 4: daily anomaly_count = 1 per type when only minute 29 is anomalous") {
    val df = (1 to 4).flatMap { k =>
      minuteSeries(s"s$k", 30, 20.0).zipWithIndex.map { case ((id, t, ts, v, _), i) =>
        (id, s"type$k", ts, v, i == 29)
      }
    }.toDF("sensor_id", "sensor_type", "event_time", "value", "is_anomaly")
    val out = Gold.dailySummary(df, "sensor_type", "event_time", "value", "sensor_id")
    assert(out.count() === 4)
    assert(out.filter($"anomaly_count" =!= 1).count() === 0)
    assert(out.select("date_str").distinct().as[String].head() === "2024-06-15")
  }

  test("invariant 6: sum of gold reading_count equals silver row count") {
    val silver = Pipeline.silver(spark, "/root/testdata/sf0.001")
    val gold = Pipeline.gold5Min(spark, "/root/testdata/sf0.001")
    val silverRows = silver.count()
    val goldSum = gold.agg(sum("reading_count")).as[Long].head()
    assert(goldSum === silverRows)
  }

  test("A2 health pct can exceed 100 and scales with expected count") {
    val df = minuteSeries("s1", 5, 22.0)
      .toDF("sensor_id", "sensor_type", "event_time", "value", "is_anomaly")
    val out = Gold.withHealthPct(
      Gold.windowAgg(df, Seq("sensor_id"), "event_time", "value", "5 minutes"),
      expectedPerWindow = 2)
    assert(out.orderBy("window_start").select("sensor_health_pct").as[Double].head() === 250.0)
  }

  test("A3 hourly location carries unique_sensor_count") {
    val df = ((1 to 3).flatMap(k => minuteSeries(s"s$k", 30, 20.0)))
      .map { case (id, t, ts, v, a) => (id, t, "floor-1-zone-A", ts, v, a) }
      .toDF("sensor_id", "sensor_type", "location", "event_time", "value", "is_anomaly")
    val out = Gold.locationHourly(df, "location", "sensor_type", "event_time",
      "value", "sensor_id")
    assert(out.select("unique_sensor_count").as[Long].head() === 3L)
  }
}
