package graft

import org.apache.spark.sql.functions._
import graft.bench.EventGenerator

/** Producer-semantics parity (SURVEY §2.13): bounds, fleet layout,
  * determinism, anomaly rate, and the reference's window invariant over
  * generated data. */
class EventGeneratorSpec extends SparkTestBase {
  import spark.implicits._

  private def gen = EventGenerator.events(spark, nSensors = 40, ticks = 60)

  test("values respect per-type physical bounds after clamp+round") {
    val viol = gen.join(
        EventGenerator.profiles.map(p => (p.sensorType, p.lo, p.hi))
          .toDF("sensor_type", "lo", "hi"), Seq("sensor_type"))
      .filter(col("value") < col("lo") || col("value") > col("hi"))
      .count()
    assert(viol === 0)
  }

  test("fleet layout: round-robin types, sensor-%03d ids, floor/zone grid") {
    val rows = gen.select("sensor_id", "sensor_type", "location").distinct()
      .as[(String, String, String)].collect()
    assert(rows.length === 40)
    assert(rows.forall(_._1.matches("sensor-\\d{3}")))
    assert(rows.forall(_._3.matches("floor-[1-5]-zone-[A-D]")))
    val s1 = rows.find(_._1 == "sensor-001").get
    assert(s1._2 === "humidity") // idx 1 -> second profile
    // each of the 4 types appears on 10 of 40 sensors
    val byType = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byType.values.toSet === Set(10))
  }

  test("same seed is bit-identical; different seed diverges") {
    val a = EventGenerator.events(spark, 10, 20, seed = 7L)
    val b = EventGenerator.events(spark, 10, 20, seed = 7L)
    val c = EventGenerator.events(spark, 10, 20, seed = 8L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(!c.exceptAll(a).isEmpty)
  }

  test("anomaly injection rate lands near the configured 2%") {
    val big = EventGenerator.events(spark, 50, 400)
    val rate = big.filter(col("is_injected")).count().toDouble / big.count()
    assert(rate > 0.01 && rate < 0.03, s"rate $rate")
  }

  test("reference window invariant: 30 one-minute readings -> 6 five-minute windows") {
    // one sensor, one reading per minute for 30 minutes (invariant 2,
    // test_transformations.py:114-135)
    val one = EventGenerator.events(spark, 1, 30, intervalSeconds = 60L)
    val windows = gold.Gold.windowAgg(one, Seq("sensor_id"), "event_time",
      "value", "5 minutes")
    assert(windows.count() === 6)
    assert(windows.agg(sum("reading_count")).head().getLong(0) === 30L)
  }
}
