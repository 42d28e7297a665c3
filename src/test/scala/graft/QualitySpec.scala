package graft

import graft.quality.Quality
import graft.model.Schemas

/** Ports the reference's quality invariants (SURVEY §5.2 #7). */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("null-rate > 1% fails, <= 1% passes") {
    val bad = (1 to 98).map(i => (s"s$i", Some(1.0))) ++ Seq(("x", None), ("y", None))
    val df = bad.toDF("sensor_id", "value")
    val res = Quality.run(df, Quality.nullRate(Seq("value"), 0.01))
    assert(res.find(_.check == "null_rate_value").get.failed === 1L)
    val ok = (1 to 99).map(i => (s"s$i", Some(1.0))) :+ (("x", None))
    val res2 = Quality.run(ok.toDF("sensor_id", "value"),
      Quality.nullRate(Seq("value"), 0.01))
    assert(res2.find(_.check == "null_rate_value").get.failed === 0L)
  }

  test("unknown sensor_type fails domain check") {
    val df = Seq("temperature", "humidity", "plasma").toDF("sensor_type")
    val res = Quality.run(df, Seq(
      Quality.inSet("sensor_type", Seq("temperature", "humidity", "pressure", "vibration"))))
    assert(res.find(_.check == "domain_sensor_type").get.failed === 1L)
  }

  test("physical range violations are counted per type") {
    val df = Seq(("temperature", 200.0), ("temperature", 20.0), ("vibration", 11.0))
      .toDF("sensor_type", "value")
    val res = Quality.run(df, Seq(
      Quality.perTypeRange("sensor_type", "value", Schemas.sensorPhysicalRanges)))
    assert(res.find(_.check == "physical_range").get.failed === 2L)
  }

  test("duplicate (sensor_id, event_time) pairs fail uniqueness") {
    val df = Seq(("s1", "t1"), ("s1", "t1"), ("s2", "t1")).toDF("sensor_id", "event_time")
    assert(Quality.uniqueKey(df, Seq("sensor_id", "event_time")) === 1L)
  }

  test("row ratio outside [0.95, 1.05] fails") {
    val up = (1 to 100).toDF("x")
    val down = (1 to 90).toDF("x")
    assert(Quality.rowRatio(up, down, 0.95, 1.05).failed === 1L)
    assert(Quality.rowRatio(up, (1 to 97).toDF("x"), 0.95, 1.05).failed === 0L)
  }

  test("enforce throws on any failure (Q10 fail-fast contract)") {
    val results = Seq(Quality.CheckResult("ok", 0, 0), Quality.CheckResult("bad", 3, 3))
    val e = intercept[IllegalStateException](Quality.enforce(results))
    assert(e.getMessage.contains("bad"))
    Quality.enforce(Seq(Quality.CheckResult("ok", 0, 0))) // no throw
  }
}
