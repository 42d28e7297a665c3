package graft

import graft.quality.Quality
import graft.model.Schemas

/** Ports the reference's quality invariants (SURVEY §5.2 #7). */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("schemaDiff classifies added/dropped/type-changed/ok; breaking subset filters") {
    val expected = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val observed = Seq((1, "a", true)).toDF("id", "extra", "score")
    val d = Quality.schemaDiff(expected, observed).map(x => x._1 -> x._2).toMap
    assert(d("id") === "type_changed")   // bigint -> int
    assert(d("name") === "dropped")
    assert(d("score") === "type_changed") // double -> boolean
    assert(d("extra") === "added")
    val breaking = Quality.breakingSchemaChanges(expected, observed).map(_._1).toSet
    assert(breaking === Set("id", "name", "score")) // additions tolerated
    assert(Quality.breakingSchemaChanges(expected, expected).isEmpty)
  }

  test("profile emits per-column metrics; nulls and types handled") {
    val df = Seq(
      (Some(1L), Some("ab"), Some(2.0)),
      (Some(2L), None, Some(4.0)),
      (None, Some("abcd"), None))
      .toDF("id", "s", "v")
    val m = graft.quality.Profile.profile(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("_table", "n_rows")) === 3.0)
    assert(m(("id", "n_null")) === 1.0)
    assert(m(("id", "n_distinct")) === 2.0)
    assert(m(("id", "min")) === 1.0 && m(("id", "max")) === 2.0)
    assert(m(("s", "min_len")) === 2.0 && m(("s", "max_len")) === 4.0)
    assert(m(("s", "avg_len")) === 3.0)
    assert(m(("v", "avg")) === 3.0)
    // approx mode keeps the same shape (scale path: no expand)
    val approx = graft.quality.Profile.profile(df, exactDistinct = false)
    assert(approx.count() === m.size)
  }

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

  private val geDir = "/root/reference/great_expectations/expectations"

  test("GE JSON bronze suite: conforming data passes, seeded violations hit the right checks") {
    assume(new java.io.File(s"$geDir/sensor_bronze.json").exists())
    import java.sql.Timestamp
    def row(i: Int) = (f"sensor-$i%03d", "temperature",
      Timestamp.valueOf(s"2024-01-01 00:0${i % 10}:00"), Option(20.0 + i),
      "celsius", Option("zone-1"))
    val good = (0 until 200).map(row)
      .toDF("sensor_id", "sensor_type", "timestamp", "value", "unit", "location")
    val (name, res) = graft.quality.GeSuite.run(good, s"$geDir/sensor_bronze.json")
    assert(name === "sensor_bronze")
    assert(res.filter(_.failed > 0).isEmpty,
      s"conforming data failed: ${res.filter(_.failed > 0)}")
    Quality.enforce(res) // fail-fast contract holds on green

    // Seed violations: a bad id pattern, an out-of-range value, an unknown
    // type, and >1% nulls in location (mostly=0.99 budget blown).
    val bad = (0 until 200).map(row)
      .updated(0, ("SENSOR_X", "temperature",
        Timestamp.valueOf("2024-01-01 00:00:00"), Option(20.0), "celsius", Option("z")))
      .updated(1, (f"sensor-001", "plasma",
        Timestamp.valueOf("2024-01-01 00:01:00"), Option(2000.0), "celsius", Option("z")))
      .zipWithIndex.map { case (r, i) => if (i >= 2 && i < 8) r.copy(_6 = None) else r }
      .toDF("sensor_id", "sensor_type", "timestamp", "value", "unit", "location")
    val (_, res2) = graft.quality.GeSuite.run(bad, s"$geDir/sensor_bronze.json")
    def failed(check: String): Long = res2.find(_.check == check).get.failed
    assert(failed("ge_regex_sensor_id") === 1L)
    assert(failed("ge_between_value") === 1L)
    assert(failed("ge_in_set_sensor_type") === 1L)
    assert(failed("ge_not_null_location") === 1L) // 6/200 = 3% > 1% budget → verdict 1
    assert(failed("ge_not_null_sensor_id") === 0L)
    intercept[IllegalStateException](Quality.enforce(res2))
  }

  test("GE JSON silver suite: compound uniqueness and missing columns surface as failures") {
    assume(new java.io.File(s"$geDir/sensor_silver.json").exists())
    import java.sql.Timestamp
    val silver = Seq(
      ("s1", "temperature", Timestamp.valueOf("2024-01-01 00:00:00"), 1.0, false,
        Timestamp.valueOf("2024-01-01 00:00:05")),
      ("s1", "temperature", Timestamp.valueOf("2024-01-01 00:00:00"), 2.0, true,
        Timestamp.valueOf("2024-01-01 00:00:06")), // dup (sensor_id, event_time)
      ("s2", "humidity", Timestamp.valueOf("2024-01-01 00:01:00"), 3.0, false,
        Timestamp.valueOf("2024-01-01 00:01:05"))
    ).toDF("sensor_id", "sensor_type", "event_time", "value", "is_anomaly",
      "ingestion_timestamp")
    val (name, res) = graft.quality.GeSuite.run(silver, s"$geDir/sensor_silver.json")
    assert(name === "sensor_silver")
    def failed(check: String): Long = res.find(_.check == check).get.failed
    assert(failed("ge_unique_sensor_id_event_time") === 1L) // one extra row
    assert(failed("ge_in_set_is_anomaly") === 0L) // boolean value_set resolves
    assert(failed("ge_in_set_sensor_type") === 0L)
    // a df missing a contracted column: the exists check (and the dependent
    // row check) fail without breaking analysis
    val noAnomaly = silver.drop("is_anomaly")
    val (_, res3) = graft.quality.GeSuite.run(noAnomaly, s"$geDir/sensor_silver.json")
    def failed3(check: String): Long = res3.find(_.check == check).get.failed
    assert(failed3("ge_exists_is_anomaly") === 1L)
    assert(failed3("ge_in_set_is_anomaly") === 1L)
    assert(failed3("ge_exists_sensor_id") === 0L)
  }

  test("profile: per-column rows/nulls/distinct and typed bounds in one pass") {
    import spark.implicits._
    val df = Seq(
      (Option(1), Option("a")),
      (Option(2), Option("a")),
      (Option(2), None),
      (None: Option[Int], Option("z"))
    ).toDF("num", "s")
    val p = graft.quality.Quality.profile(df, Seq("num"), Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val n = p("num")
    assert(n.getLong(1) === 4L && n.getLong(2) === 1L && n.getLong(3) === 2L)
    assert(n.getDouble(4) === 1.0 && n.getDouble(5) === 2.0)
    assert(n.isNullAt(6) && n.isNullAt(7))
    val sRow = p("s")
    assert(sRow.getLong(2) === 1L && sRow.getLong(3) === 2L)
    assert(sRow.isNullAt(4) && sRow.getString(6) === "a" &&
      sRow.getString(7) === "z")
    intercept[IllegalArgumentException] {
      graft.quality.Quality.profile(df, Seq.empty, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      graft.quality.Quality.profile(df, Seq("num"), Seq("num"))
    }
  }
}
