package graft.bench

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed, deterministic sensor-event generator mirroring the
  * reference producer's semantics (sensor_simulator.py:24-36,69-94):
  * 4 sensor types with base/noise/unit/physical bounds, a round-robin
  * sensor fleet (`sensor-%03d`, location grid `floor-{1..5}-zone-{A..D}`),
  * Gaussian noise, anomaly injection as noise × per-type multiplier, and
  * clamp-to-bounds + round(2).
  *
  * Differences from the reference, by design:
  *  - Pure `spark.range` + Column expressions — generation is a narrow
  *    distributed projection: `spark.range(10^12)` generates 100 TB-scale
  *    input with zero driver involvement and no shuffle.
  *  - NO `rand()`: randomness derives from md5(seed, row, channel), so the
  *    same (seed, n) always yields bit-identical data on any cluster
  *    layout — generated fixtures are reproducible across runs/engines.
  *    Gaussians come from Box–Muller over two such uniforms.
  */
object EventGenerator {

  /** base, noise sigma, unit, physical bounds, anomaly noise multiplier
    * (reference: sensor_simulator.py:24-36). */
  final case class Profile(sensorType: String, base: Double, noise: Double,
                           unit: String, lo: Double, hi: Double, mult: Double)

  val profiles: Seq[Profile] = Seq(
    Profile("temperature", 22.0, 2.0, "celsius", -20.0, 60.0, 4.0),
    Profile("humidity", 55.0, 10.0, "percent", 5.0, 95.0, 3.0),
    Profile("pressure", 1013.0, 5.0, "hpa", 950.0, 1070.0, 5.0),
    Profile("vibration", 0.5, 0.3, "mm_s", 0.0, 2.0, 10.0))

  /** Uniform in (0, 1) derived from md5(seed|id|channel): 52 hex-derived
    * bits, offset by 0.5 ulp so log() never sees 0. */
  private def uniform(id: Column, seed: Long, channel: Int): Column =
    (conv(substring(md5(concat_ws("|", lit(seed), id, lit(channel)).cast("binary")),
      1, 13), 16, 10).cast("double") + 0.5) / math.pow(2.0, 52)

  /** Standard normal via Box–Muller from two deterministic uniforms. */
  private def gaussian(id: Column, seed: Long, c1: Int, c2: Int): Column =
    sqrt(lit(-2.0) * log(uniform(id, seed, c1))) *
      cos(lit(2.0 * math.Pi) * uniform(id, seed, c2))

  /** `nSensors * ticks` readings: sensor i emits one reading per tick at
    * start + tick·interval. Columns match the bronze reading contract plus
    * `is_injected` (the generator's ground truth, for anomaly-detector
    * evaluation — the reference producer logs the same fact). */
  def events(spark: SparkSession, nSensors: Int, ticks: Long,
             anomalyRate: Double = 0.02, seed: Long = 42L,
             startEpoch: Long = 1718445600L /* 2024-06-15 10:00 UTC */,
             intervalSeconds: Long = 1L): DataFrame = {
    val types = profiles.map(_.sensorType)
    val base = spark.range(nSensors.toLong * ticks)
      .withColumn("sensor_idx", (col("id") % nSensors).cast("int"))
      .withColumn("tick", col("id") / nSensors)
    val typeIdx = col("sensor_idx") % types.length
    val profile = (c: Profile => Double) =>
      element_at(array(profiles.map(p => lit(c(p))): _*), typeIdx.cast("int") + 1)
    val isAnom = uniform(col("id"), seed, 3) < anomalyRate
    val mult = when(isAnom, profile(_.mult)).otherwise(lit(1.0))
    val raw = profile(_.base) +
      profile(_.noise) * mult * gaussian(col("id"), seed, 1, 2)
    base.select(
      format_string("sensor-%03d", col("sensor_idx")).as("sensor_id"),
      element_at(array(types.map(lit): _*), typeIdx.cast("int") + 1).as("sensor_type"),
      timestamp_seconds(lit(startEpoch) + col("tick") * intervalSeconds).as("event_time"),
      round(greatest(profile(_.lo), least(profile(_.hi), raw)), 2).as("value"),
      element_at(array(profiles.map(p => lit(p.unit)): _*), typeIdx.cast("int") + 1).as("unit"),
      format_string("floor-%d-zone-%s",
        col("sensor_idx") % 5 + 1,
        element_at(array(Seq("A", "B", "C", "D").map(lit): _*),
          (col("sensor_idx") / 5 % 4).cast("int") + 1)).as("location"),
      isAnom.as("is_injected"))
  }
}
