package graft

import org.apache.spark.sql.functions._

/** Dev-only scale probe (not part of the driver contract, like [[Probe]]):
  * generate an N-row events table with the deterministic
  * [[bench.EventGenerator]], land it as parquet, and push it through the
  * SAME silver→gold stage composition the bench's medallion chain times —
  * direct evidence of whether chain throughput holds when the input is
  * 100× the sf0.1 bench table. `ScaleProbe [rows] [dir]`. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val out = if (args.length > 1) args(1) else "/tmp/graft_scale_events"
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nSensors = 500
    bench.EventGenerator.events(spark, nSensors, rows / nSensors)
      .withColumn("event_id",
        format_string("ev-%d", monotonically_increasing_id()))
      .repartition(cpus * 2)
      .write.mode("overwrite").parquet(out)
    val df = spark.read.parquet(out)
    val n = df.count()

    // the exact Pipeline.silver/gold5Min composition, minus the
    // events-table adapter (the generated frame IS reading-shaped)
    def chain(): Long = {
      val filtered = silver.Silver.nullFilter(df,
        Seq("sensor_id", "sensor_type", "value", "event_time"))
      val deduped = silver.Silver.dedupLatest(filtered,
        Seq("sensor_id", "event_time"), Seq(col("event_id").desc))
      val ranged = silver.Silver.rangeAnomaly(deduped, "sensor_type",
        "value", model.Schemas.eventValueRanges)
      val silverDf = silver.Silver.zscoreFlags(ranged, Seq("sensor_id"),
        Seq(col("event_time").asc, col("event_id").asc), "value")
      gold.Gold.withHealthPct(gold.Gold.windowAgg(silverDf,
        Seq("sensor_id", "sensor_type"), "event_time", "value",
        "5 minutes", approxPercentiles = true)).count()
    }
    (1 to 3).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      val g = chain()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] run$i rows=$n gold_groups=$g sec=$sec%.2f " +
        f"rows_per_sec=${n / sec}%.0f")
    }
    spark.stop()
  }
}
