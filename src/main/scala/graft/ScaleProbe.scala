package graft

import org.apache.spark.sql.functions._

/** Dev-only scale probe (not part of the driver contract, like [[Probe]]):
  * generate an N-row events table with the deterministic
  * [[bench.EventGenerator]], land it as parquet, and push it through the
  * SAME silver→gold stage composition the bench's medallion chain times —
  * direct evidence of whether chain throughput holds when the input is
  * 100× the sf0.1 bench table. `ScaleProbe [rows] [dir]`, or
  * `ScaleProbe dedup [nDocs]` for the MinHash-LSH near-dup sweep over a
  * deterministic synthetic corpus with 1% planted near-copies. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("dedup")) { dedupProbe(args); return }
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

  /** MinHash-LSH near-dup detection over a deterministic synthetic
    * corpus: 80 words per doc drawn hash-deterministically from a 20k
    * vocabulary, with every doc_id ≡ 1 (mod 100) sharing its
    * predecessor's first 76 words (jaccard ≈ 0.9) — so the expected pair
    * count is known (~nDocs/100) and the probe verifies recall while it
    * times the sweep. */
  private def dedupProbe(args: Array[String]): Unit = {
    val nDocs = if (args.length > 1) args(1).toLong else 50000L
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = when(pmod(col("doc_id"), lit(100)) === 1,
      col("doc_id") - 1).otherwise(col("doc_id"))
    val words = (i: Int, seed: org.apache.spark.sql.Column) =>
      concat(lit("w"), pmod(hash(seed * 97 + lit(i)), lit(20000)))
    val docs = spark.range(nDocs).select(col("id").as("doc_id"))
      .withColumn("text", concat_ws(" ",
        ((0 until 76).map(i => words(i, base)) ++
          (76 until 80).map(i => words(i, col("doc_id")))): _*))
      .repartition(cpus * 2)
    docs.write.mode("overwrite").parquet("/tmp/graft_scale_docs")
    val df = spark.read.parquet("/tmp/graft_scale_docs")
    (1 to 3).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      val pairs = graft.ext.Dedup.minhashNearDups(df, "text", "doc_id",
        threshold = 0.5).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] dedup run$i docs=$nDocs pairs=$pairs sec=$sec%.2f " +
        f"docs_per_sec=${nDocs / sec}%.0f")
    }
    spark.stop()
  }
}
