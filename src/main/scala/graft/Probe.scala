package graft

import org.apache.spark.sql.functions._

/** Dev-only micro-profiler: time an individual SparkEntry query (or a named
  * internal stage) in isolation. `Probe <query> [sfDir]` — not part of the
  * driver contract. Special names: `chain` times the medallion chain
  * (events → silver flags → gold 5-min aggs, the bench's
  * chain_rows_per_sec) and `stream` the watermarked streaming-ingest
  * replay (the bench's stream_events_per_sec) — both in THIS fresh JVM,
  * for adjudicating shared-JVM bench readings per the SCALE.md protocol. */
object Probe {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("--explain")
    val rest = args.filterNot(_ == "--explain")
    val q = rest.headOption.getOrElse("x_minhash_lsh_neardups")
    val sfDir = if (rest.length > 1) rest(1) else "/root/testdata/sf0.1"
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
    }
    q match {
      case "chain" =>
        val rows = model.Tables.events(spark, sfDir).count()
        (1 to 3).foreach { i =>
          System.gc()
          val t0 = System.nanoTime()
          val g = Pipeline.gold5Min(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[probe] chain run$i rows=$rows gold_groups=$g sec=$sec%.3f " +
            f"rows_per_sec=${rows / sec}%.0f")
        }
      case "stream" =>
        import java.nio.file.{Files, Path}
        val streamDir = Files.createTempDirectory("graft-probe-stream")
        // events.parquet may be a single file (the driver's testdata) or a
        // Spark-written DIRECTORY of part files; Files.copy on a directory
        // creates an empty dir and the stream would replay 0 rows — a
        // silently meaningless events_per_sec. Copy whichever shape it is.
        val srcPath = Path.of(s"$sfDir/events.parquet")
        if (Files.isDirectory(srcPath))
          org.apache.commons.io.FileUtils.copyDirectory(srcPath.toFile,
            streamDir.resolve("events.parquet").toFile)
        else Files.copy(srcPath, streamDir.resolve("events.parquet"))
        val raw = spark.read.parquet(streamDir.toString)
        val src0 = spark.readStream.schema(raw.schema).parquet(streamDir.toString)
        val src =
          if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
            src0.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          else src0
        val rows = raw.count()
        require(rows > 0,
          s"stream probe: $srcPath replayed 0 rows — events_per_sec would " +
            "be meaningless")
        val agg = streaming.StreamingPipeline.windowedAgg(
          src, "ts", Seq("event_type"), "value", "5 minutes", "10 minutes")
        (1 to 3).foreach { i =>
          System.gc()
          val ckpt = Files.createTempDirectory("graft-probe-ckpt").toString
          val t0 = System.nanoTime()
          val sq = agg.writeStream.outputMode("update").format("noop")
            .option("checkpointLocation", ckpt).start()
          try sq.processAllAvailable() finally sq.stop()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[probe] stream run$i rows=$rows sec=$sec%.3f " +
            f"events_per_sec=${rows / sec}%.0f")
        }
      case _ =>
        if (explain) SparkEntry.queries(q)(spark, sfDir).explain("formatted")
        (1 to 3).foreach { i =>
          time(s"$q run$i") { SparkEntry.queries(q)(spark, sfDir).count() }
          spark.catalog.clearCache()
        }
    }
    spark.stop()
  }
}
