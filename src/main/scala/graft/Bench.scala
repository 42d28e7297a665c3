package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query plus the medallion chain
  * on SPARK_GRAFT_SF_DIR, printing ONE JSON line for the driver.
  *
  * A warm-up pass (session init + one scan per input table) runs before
  * any timer so the first measured query doesn't absorb JVM/classloader/
  * page-cache costs. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: session, codegen, input footprint.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.model.Tables.all.foreach { t =>
      try graft.model.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // min of 2 runs per query: first run absorbs codegen/JIT/page-cache;
    // the minimum approximates steady-state per-query latency.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        time { try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () } }
      }
      // operators may persist intermediates; drop them so later queries
      // aren't taxed by accumulated cache + GC pressure
      spark.catalog.clearCache()
      name -> times.min
    }

    // Medallion chain throughput: events -> silver flags -> gold 5-min aggs.
    val chainRows = graft.model.Tables.events(spark, sfDir).count()
    val chainSec = (1 to 2).map(_ => time { Pipeline.gold5Min(spark, sfDir).count(); () }).min
    val chainRps = if (chainSec > 0) chainRows / chainSec else 0.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","chain_rows":$chainRows,"chain_sec":$chainSec,"chain_rows_per_sec":$chainRps}""")
    spark.stop()
  }
}
