package graft.bench

import org.apache.spark.sql.SparkSession

/** The ONE definition of the headline medallion-chain measurement:
  * events → silver (null-filter, keep-latest dedup, range + z-score
  * flags) → gold 5-minute aggregate, materialized once. [[graft.Bench]]
  * (the committed headline) and `ScaleProbe chainheadline` (the
  * fresh-JVM adjudication probe) both call THIS — the same
  * single-definition discipline as [[StreamIngest]], so the probe
  * provably measures exactly what the bench measures when the chain's
  * stage composition next changes. */
object ChainMeasure {

  /** Rows in the chain's input table (the rows/s denominator). */
  def rows(spark: SparkSession, sfDir: String): Long =
    graft.model.Tables.events(spark, sfDir).count()

  /** One timed full materialization of the chain. Returns seconds. */
  def runOnce(spark: SparkSession, sfDir: String): Double = {
    val t0 = System.nanoTime()
    graft.Pipeline.gold5Min(spark, sfDir).count()
    (System.nanoTime() - t0) / 1e9
  }
}
