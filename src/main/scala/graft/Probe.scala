package graft

import org.apache.spark.sql.functions._

/** Dev-only micro-profiler: time an individual SparkEntry query (or a named
  * internal stage) in isolation. `Probe <query> [sfDir]` — not part of the
  * driver contract. */
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
    if (explain) SparkEntry.queries(q)(spark, sfDir).explain("formatted")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
    }
    (1 to 3).foreach { i =>
      time(s"$q run$i") { SparkEntry.queries(q)(spark, sfDir).count() }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
