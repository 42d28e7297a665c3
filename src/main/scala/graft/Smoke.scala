package graft

/** Round-local smoke runner: materialize the flagship entry query (the
  * driver's rows>0 check) and print its formatted physical plan for
  * shuffle/pushdown auditing. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows = $n")
    if (args.contains("--explain")) df.explain("formatted")
    spark.stop()
    assert(n > 0, "entry must return rows")
  }
}
