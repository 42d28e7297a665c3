package graft

/** Plan-audit utility: print the executed physical plan of one or more
  * registry queries (joins/exchanges/scans/aggregates view by default,
  * `--full` for everything, `--formatted` for explain("formatted") —
  * the form the r21+ plan artifacts under plans/ are dumped in). Usage:
  *   graft.Explain <query>[,<query>...] [sfDir] [--full|--formatted]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args.drop(1).filterNot(_.startsWith("--"))
      .headOption.getOrElse("/root/testdata/sf0.01")
    val full = args.contains("--full")
    val formatted = args.contains("--formatted")
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      println(s"===== $q =====")
      if (formatted) {
        println(SparkEntry.queries(q)(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")))
      } else {
      val p = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      if (full) println(p)
      else println(p.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Scan") || l.contains("Aggregate") || l.contains("Window"))
        .map(_.take(140)).mkString("\n"))
      }
    }
    spark.stop()
  }
}
