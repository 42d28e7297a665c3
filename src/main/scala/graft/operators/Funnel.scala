package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel and cohort analytics over an event stream — the product-
  * analytics queries an events engine must serve.
  *
  * Scale notes (100 TB):
  *  - `conversion` is one aggregation per funnel step, each keyed by the
  *    user column — the same shuffle key every time, so AQE/exchange reuse
  *    keeps it one effective repartition; no step materializes more than
  *    (user, timestamp) pairs.
  *  - `cohortRetention` is two aggregations (first-seen week, active
  *    weeks) joined on the user key, emitting only (cohort, offset,
  *    count) — cardinality bounded by weeks², independent of event count.
  */
object Funnel {

  /** Per-user ordered step times: for steps = Seq(s1, s2, ...), t1 = first
    * s1 event, t2 = first s2 event strictly after t1, and so on. Users
    * missing a step carry null from that step onward. Output: (user,
    * t_1 .. t_n). */
  def conversion(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t_1"))
    steps.tail.zipWithIndex.foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"t_${i + 1}"
      val cur = s"t_${i + 2}"
      val stepTimes = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("_st"))
      acc.join(stepTimes, Seq(userCol), "left")
        .groupBy((col(userCol) +: (1 to i + 1).map(j => col(s"t_$j"))): _*)
        .agg(min(when(col("_st") > col(prev), col("_st"))).as(cur))
    }
  }

  /** Funnel summary: how many users reached each step. */
  def conversionCounts(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, steps: Seq[String]): DataFrame = {
    val perUser = conversion(events, userCol, typeCol, tsCol, steps)
    perUser.agg(
      count(col("t_1")).as(s"n_${steps.head}"),
      steps.tail.zipWithIndex.map { case (s, i) =>
        count(col(s"t_${i + 2}")).as(s"n_$s")
      }: _*)
  }

  /** Cohort retention: users grouped by first-seen week; for each cohort
    * and week offset, how many of its users were active. Offsets are whole
    * weeks (0 = the cohort week itself). */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val firstSeen = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val activeWeeks = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("active_week"))
      .distinct()
    firstSeen.join(activeWeeks, Seq(userCol))
      .withColumn("week_offset",
        (datediff(to_date(col("active_week")), to_date(col("cohort_week"))) / 7)
          .cast("int"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col(userCol)).as("n_active"))
  }
}
