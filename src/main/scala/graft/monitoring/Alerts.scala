package graft.monitoring

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative alert-threshold evaluation — the engine-side equivalent of
  * the reference's Prometheus rules (monitoring/prometheus/alert_rules.yml:
  * HighConsumerLag, ProducerDown, DataQualityFailures, AnomalyRateSpike).
  *
  * A rule is `metric OP threshold` plus a `for:` clause expressed as a
  * number of consecutive breached windows (`forWindows`). A breached window
  * whose consecutive-breach streak has reached `forWindows` is `firing`;
  * earlier breaches in the run are `pending` — exactly Prometheus's
  * pending→firing lifecycle, discretized to the metric cadence.
  *
  * Scale design: rules evaluate over an ALREADY-AGGREGATED metric series
  * (one row per window per metric) — at 100 TB the raw events never reach
  * this operator, only the windowed aggregate does, so the rules join is a
  * broadcast against a frame whose size is bounded by (windows × metrics).
  * Consecutive-run detection is one window-function pass partitioned by
  * alert, no self-join.
  */
object Alerts {

  /** One threshold rule. `op` ∈ {">", ">=", "<", "<="};
    * `forWindows` >= 1 is the Prometheus `for:` duration in windows. */
  final case class Rule(alert: String, severity: String, metric: String,
                        op: String, threshold: Double, forWindows: Int) {
    require(Set(">", ">=", "<", "<=")(op), s"unsupported op: $op")
    require(forWindows >= 1, "forWindows must be >= 1")
  }

  /** The default rule set, mirroring alert_rules.yml semantics on the
    * batch metric series: volume spike (~consumer lag), producer down,
    * error-rate spike (~quality failures), value drift (~anomaly rate). */
  val defaultRules: Seq[Rule] = Seq(
    Rule("high_volume", "warning", "events_total", ">", 20.0, 2),
    Rule("error_rate_spike", "critical", "error_rate", ">", 0.3, 1),
    Rule("producer_down", "critical", "events_total", "<=", 0.0, 1),
    Rule("value_drift", "warning", "avg_value", ">", 75.0, 1))

  /** Drift rules over [[Drift]] score series — [[Drift.asMetricSeries]]
    * produces the matching metric names. PSI sustained above the 0.25
    * investigate threshold for two windows fires (one window is often a
    * batch-composition blip); an embedding centroid that stays more than
    * ~18° off the reference direction (cos < 0.95) for two windows means
    * the corpus direction itself has moved — encoder change, new topic
    * mix, or upstream corruption. */
  val driftRules: Seq[Rule] = Seq(
    Rule("psi_drift", "warning", "psi", ">", 0.25, 2),
    Rule("embedding_drift", "critical", "centroid_cosine", "<", 0.95, 2))

  /** Gap-filled hourly metric series over the events table, long format
    * (window_start, metric, value). Missing hours materialize as
    * events_total=0 — without them `producer_down` could never fire
    * (the reference's `rate(events_produced_total[2m]) == 0` has the same
    * absence-of-data subtlety). */
  def hourlyEventMetrics(events: DataFrame): DataFrame = {
    val agg = events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"))
      .agg(count(lit(1)).cast("double").as("events_total"),
        avg(when(col("event_type") === "error", 1.0).otherwise(0.0)).as("error_rate"),
        avg(col("value")).as("avg_value"))
    // hour spine from the table's own bounds: one row, then sequence()
    val hours = events
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR")))
        .as("window_start"))
    hours.join(agg, Seq("window_start"), "left")
      .na.fill(0.0, Seq("events_total", "error_rate", "avg_value"))
      .select(col("window_start"), expr(
        """stack(3,
          |  'events_total', events_total,
          |  'error_rate',   error_rate,
          |  'avg_value',    avg_value) AS (metric, value)""".stripMargin))
  }

  /** Evaluate `rules` over a long-format metric series
    * (window_start: timestamp, metric: string, value: double) with a fixed
    * cadence of `windowSeconds` between consecutive windows. Returns one
    * row per breached window: (alert, severity, window_start, value,
    * streak, state) ordered for deterministic comparison. */
  def evaluate(metrics: DataFrame, rules: Seq[Rule],
               windowSeconds: Long = 3600L): DataFrame = {
    val spark = metrics.sparkSession
    import spark.implicits._
    val ruleDf = broadcast(rules.toDF())
    val joined = metrics.join(ruleDf, "metric")
    val breached = joined.filter(
      (col("op") === ">" && col("value") > col("threshold")) ||
      (col("op") === ">=" && col("value") >= col("threshold")) ||
      (col("op") === "<" && col("value") < col("threshold")) ||
      (col("op") === "<=" && col("value") <= col("threshold")))
    // gaps-and-islands: window index minus rank is constant within a
    // consecutive run of breached windows
    val byAlert = Window.partitionBy("alert").orderBy("window_start")
    val islands = breached
      .withColumn("h", (unix_timestamp(col("window_start")) / windowSeconds).cast("long"))
      .withColumn("island", col("h") - row_number().over(byAlert))
    val byIsland = Window.partitionBy("alert", "island").orderBy("window_start")
    islands
      .withColumn("streak", row_number().over(byIsland).cast("long"))
      .select(col("alert"), col("severity"),
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        round(col("value") + lit(1e-9), 4).as("value"),
        col("streak"),
        when(col("streak") >= col("forWindows"), "firing").otherwise("pending").as("state"))
      .orderBy("alert", "window_start")
  }

  /** Current per-rule state at the newest window of `metrics`: the
    * breached row's firing/pending if the rule breaches at that window,
    * `resolved` otherwise — the instantaneous view a scraper wants
    * ([[Prometheus.renderAlerts]] renders it). Returns a driver-side Seq:
    * the evaluated frame is (windows × rules)-bounded by construction.
    *
    * Absence is a state of its own: an EMPTY series reports every rule as
    * `no_data`, never "resolved" — a scraper must not read a dead metric
    * source as all-clear (producer_down included). Pass `asOf` (the
    * scrape/evaluation time) to also detect a STALLED series: if the
    * newest window is more than one cadence older than `asOf`, the series
    * itself has stopped and every rule likewise reports `no_data` instead
    * of freezing at its last state. Staleness is judged from the newest
    * window's END (start + cadence): a complete-window feed legitimately
    * has its newest start up to TWO cadences behind `asOf` just after a
    * boundary (the in-progress window hasn't landed yet), so only a
    * window that ENDED more than one cadence ago means the series
    * stopped. */
  def currentStates(metrics: DataFrame, rules: Seq[Rule],
                    windowSeconds: Long = 3600L,
                    asOf: Option[java.time.Instant] = None): Seq[(String, String, String)] = {
    val latestRow = metrics
      .agg(max(col("window_start")).as("w"),
        date_format(max(col("window_start")), "yyyy-MM-dd HH:mm:ss").as("s"))
      .collect()(0)
    if (latestRow.isNullAt(0))
      return rules.map(r => (r.alert, r.severity, "no_data"))
    val stale = asOf.exists(a => latestRow.getTimestamp(0).toInstant
      .plusSeconds(2 * windowSeconds).isBefore(a))
    if (stale)
      return rules.map(r => (r.alert, r.severity, "no_data"))
    val latest = latestRow.getString(1)
    val active = evaluate(metrics, rules, windowSeconds)
      .filter(col("window_start") === latest)
      .select("alert", "state").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    rules.map(r => (r.alert, r.severity, active.getOrElse(r.alert, "resolved")))
  }

  /** Latency SLO rules over the listener's end-to-end readings — the
    * engine-side form of the reference's ONE real latency SLO
    * (HighEndToEndLatency: p95 end-to-end > 60 s,
    * monitoring/prometheus/alert_rules.yml:37-46). `high_e2e_latency`
    * fires when the batch's WORST-case event age (oldest event at batch
    * completion) stays above 60 s for two consecutive batches — one
    * slow batch is a blip, two means the pipeline is behind.
    * `slow_batch` warns when processing a batch takes longer than the
    * reference's 30 s trigger cadence (spark_streaming.py:54) twice in
    * a row: each batch then starts further behind than the last. */
  val latencyRules: Seq[Rule] = Seq(
    Rule("high_e2e_latency", "critical", "event_age_max_ms", ">", 60000.0, 2),
    Rule("slow_batch", "warning", "batch_duration_ms", ">", 30000.0, 2))

  /** Streaming-side hookup: evaluate rules over a
    * StreamingPipeline.MetricsListener batch history (batch_id as the
    * window axis — cadence 1). Metrics exposed: input_rows,
    * rows_per_second, batch_duration_ms, event_age_avg_ms,
    * event_age_max_ms. Batches without event-time info (-1 sentinel)
    * contribute no age rows — a sentinel treated as a value would read
    * as instant delivery and mask an SLO breach streak. */
  def evaluateProgress(spark: SparkSession,
                       history: Seq[graft.streaming.StreamingPipeline.BatchProgress],
                       rules: Seq[Rule]): DataFrame = {
    import spark.implicits._
    val metrics = history
      .map(b => (b.batchId, b.inputRows, b.rowsPerSecond, b.batchDurationMs,
        b.eventAgeAvgMs, b.eventAgeMaxMs))
      .toDF("batch_id", "input_rows", "rows_per_second", "batch_duration_ms",
        "event_age_avg_ms", "event_age_max_ms")
      .select(to_timestamp(col("batch_id")).as("window_start"), expr(
        """stack(5,
          |  'input_rows',        cast(input_rows as double),
          |  'rows_per_second',   rows_per_second,
          |  'batch_duration_ms', cast(batch_duration_ms as double),
          |  'event_age_avg_ms',  cast(event_age_avg_ms as double),
          |  'event_age_max_ms',  cast(event_age_max_ms as double)) AS (metric, value)""".stripMargin))
      .filter(!(col("metric").startsWith("event_age_") && col("value") < 0))
    evaluate(metrics, rules, windowSeconds = 1L)
  }

  /** Exact latency percentiles over a listener history — the numbers the
    * reference's SLO dashboard wants (p50/p95 batch duration, p50/p95
    * end-to-end event age). Driver-side nearest-rank on a batches-sized
    * list: one row per micro-batch, never per event, so this stays a
    * microsecond computation at any data scale. Age keys are present
    * only when at least one batch carried event-time info. */
  def latencyPercentiles(
      history: Seq[graft.streaming.StreamingPipeline.BatchProgress]): Map[String, Double] = {
    def pct(xs: Seq[Long], q: Double): Double = {
      val s = xs.sorted
      s(math.min(s.size - 1, math.ceil(q * s.size).toInt - 1).max(0)).toDouble
    }
    if (history.isEmpty) return Map.empty
    val dur = history.map(_.batchDurationMs)
    val ages = history.map(_.eventAgeMaxMs).filter(_ >= 0)
    val agesAvg = history.map(_.eventAgeAvgMs).filter(_ >= 0)
    Map(
      "batch_duration_ms_p50" -> pct(dur, 0.50),
      "batch_duration_ms_p95" -> pct(dur, 0.95)) ++
      (if (ages.isEmpty) Map.empty[String, Double]
       else Map(
         "event_age_max_ms_p50" -> pct(ages, 0.50),
         "event_age_max_ms_p95" -> pct(ages, 0.95),
         "event_age_avg_ms_p50" -> pct(agesAvg, 0.50),
         "event_age_avg_ms_p95" -> pct(agesAvg, 0.95)))
  }
}
