package graft.monitoring

/** Prometheus text-format (0.0.4) exposition of the engine's streaming
  * metrics and alert states — the external surface the reference exposes
  * for its scraper (monitoring/prometheus/alert_rules.yml:4-56 consumes
  * `events_produced_total`-style series; the reference's exporters emit
  * the matching text format).
  *
  * This is deliberately a pure string renderer over driver-side state:
  * the listener history is (batches × 4 longs) and the alert-state list
  * is (rules), both trivially bounded, so no Spark job runs to serve a
  * scrape — the one property a metrics endpoint must have on a busy
  * cluster. */
object Prometheus {

  /** Label-VALUE escaping per the Prometheus text format — the same
    * backslash rules govern PromQL label matchers, so [[Grafana]] reuses
    * this to keep exposition and query sides in exact agreement. */
  private[monitoring] def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private def fmt(d: Double): String =
    // Spark progress rates can be NaN/Infinity on zero-duration batches;
    // the 0.0.4 text format spells these NaN/+Inf/-Inf — Double.toString's
    // "Infinity" would corrupt the whole scrape body
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "+Inf"
    else if (d == Double.NegativeInfinity) "-Inf"
    else if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  /** Render a StreamingPipeline.MetricsListener batch history as counters
    * for lifetime totals, gauges for the latest batch, and latency
    * percentile gauges (p50/p95 batch duration; p50/p95 end-to-end event
    * age when the query carries event-time info) — the series the
    * reference's <60 s p95 SLO panel scrapes
    * (monitoring/prometheus/alert_rules.yml:37-46). */
  def renderProgress(history: Seq[graft.streaming.StreamingPipeline.BatchProgress],
                     job: String = "graft"): String = {
    val l = s"""{job="${esc(job)}"}"""
    val sb = new StringBuilder
    sb ++= "# HELP graft_batches_total Micro-batches processed since start.\n"
    sb ++= "# TYPE graft_batches_total counter\n"
    sb ++= s"graft_batches_total$l ${history.size}\n"
    sb ++= "# HELP graft_input_rows_total Input rows across all micro-batches.\n"
    sb ++= "# TYPE graft_input_rows_total counter\n"
    sb ++= s"graft_input_rows_total$l ${history.map(_.inputRows).sum}\n"
    history.lastOption.foreach { b =>
      sb ++= "# HELP graft_last_batch_id Most recent micro-batch id.\n"
      sb ++= "# TYPE graft_last_batch_id gauge\n"
      sb ++= s"graft_last_batch_id$l ${b.batchId}\n"
      sb ++= "# HELP graft_last_batch_input_rows Input rows of the most recent micro-batch.\n"
      sb ++= "# TYPE graft_last_batch_input_rows gauge\n"
      sb ++= s"graft_last_batch_input_rows$l ${b.inputRows}\n"
      sb ++= "# HELP graft_last_batch_rows_per_second Processing rate of the most recent micro-batch.\n"
      sb ++= "# TYPE graft_last_batch_rows_per_second gauge\n"
      sb ++= s"graft_last_batch_rows_per_second$l ${fmt(b.rowsPerSecond)}\n"
      sb ++= "# HELP graft_last_batch_duration_ms Duration of the most recent micro-batch.\n"
      sb ++= "# TYPE graft_last_batch_duration_ms gauge\n"
      sb ++= s"graft_last_batch_duration_ms$l ${b.batchDurationMs}\n"
    }
    val pcts = Alerts.latencyPercentiles(history)
    if (pcts.nonEmpty) {
      sb ++= "# HELP graft_batch_duration_ms Batch-duration percentiles over the history.\n"
      sb ++= "# TYPE graft_batch_duration_ms gauge\n"
      Seq("p50", "p95").foreach { q =>
        sb ++= s"""graft_batch_duration_ms{job="${esc(job)}",quantile="$q"} ${fmt(pcts(s"batch_duration_ms_$q"))}\n"""
      }
      if (pcts.contains("event_age_max_ms_p95")) {
        sb ++= "# HELP graft_event_age_ms End-to-end event age percentiles (worst-case per batch) over the history.\n"
        sb ++= "# TYPE graft_event_age_ms gauge\n"
        Seq("p50", "p95").foreach { q =>
          sb ++= s"""graft_event_age_ms{job="${esc(job)}",quantile="$q"} ${fmt(pcts(s"event_age_max_ms_$q"))}\n"""
        }
      }
    }
    sb.result()
  }

  /** Render per-rule alert states as an ALERTS-style gauge: 1 while the
    * rule is pending or firing at the newest evaluated window, 0 once
    * resolved. `states` rows are (alert, severity, state) with state ∈
    * {firing, pending, resolved, no_data} — [[Alerts.currentStates]]
    * produces exactly this. `no_data` renders as 1 (needs attention): an
    * absent or stale metric series must never read as all-clear. */
  def renderAlerts(states: Seq[(String, String, String)]): String = {
    val sb = new StringBuilder
    sb ++= "# HELP graft_alert_active Alert rule state (1 = pending or firing at the latest window).\n"
    sb ++= "# TYPE graft_alert_active gauge\n"
    states.sortBy(_._1).foreach { case (alert, severity, state) =>
      val v = if (state == "resolved") 0 else 1
      sb ++= s"""graft_alert_active{alertname="${esc(alert)}",severity="${esc(severity)}",alertstate="${esc(state)}"} $v\n"""
    }
    sb.result()
  }

  /** Render drift scores ((kind, group, score) rows — e.g. the collected
    * output of [[Drift.psi]] / [[Drift.embeddingDrift]], which are
    * (groups × monitors)-bounded) as a gauge. The HELP/TYPE header
    * renders even with no samples so the dashboard's drift panel always
    * queries a declared metric. */
  def renderDrift(scores: Seq[(String, String, Double)]): String = {
    val sb = new StringBuilder
    sb ++= "# HELP graft_drift_score Distribution-drift score per monitor (psi, ks, centroid_cosine).\n"
    sb ++= "# TYPE graft_drift_score gauge\n"
    scores.sortBy(s => (s._1, s._2)).foreach { case (kind, group, v) =>
      sb ++= s"""graft_drift_score{kind="${esc(kind)}",group="${esc(group)}"} ${fmt(v)}\n"""
    }
    sb.result()
  }

  /** One scrape body: listener history + current alert states + the
    * latest drift scores. */
  def scrape(history: Seq[graft.streaming.StreamingPipeline.BatchProgress],
             states: Seq[(String, String, String)],
             job: String = "graft",
             drift: Seq[(String, String, Double)] = Nil): String =
    renderProgress(history, job) + renderAlerts(states) + renderDrift(drift)
}
