package graft.monitoring

import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** Grafana dashboard generator — the presentation-layer counterpart of
  * [[Prometheus]]: emits a valid dashboard-model JSON whose panels query
  * exactly the metric names this engine exposes (`graft_*`), mirroring
  * the reference's pipeline-health board semantically (throughput,
  * latency, totals, per-alert state — its
  * monitoring/grafana/dashboards/pipeline_health.json panels over
  * `events_produced_total`-style series) without hand-maintaining JSON:
  * the alert panels are DERIVED from the same [[Alerts.Rule]] list the
  * evaluator runs, so the board cannot drift from the rules.
  *
  * Pure string/JSON construction on the driver — no Spark job, no
  * external dependency beyond the json4s that ships with Spark. */
object Grafana {

  private def panel(id: Int, typ: String, title: String,
                    exprs: Seq[String], x: Int, y: Int,
                    w: Int = 12, h: Int = 8): org.json4s.JObject =
    ("id" -> id) ~ ("type" -> typ) ~ ("title" -> title) ~
      ("gridPos" -> (("h" -> h) ~ ("w" -> w) ~ ("x" -> x) ~ ("y" -> y))) ~
      ("targets" -> exprs.zipWithIndex.map { case (e, i) =>
        ("expr" -> e) ~ ("refId" -> ('A' + i).toChar.toString)
      })

  /** The pipeline-health dashboard: ingest rate, batch duration, lifetime
    * totals, and one state panel per alert rule. Returns pretty-printed
    * dashboard-model JSON (import via the Grafana API or provisioning). */
  def dashboardJson(rules: Seq[Alerts.Rule],
                    title: String = "graft pipeline health"): String = {
    val base = Seq(
      panel(1, "timeseries", "Ingest rate (rows/s)",
        Seq("rate(graft_input_rows_total[$__rate_interval])",
          "graft_last_batch_rows_per_second"), 0, 0),
      panel(2, "timeseries", "Micro-batch duration (ms)",
        Seq("graft_last_batch_duration_ms"), 12, 0),
      panel(3, "stat", "Total input rows",
        Seq("graft_input_rows_total"), 0, 8, w = 6, h = 4),
      panel(4, "stat", "Batches processed",
        Seq("graft_batches_total"), 6, 8, w = 6, h = 4),
      panel(5, "timeseries", "Batch input rows",
        Seq("graft_last_batch_input_rows"), 12, 8),
      panel(6, "stat", "Alerts needing attention",
        Seq("sum(graft_alert_active)"), 0, 12, w = 6, h = 4),
      panel(7, "timeseries", "Drift scores (PSI / centroid cosine)",
        Seq("""graft_drift_score{kind="psi"}""",
          """graft_drift_score{kind="centroid_cosine"}"""), 6, 12, w = 18, h = 4),
      // the reference's one real latency SLO: end-to-end p95 < 60 s
      // (alert_rules.yml:37-46) — plot both percentile families the
      // exposition side publishes so a breach shows WHERE the time goes
      // (queue age vs processing time)
      panel(8, "timeseries", "End-to-end latency percentiles (ms, SLO p95 < 60000)",
        Seq("""graft_event_age_ms{quantile="p95"}""",
          """graft_event_age_ms{quantile="p50"}""",
          """graft_batch_duration_ms{quantile="p95"}""",
          """graft_batch_duration_ms{quantile="p50"}"""), 0, 16, w = 24, h = 6))
    val rulePanels = rules.zipWithIndex.map { case (r, i) =>
      // rule names are user input inside a quoted PromQL matcher: escape
      // with the SAME helper the Prometheus exposition side uses, so a
      // name carrying " or \ still yields a valid expr that matches the
      // exported label value byte-for-byte
      panel(100 + i, "stat", s"alert: ${r.alert} (${r.severity})",
        Seq(s"""graft_alert_active{alertname="${Prometheus.esc(r.alert)}"}"""),
        (i % 4) * 6, 22 + (i / 4) * 4, w = 6, h = 4)
    }
    val dash = ("title" -> title) ~
      ("uid" -> "graft-pipeline-health") ~
      ("schemaVersion" -> 39) ~ ("refresh" -> "30s") ~
      ("time" -> (("from" -> "now-6h") ~ ("to" -> "now"))) ~
      ("panels" -> (base ++ rulePanels))
    JsonMethods.pretty(JsonMethods.render(dash))
  }
}
