package graft

import scala.io.Source

/** Prometheus metrics export, end-to-end.
  *
  * Reference analogue: flink-prometheus wires job metrics to Prometheus
  * through a PushGateway reporter configured in flink-conf.yaml
  * (flink-prometheus/src/main/resources/flink-conf.yaml:1-11) and reads
  * a user counter registered in MyClickEventCount.java:111. Spark's
  * idiomatic path is PULL-based: the built-in PrometheusServlet sink
  * exposes the driver's DropWizard registry on the web UI, and
  * `spark.ui.prometheus.enabled` adds per-executor metrics — no
  * external jar, no push daemon. `Sessions.prometheusConfs` carries the
  * confs (opt-in via SPARK_GRAFT_PROMETHEUS for production sessions);
  * the shared test session enables them, and this suite scrapes the
  * live HTTP endpoints like a Prometheus server would.
  */
class MetricsExportSpec extends SparkSpec {

  private def get(url: String): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(10000)
    try {
      assert(conn.getResponseCode === 200, s"GET $url -> ${conn.getResponseCode}")
      Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
    } finally conn.disconnect()
  }

  test("PrometheusServlet serves driver metrics in Prometheus text format") {
    // run a job first so scheduler/executor metric values are live
    spark.range(10000).selectExpr("sum(id)").collect()
    val ui = spark.sparkContext.uiWebUrl.getOrElse(
      fail("web UI must be up for the metrics servlet"))
    val body = get(s"$ui/metrics/prometheus")
    val lines = body.linesIterator.filter(_.nonEmpty).toSeq
    assert(lines.nonEmpty, "servlet returned an empty registry")
    // Prometheus exposition format: `name{labels} value` per line —
    // every non-comment line must parse that way
    val metricLine = """^[A-Za-z_:][A-Za-z0-9_:]*(\{[^}]*\})? [-+0-9.eENaInf]+$""".r
    val bad = lines.filterNot(l => l.startsWith("#") ||
      metricLine.pattern.matcher(l).matches())
    assert(bad.isEmpty, s"non-Prometheus lines: ${bad.take(3)}")
    // the DropWizard registry must actually contain engine metrics
    // (DAGScheduler job/stage counters are always registered on a
    // driver), not just an empty well-formed page
    assert(lines.exists(_.contains("DAGScheduler")),
      s"expected driver scheduler metrics, got: ${lines.take(5)}")
  }

  test("executor metrics endpoint serves per-executor rows") {
    spark.range(10000).selectExpr("count(*)").collect()
    val ui = spark.sparkContext.uiWebUrl.get
    val body = get(s"$ui/metrics/executors/prometheus")
    // local mode still reports the driver-as-executor row
    assert(body.linesIterator.exists(l =>
      l.startsWith("metrics_executor_") || l.startsWith("spark_info")),
      s"expected executor metric lines, got: ${body.linesIterator.take(3).toSeq}")
  }
}
