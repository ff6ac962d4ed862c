"""Parallel (url, window) REST fan-out (sources/rest.py:
fetch_windows_distributed) against a real in-process HTTP stub server:
proves executor-side fetch, bounded retry with backoff, and the honest
error surface."""

import http.server
import json
import threading

from pyspark.sql import functions as F

from popelines_spark.sources.rest import fetch_windows_distributed

_FAIL_ONCE: dict[str, int] = {}


class _Handler(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        # /data?start=S&end=E  -> {"start": S, "n": E-S}
        # /flaky?key=K         -> 503 on first hit per key, then 200
        # /gone                -> hard 404 (no retry expected)
        from urllib.parse import parse_qs, urlparse

        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        if u.path == "/data":
            body = json.dumps(
                {"start": int(q["start"]), "n": int(q["end"]) - int(q["start"])}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif u.path == "/flaky":
            k = q["key"]
            if _FAIL_ONCE.get(k, 0) == 0:
                _FAIL_ONCE[k] = 1
                self.send_response(503)
                self.end_headers()
            else:
                body = json.dumps({"key": k, "ok": True}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()


def _server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


def test_window_fanout_fetches_all_windows(spark):
    srv, port = _server()
    try:
        windows = spark.createDataFrame(
            [(i * 10, i * 10 + 7) for i in range(12)], "start int, end int"
        )
        out = fetch_windows_distributed(
            windows,
            f"http://127.0.0.1:{port}/data?start={{start}}&end={{end}}",
        )
        parsed = out.select(
            "start", "__status", "__attempts",
            F.from_json("body", "start int, n int").alias("j"),
        )
        rows = parsed.collect()
        assert len(rows) == 12
        assert all(r["__status"] == 200 and r["__attempts"] == 1 for r in rows)
        assert all(r.j.n == 7 and r.j.start == r.start for r in rows)
    finally:
        srv.shutdown()


def test_window_fanout_retries_transient_failures(spark):
    srv, port = _server()
    try:
        _FAIL_ONCE.clear()
        windows = spark.createDataFrame(
            [(f"k{i}",) for i in range(5)], "key string"
        ).coalesce(1)  # single task → deterministic one-501-per-key
        out = fetch_windows_distributed(
            windows,
            f"http://127.0.0.1:{port}/flaky?key={{key}}",
            backoff_s=0.01,
        ).collect()
        assert len(out) == 5
        # every key failed once (503) then succeeded on retry
        assert all(r["__status"] == 200 and r.body is not None for r in out)
        assert all(r["__attempts"] == 2 for r in out)
        assert all(r["__error"] is None for r in out)
    finally:
        srv.shutdown()


def test_window_fanout_surfaces_hard_errors(spark):
    srv, port = _server()
    try:
        windows = spark.createDataFrame([("x",)], "key string")
        out = fetch_windows_distributed(
            windows, f"http://127.0.0.1:{port}/gone?key={{key}}",
            backoff_s=0.01,
        ).collect()
        r = out[0]
        assert r.body is None
        assert r["__status"] == 404
        assert r["__attempts"] == 1  # 4xx does not retry
        assert r["__error"] and "404" in r["__error"]
    finally:
        srv.shutdown()


def test_pyds_rest_windows_against_live_server(spark):
    """The Spark-4 Python DataSource form: one input partition per
    window, executor-side fetch against a real HTTP server, retry and
    error surface preserved."""
    from popelines_spark.sources.pyds import RestWindowsDataSource

    spark.dataSource.register(RestWindowsDataSource)
    srv, port = _server()
    try:
        df = (
            spark.read.format("rest_windows")
            .option("url_template",
                    f"http://127.0.0.1:{port}/data?start=10&end=17")
            .option("start", "2024-02-01")
            .option("end", "2024-02-09")
            .option("chunk_days", "2")
            .load()
        )
        rows = df.collect()
        assert len(rows) == 5  # chunk_date_range yields 5 windows here
        assert df.rdd.getNumPartitions() == 5  # one split per window
        assert all(r.status == 200 and r.attempts == 1 for r in rows)
        import json as _json

        assert all(_json.loads(r.body)["n"] == 7 for r in rows)
        # hard 404: surfaced per window, no retry on 4xx
        bad = (
            spark.read.format("rest_windows")
            .option("url_template", f"http://127.0.0.1:{port}/gone")
            .option("start", "2024-02-01")
            .option("end", "2024-02-03")
            .option("chunk_days", "2")
            .option("backoff_s", "0.01")
            .load()
        ).collect()
        assert all(
            r.status == 404 and r.attempts == 1 and r.body is None
            and "404" in r.error
            for r in bad
        )
    finally:
        srv.shutdown()
