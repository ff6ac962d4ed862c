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


class _PagedHandler(http.server.BaseHTTPRequestHandler):
    """/paged?seed=S&cursor=C -> 3-page chains: items + next cursor."""

    def log_message(self, *a):
        pass

    def do_GET(self):
        from urllib.parse import parse_qs, urlparse

        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        seed, cur = int(q["seed"]), int(q.get("cursor") or 0)
        doc = {"seed": seed, "page_val": seed * 100 + cur}
        if cur < 2:
            doc["next"] = str(cur + 1)
        body = json.dumps(doc).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def test_cursor_pagination_walks_chains(spark):
    """fetch_pages_distributed follows each seed's cursor chain to the
    end: 3 pages per seed, cursors handed from body to request."""
    from popelines_spark.sources.rest import fetch_pages_distributed

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _PagedHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        seeds = spark.createDataFrame([(i,) for i in range(5)], "seed int")
        out = fetch_pages_distributed(
            seeds,
            f"http://127.0.0.1:{port}/paged?seed={{seed}}&cursor={{cursor}}",
            first_cursor="0",
        )
        rows = out.select(
            "seed", "__page", "__cursor", "__status",
            F.from_json("body", "seed int, page_val int, next string").alias("j"),
        ).collect()
        assert len(rows) == 15  # 5 chains × 3 pages
        by_seed = {}
        for r in rows:
            by_seed.setdefault(r["seed"], []).append(r)
        for s, chain in by_seed.items():
            chain.sort(key=lambda r: r["__page"])
            assert [r["__page"] for r in chain] == [0, 1, 2]
            assert [r["__cursor"] for r in chain] == ["0", "1", "2"]
            assert [r.j.page_val for r in chain] == [s * 100, s * 100 + 1, s * 100 + 2]
            assert all(r["__status"] == 200 for r in chain)
    finally:
        srv.shutdown()


_INFLIGHT = {"now": 0, "peak": 0}
_INFLIGHT_LOCK = threading.Lock()


class _SlowHandler(http.server.BaseHTTPRequestHandler):
    """Tracks peak concurrent in-flight requests; each takes ~100 ms."""

    def log_message(self, *a):
        pass

    def do_GET(self):
        import time as _t

        with _INFLIGHT_LOCK:
            _INFLIGHT["now"] += 1
            _INFLIGHT["peak"] = max(_INFLIGHT["peak"], _INFLIGHT["now"])
        _t.sleep(0.1)
        body = b'{"ok": true}'
        with _INFLIGHT_LOCK:
            _INFLIGHT["now"] -= 1
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def test_max_concurrent_bounds_parallel_fetches(spark):
    """max_concurrent=2 repartitions the window table to 2 partitions, so
    at most 2 tasks fetch simultaneously — the server's observed peak
    in-flight count proves the structural cap."""
    from popelines_spark.sources.rest import fetch_windows_distributed

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _SlowHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        _INFLIGHT["now"] = _INFLIGHT["peak"] = 0
        windows = spark.createDataFrame(
            [(i,) for i in range(12)], "w int"
        )
        out = fetch_windows_distributed(
            windows,
            f"http://127.0.0.1:{port}/slow?w={{w}}",
            max_concurrent=2,
        )
        assert out.count() == 12
        assert _INFLIGHT["peak"] <= 2, _INFLIGHT
    finally:
        srv.shutdown()


def test_rate_limit_spaces_request_starts(spark):
    """rate_limit_rps=20 on a single task: 6 requests must span at least
    5 × 50 ms of enforced spacing."""
    import time as _t

    from popelines_spark.sources.rest import fetch_windows_distributed

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        windows = spark.createDataFrame(
            [(i * 10, i * 10 + 1) for i in range(6)], "start int, end int"
        )
        t0 = _t.monotonic()
        out = fetch_windows_distributed(
            windows,
            f"http://127.0.0.1:{port}/data?start={{start}}&end={{end}}",
            max_concurrent=1,
            rate_limit_rps=20.0,
        )
        assert out.where("__status = 200").count() == 6
        assert _t.monotonic() - t0 >= 0.25
    finally:
        srv.shutdown()
