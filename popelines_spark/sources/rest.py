"""REST / HTTP sources.

Reference basis: popelines/main.py:193-206 (driver-side REST pull). The
distributed variant is the 100 TB path: URL tables fan out to executors
via mapInPandas (Arrow batches), the driver never touches payload bytes.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def fetch_json(url: str, method: str = "GET", headers=None, params=None, data=None):
    """popelines/main.py:193-206 — driver-side REST pull → parsed JSON.
    Returns None (and logs) on parse failure, matching the reference's
    logged fallthrough (:205-206)."""
    import logging
    import urllib.error
    import urllib.parse
    import urllib.request

    if params:
        url = f"{url}?{urllib.parse.urlencode(params)}"
    req = urllib.request.Request(
        url,
        method=method,
        headers=headers or {},
        data=data.encode() if isinstance(data, str) else data,
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            text = r.read().decode()
    except urllib.error.URLError as e:  # network failure → logged None
        logging.getLogger("popelines_spark").info("ERROR! request failed: %s", e)
        return None
    try:
        return json.loads(text)
    except ValueError:
        logging.getLogger("popelines_spark").info(
            "ERROR! Text of response object: %s", text
        )
        return None


def fetch_json_distributed(
    urls: DataFrame, url_col: str = "url", out_col: str = "body"
) -> DataFrame:
    """Executor-side REST fan-out: one HTTP GET per row of ``urls``, batched
    via mapInPandas (Arrow). This is the scale path for bulk API extraction —
    the driver never touches payload bytes. Responses come back as raw JSON
    text; parse with ``from_json`` against an explicit schema."""
    import pandas as pd

    schema = T.StructType(
        list(urls.schema.fields) + [T.StructField(out_col, T.StringType(), True)]
    )

    def _fetch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import urllib.request

        for pdf in batches:
            bodies = []
            for u in pdf[url_col]:
                try:
                    with urllib.request.urlopen(u, timeout=30) as r:
                        bodies.append(r.read().decode())
                except Exception:
                    bodies.append(None)
            pdf[out_col] = bodies
            yield pdf

    return urls.mapInPandas(_fetch, schema=schema)


def fetch_windows_distributed(
    windows: DataFrame,
    url_template: str,
    out_col: str = "body",
    max_retries: int = 3,
    backoff_s: float = 0.2,
    timeout_s: float = 30.0,
    max_concurrent: int | None = None,
    rate_limit_rps: float | None = None,
) -> DataFrame:
    """Parallel incremental-extract fan-out (VERDICT r6 next #8 /
    SURVEY.md's promised (url, window) shape): each row of ``windows``
    describes one extraction window; ``url_template`` is formatted with
    the row's columns (e.g. ``"http://api/data?start={start}&end={end}"``)
    and fetched EXECUTOR-side in Arrow batches. Replaces the reference's
    driver-serial loop (chunk_date_range + call_api per chunk,
    popelines/main.py:193-223) as the scale path: N windows fetch with
    full cluster parallelism, the driver never touches payload bytes.

    Per-row bounded retry with linear backoff (the reference's
    retry-and-wait contract), and an honest error surface: output adds
    ``out_col`` (response text or null), ``__status`` (HTTP status or -1),
    ``__attempts``, ``__error`` (repr of the final failure or null) —
    callers decide whether partial extraction is acceptable instead of a
    silent None swallow.

    Politeness knobs (real APIs throttle): ``max_concurrent`` bounds the
    number of simultaneous fetching tasks STRUCTURALLY — the window
    table is repartitioned to that many partitions, so the cap holds
    across executor processes and machines without any shared state
    (Spark schedules ≤ one task per partition at a time).
    ``rate_limit_rps`` spaces request STARTS within each task, so the
    aggregate rate is ≤ max_concurrent × rate_limit_rps — a deliberate,
    observable ceiling instead of a thundering herd."""
    import pandas as pd  # noqa: F401 — typing only; imported in workers

    if max_concurrent is not None:
        windows = windows.repartition(max_concurrent)
    schema = T.StructType(
        list(windows.schema.fields)
        + [
            T.StructField(out_col, T.StringType(), True),
            T.StructField("__status", T.IntegerType(), False),
            T.StructField("__attempts", T.IntegerType(), False),
            T.StructField("__error", T.StringType(), True),
        ]
    )
    cols = [f.name for f in windows.schema.fields]
    min_interval = 1.0 / rate_limit_rps if rate_limit_rps else 0.0

    def _fetch(batches: Iterator) -> Iterator:
        import time
        import urllib.error
        import urllib.request

        next_start = [0.0]  # per-task rate-limit clock

        for pdf in batches:
            bodies, statuses, attempts_l, errors = [], [], [], []
            for _, row in pdf.iterrows():
                url = url_template.format(**{c: row[c] for c in cols})
                if min_interval:
                    wait = next_start[0] - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                    next_start[0] = time.monotonic() + min_interval
                body, status, err = None, -1, None
                attempt = 0
                while attempt < max_retries:
                    attempt += 1
                    try:
                        with urllib.request.urlopen(
                            url, timeout=timeout_s
                        ) as r:
                            body = r.read().decode()
                            # file:// handles have no HTTP status
                            status = getattr(r, "status", None) or 200
                            err = None
                        break
                    except urllib.error.HTTPError as e:
                        status, err = e.code, repr(e)
                        if 400 <= e.code < 500 and e.code != 429:
                            break  # client errors don't retry
                    except Exception as e:  # URLError, timeout, ...
                        err = repr(e)
                    if attempt < max_retries:  # no sleep after the final try
                        time.sleep(backoff_s * attempt)
                bodies.append(body)
                statuses.append(status)
                attempts_l.append(attempt)
                errors.append(None if body is not None else err)
            pdf = pdf.copy()
            pdf[out_col] = bodies
            pdf["__status"] = statuses
            pdf["__attempts"] = attempts_l
            pdf["__error"] = errors
            yield pdf

    return windows.mapInPandas(_fetch, schema=schema)


def fetch_pages_distributed(
    seeds: DataFrame,
    url_template: str,
    first_cursor: str = "",
    next_cursor_key: str = "next",
    out_col: str = "body",
    max_pages: int = 1000,
    max_retries: int = 3,
    backoff_s: float = 0.2,
    timeout_s: float = 30.0,
    max_concurrent: int | None = None,
    rate_limit_rps: float | None = None,
) -> DataFrame:
    """Cursor-paginated REST extract, executor-side: each row of
    ``seeds`` is one pagination chain (an entity/endpoint to walk);
    ``url_template`` is formatted with the row's columns PLUS
    ``{cursor}``, and each page's JSON body supplies the next cursor
    under ``next_cursor_key`` (absent/null/empty ⇒ chain done). Emits
    ONE OUTPUT ROW PER PAGE: seed columns + ``__page`` (0-based) +
    ``__cursor`` (the cursor that FETCHED the page) + body/status/
    attempts/error — the same honest error surface as
    fetch_windows_distributed; a failed page ends its chain with the
    error recorded, chains never silently truncate (``max_pages`` is the
    runaway bound; hitting it is visible as __page == max_pages-1).

    This is the reference's call_api loop (popelines/main.py:193-206,
    driver-serial, cursor in params) turned into the scale shape:
    CHAINS fan out across the cluster (pages within a chain are
    inherently sequential — the cursor is a data dependency), so N
    entities paginate with N-way parallelism. ``max_concurrent`` /
    ``rate_limit_rps`` bound politeness exactly as in
    fetch_windows_distributed."""
    import pandas as pd  # noqa: F401 — imported in workers

    if max_concurrent is not None:
        seeds = seeds.repartition(max_concurrent)
    schema = T.StructType(
        list(seeds.schema.fields)
        + [
            T.StructField("__page", T.IntegerType(), False),
            T.StructField("__cursor", T.StringType(), True),
            T.StructField(out_col, T.StringType(), True),
            T.StructField("__status", T.IntegerType(), False),
            T.StructField("__attempts", T.IntegerType(), False),
            T.StructField("__error", T.StringType(), True),
        ]
    )
    cols = [f.name for f in seeds.schema.fields]
    out_cols = [f.name for f in schema.fields]
    min_interval = 1.0 / rate_limit_rps if rate_limit_rps else 0.0

    def _fetch(batches: Iterator) -> Iterator:
        import json as _json
        import time
        import urllib.error
        import urllib.request

        import pandas as pd

        next_start = [0.0]

        def get(url):
            if min_interval:
                wait = next_start[0] - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
                next_start[0] = time.monotonic() + min_interval
            body, status, err = None, -1, None
            attempt = 0
            while attempt < max_retries:
                attempt += 1
                try:
                    with urllib.request.urlopen(url, timeout=timeout_s) as r:
                        body = r.read().decode()
                        status = getattr(r, "status", None) or 200
                        err = None
                    break
                except urllib.error.HTTPError as e:
                    status, err = e.code, repr(e)
                    if 400 <= e.code < 500 and e.code != 429:
                        break
                except Exception as e:
                    err = repr(e)
                if attempt < max_retries:
                    time.sleep(backoff_s * attempt)
            return body, status, attempt, err

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                seed_vals = [row[c] for c in cols]
                cursor = first_cursor
                for page in range(max_pages):
                    url = url_template.format(
                        **{c: row[c] for c in cols}, cursor=cursor
                    )
                    body, status, attempt, err = get(url)
                    rows.append(
                        seed_vals
                        + [
                            page,
                            cursor,
                            body,
                            status,
                            attempt,
                            None if body is not None else err,
                        ]
                    )
                    if body is None:
                        break  # chain ends; the error row records why
                    try:
                        doc = _json.loads(body)
                        # a non-object body (JSON array/string/number —
                        # common for list endpoints) has no cursor; end
                        # the chain instead of AttributeError-killing
                        # the whole job (review r12)
                        nxt = (
                            doc.get(next_cursor_key)
                            if isinstance(doc, dict)
                            else None
                        )
                    except ValueError:
                        nxt = None
                    if nxt is None or nxt == "":
                        break
                    cursor = str(nxt)
            yield pd.DataFrame(rows, columns=out_cols)

    return seeds.mapInPandas(_fetch, schema=schema)
