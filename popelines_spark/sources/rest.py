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
