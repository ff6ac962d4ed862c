"""Custom Python DataSource (Spark 4 DataSource API): windowed REST.

The third — and most idiomatic — form of the incremental REST extract
(after the reference's driver-serial loop and the mapInPandas fan-out in
``rest.py``): a first-class ``spark.read.format("rest_windows")`` source
whose INPUT PARTITIONS are the extraction windows. Each Spark task owns
one window, fetches it executor-side with the same bounded retry /
status / error surface as ``fetch_windows_distributed``, and the source
composes with everything the DataFrame reader gives for free (select
pruning, downstream joins, caching). At 100 TB this is how a REST/API
corpus enters the lake: windows ≙ splits, retry in the reader, the
driver never touches payload bytes.

Usage::

    from popelines_spark.sources.pyds import RestWindowsDataSource
    spark.dataSource.register(RestWindowsDataSource)
    df = (spark.read.format("rest_windows")
          .option("url_template", "http://api/data?start={start}&end={end}")
          .option("start", "2024-01-01")
          .option("end", "2024-01-17")
          .option("chunk_days", "2")
          .load())

Schema: (w INT, window_start STRING, window_end STRING, body STRING,
status INT, attempts INT, error STRING).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql import types as T


class WindowPartition(InputPartition):
    def __init__(self, w: int, start: str, end: str, url: str):
        self.w = w
        self.start = start
        self.end = end
        self.url = url


_SCHEMA = T.StructType(
    [
        T.StructField("w", T.IntegerType(), False),
        T.StructField("window_start", T.StringType(), False),
        T.StructField("window_end", T.StringType(), False),
        T.StructField("body", T.StringType(), True),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


class RestWindowsReader(DataSourceReader):
    def __init__(self, options):
        self.template = options["url_template"]
        self.start = options["start"]
        self.end = options["end"]
        self.chunk_days = int(options.get("chunk_days", "1"))
        self.max_retries = int(options.get("max_retries", "3"))
        self.backoff_s = float(options.get("backoff_s", "0.2"))
        self.timeout_s = float(options.get("timeout_s", "30"))

    def partitions(self):
        import datetime as dt

        from popelines_spark.incremental import chunk_date_range

        s = dt.datetime.strptime(self.start, "%Y-%m-%d")
        e = dt.datetime.strptime(self.end, "%Y-%m-%d")
        out = []
        for w, (cs, ce) in enumerate(
            chunk_date_range(s, e, self.chunk_days)
        ):
            a, b = cs.strftime("%Y-%m-%d"), ce.strftime("%Y-%m-%d")
            out.append(
                WindowPartition(
                    w, a, b, self.template.format(start=a, end=b)
                )
            )
        return out

    def read(self, partition: WindowPartition):
        if partition is None:
            # an empty date range yields zero partitions, and pyspark's
            # DataSource planner substitutes [None] for an empty list —
            # read(None) must yield zero rows, not crash on
            # partition.url (review r12; same empty-range class
            # date_series fixed on the distributed path)
            return
        import time
        import urllib.error
        import urllib.request

        body, status, err = None, -1, None
        attempt = 0
        while attempt < self.max_retries:
            attempt += 1
            try:
                with urllib.request.urlopen(
                    partition.url, timeout=self.timeout_s
                ) as r:
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
            if attempt < self.max_retries:
                time.sleep(self.backoff_s * attempt)
        yield (
            partition.w,
            partition.start,
            partition.end,
            body,
            status,
            attempt,
            None if body is not None else err,
        )


class RestWindowsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_windows"

    def schema(self):
        return _SCHEMA

    def reader(self, schema) -> RestWindowsReader:
        return RestWindowsReader(self.options)
