"""Sources & sinks: NDJSON, parquet tables with schema evolution, REST.

Reference parity:
 - ``read_ndjson``/``write_ndjson``: NEWLINE_DELIMITED_JSON load/sink
   (popelines/main.py:115, 168-178). Spark's JSON source is line-delimited
   natively.
 - ``write_table``: the ``write_to_bq`` semantics (popelines/main.py:100-155):
   table-name normalization (:109), append vs truncate (:135-139), add-only
   schema evolution on append (ALLOW_FIELD_ADDITION, :139), unknown-field
   drop (:141-142), autodetect bypass (:131-132).
 - ``put_object``: GCS upload (popelines/main.py:157-166) → any Hadoop-FS
   URI copy.

REST sources (``fetch_json``/``fetch_json_distributed``) live in
``popelines_spark.sources.rest``.

Tables are parquet directories addressed by path (``location``), not a Hive
metastore — keeps the engine usable on a bare session. At scale the same
functions work on ``s3a://``/``gs://`` URIs.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from popelines_spark.operators.par import rebalance_output
from popelines_spark.schemas import merge_schemas


def normalize_table_name(name: str) -> str:
    """popelines/main.py:109 — lowercase, ``-`` → ``_``."""
    return name.lower().replace("-", "_")


def read_ndjson(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """Line-delimited JSON scan; explicit schema skips inference (and drops
    undeclared fields — the ignore_unknown_values load path,
    popelines/main.py:141-142)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def infer_ndjson_schema(spark: SparkSession, path: str) -> T.StructType:
    """Schema inference over NDJSON (popelines/main.py:62-75). Spark samples
    all rows by default; all-null fields surface as StringType, matching
    ``generate-schema --keep_nulls``'s string default closely."""
    return spark.read.json(path).schema


def write_ndjson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """NDJSON sink (popelines/main.py:176-178)."""
    df.write.mode(mode).json(path)


def table_path(warehouse: str, table_name: str) -> str:
    return os.path.join(warehouse, normalize_table_name(table_name))


def read_table(spark: SparkSession, warehouse: str, table_name: str) -> DataFrame:
    return spark.read.parquet(table_path(warehouse, table_name))


def write_table(
    df: DataFrame,
    warehouse: str,
    table_name: str,
    append: bool = True,
    ignore_unknown_values: bool = False,
    autodetect: bool = False,
    partition_by: list[str] | str | None = None,
    update_stats: bool = False,
) -> str:
    """``write_to_bq`` semantics on parquet-by-path tables.

    append=True  → WRITE_APPEND + add-only evolution: new columns are
                   appended to the live schema, existing column types win
                   (popelines/main.py:119-139 via ``merge_schemas``).
    append=False → WRITE_TRUNCATE (overwrite).
    ignore_unknown_values → drop input fields not present in the live schema
                   (popelines/main.py:141-142).
    autodetect   → trust the incoming schema as-is, skip the merge
                   (popelines/main.py:131-132).
    partition_by → Hive-style directory partitioning (the engine-native
                   analog of BigQuery's server-side table partitioning the
                   reference relies on implicitly); date-ranged reads then
                   prune at the directory listing
                   (operators/partitioned.py carries the layout rules).
    update_stats → appends fold the batch into ``_stats.json`` in
                   O(batch) via mergeable summaries
                   (``update_stats_increment``) instead of marking the
                   stats stale — BigQuery keeps table metadata current on
                   every load; this is that behavior, opt-in because it
                   costs one aggregation pass over the batch.

    Returns the table path. Parquet handles the at-rest schema union on read
    (mergeSchema) so appends never rewrite old files — same economics as
    BigQuery's ALLOW_FIELD_ADDITION at 100 TB.
    """
    spark = df.sparkSession
    path = table_path(warehouse, table_name)
    exists = _path_exists(spark, path)
    if exists:
        # two metadata probes; skipped on first write. Without this an
        # overwrite on a manifest table clobbers every committed version
        # and an autodetect append on a snapshot table lands files no
        # reader returns (review r12)
        _refuse_nonpath_layout(
            spark, warehouse, table_name, "write_table",
            "manifest.append_manifest_table / manifest_dml",
            "append_table_snapshot / write_table_snapshot",
        )
    pcols = (
        [partition_by] if isinstance(partition_by, str) else partition_by
    )

    def _writer(frame: DataFrame):
        w = frame.write
        return w.partitionBy(*pcols) if pcols else w

    if exists:
        live_pcols = _detect_partition_cols(spark, path)
        if live_pcols and append:
            # the table is Hive-directory-partitioned: a flat append at
            # the root would break partition discovery for every reader
            # ("Conflicting directory structures"), so appends inherit
            # the live layout when the caller doesn't spell it out
            if pcols is None:
                pcols = live_pcols
            elif pcols != live_pcols:
                raise ValueError(
                    f"write_table: table {table_name!r} is partitioned by "
                    f"{live_pcols}, but partition_by={pcols} was requested; "
                    "appends must match the live layout (overwrite to "
                    "change it)"
                )
    pre_files: set[str] | None = None
    if update_stats and append and exists:
        fs, root, jvm = _hadoop_fs(spark, path)
        pre_files = set(_list_data_files(fs, root, jvm))
    if append and exists and not autodetect:
        # mergeSchema: without it the live schema reflects ONE sampled
        # footer — on an evolved table that may predate a column, and
        # ignore_unknown_values would then silently drop that column
        # from the batch (review r11)
        live_schema = spark.read.option(
            "mergeSchema", "true"
        ).parquet(path).schema
        if ignore_unknown_values:
            keep = [f.name for f in df.schema.fields if f.name in live_schema.names]
            df = df.select(*keep)
        target = merge_schemas(live_schema, df.schema)
        df = _align_to(df, target)
        _writer(df).mode("append").parquet(path)
    else:
        _writer(df).mode(
            "append" if append and exists else "overwrite"
        ).parquet(path)
    if append and exists:
        # appended rows age the ANALYZE stats. update_stats=True folds
        # the batch in via mergeable summaries (update_stats_increment,
        # O(batch)); otherwise — or when the merge can't run (pre-sketch
        # or already-stale stats file) — mark stale rather than guess.
        # (overwrite needs neither: mode("overwrite") clears the dir,
        # _stats.json included)
        merged = None
        if update_stats:
            try:
                # profile the FILES JUST WRITTEN, not the input frame: a
                # nondeterministic lineage (limit, sample, rand) would
                # re-execute differently here and record stats for rows
                # that were never persisted. basePath recovers partition
                # columns from the directory names.
                fs, root, jvm = _hadoop_fs(spark, path)
                new_files = sorted(
                    set(_list_data_files(fs, root, jvm)) - (pre_files or set())
                )
                if new_files:
                    written = spark.read.option("basePath", path).parquet(
                        *new_files
                    )
                    merged = update_stats_increment(
                        spark, warehouse, table_name, written
                    )
                else:
                    # empty batch: nothing appended, stats still current
                    merged = read_table_stats(spark, warehouse, table_name)
            except Exception:
                import logging

                logging.getLogger(__name__).warning(
                    "incremental stats update failed for %s "
                    "(append succeeded); marking stale",
                    table_name, exc_info=True,
                )
        if merged is None:
            _mark_stats_stale(spark, path)
    return path


def _list_data_files(fs, root, jvm) -> list[str]:
    """Recursive listing of the data files under a table root (skips
    metadata: dotfiles, _stats.json, _SUCCESS, manifest dirs' JSON)."""
    out = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        name = p.getName()
        if name.startswith(".") or name.startswith("_"):
            continue
        if not name.endswith(".parquet"):
            continue
        out.append(p.toString())
    return out


def _mark_stats_stale(spark: SparkSession, path: str) -> None:
    """Set ``"stale": true`` in an existing ``_stats.json`` — appends
    change rows/NDV/skew under the planner's feet. Stale stats still
    steer (NDV ratios drift slowly); the flag tells maintenance to
    re-run analyze_table and tells auditors which decisions ran on aged
    metadata.

    BEST-EFFORT: this runs after the data append has already committed,
    so a broken stats file or transient FS error must not turn a
    successful load into a reported failure (an orchestrator would
    retry the chunk and duplicate rows) — log and move on."""
    import json
    import logging

    try:
        fs, _, jvm = _hadoop_fs(spark, path)
        sp = jvm.org.apache.hadoop.fs.Path(path + "/_stats.json")
        if not fs.exists(sp):
            return
        stream = fs.open(sp)
        try:
            text = jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
        stats = json.loads(text)
        if stats.get("stale"):
            return
        stats["stale"] = True
        _write_stats(fs, jvm, path, stats)
    except Exception:
        logging.getLogger(__name__).warning(
            "could not mark %s/_stats.json stale (append succeeded)",
            path, exc_info=True,
        )


def _detect_partition_cols(spark: SparkSession, path: str) -> list[str]:
    """Partition columns of a Hive-directory-layout table, read from the
    directory names (``day=2024-01-01/…``) down one branch; [] for a
    flat table. One listStatus per nesting level — metadata only."""
    fs, root, jvm = _hadoop_fs(spark, path)
    cols: list[str] = []
    cur = root
    while True:
        try:
            entries = fs.listStatus(cur)
        except Exception:
            break
        subdir = None
        for s in entries:
            name = s.getPath().getName()
            if s.isDirectory() and "=" in name and not name.startswith("."):
                subdir = s.getPath()
                cols.append(name.split("=", 1)[0])
                break
        if subdir is None:
            break
        cur = subdir
    return cols


def read_table_evolved(spark: SparkSession, warehouse: str, table_name: str) -> DataFrame:
    """Read a table whose appends evolved the schema (mergeSchema on)."""
    return spark.read.option("mergeSchema", "true").parquet(
        table_path(warehouse, table_name)
    )


def read_table_auto(spark: SparkSession, warehouse: str, table_name: str) -> DataFrame:
    """Read a table by whatever layout it carries: the live tip of an
    ACID manifest table (a plain glob would hit versions/ JSON and —
    after copy-on-write DML, before GC — double-count rewritten rows),
    else the evolved-parquet read. The read half of the layout detection
    analyze_table uses; operator paths that accept either layout
    (join_tables, star_join) route through this."""
    from popelines_spark.manifest import is_manifest_table

    if is_manifest_table(spark, warehouse, table_name):
        from popelines_spark.manifest import read_manifest_table

        return read_manifest_table(spark, warehouse, table_name)
    if is_snapshot_table(spark, warehouse, table_name):
        # Spark hides _-prefixed dirs from listing, so a root read of
        # the snapshot layout sees NO data at all ("Unable to infer
        # schema") — route to the committed tip (review r11)
        return read_table_snapshot(spark, warehouse, table_name)
    return read_table_evolved(spark, warehouse, table_name)


def is_snapshot_table(
    spark: SparkSession, warehouse: str, table_name: str
) -> bool:
    """True when the table carries the versioned snapshot layout
    (``_versions/v*/_COMMITTED``) this module writes."""
    path = f"{table_path(warehouse, table_name)}/{_VERSIONS_DIR}"
    fs, root, jvm = _hadoop_fs(spark, path)
    if not fs.exists(root):
        return False
    for st in fs.listStatus(root):
        n = st.getPath().getName()
        if n.startswith("v") and fs.exists(
            jvm.org.apache.hadoop.fs.Path(
                f"{path}/{n}/{_COMMIT_MARKER}"
            )
        ):
            return True
    return False


#: integral widening order for the lossless-cast predicate
#: (DataType.simpleString spellings)
_INT_WIDTH = {"tinyint": 1, "smallint": 2, "int": 3, "bigint": 4}


def _lossless_cast(src: T.DataType, dst: T.DataType) -> bool:
    """True when ``cast(src → dst)`` is provably injective AND total —
    no two distinct source values collide and none becomes NULL — so a
    map-KEY cast needs no runtime validation. Conservative: anything
    not on the allow-list (string sources, narrowing numerics, decimal,
    temporal) answers False and keeps the per-row probe."""
    s, d = src.simpleString(), dst.simpleString()
    if s in _INT_WIDTH and d in _INT_WIDTH:
        return _INT_WIDTH[s] <= _INT_WIDTH[d]
    if d == "string" and (s in _INT_WIDTH or s == "boolean"):
        return True  # integral/boolean → string is injective and total
    if s == "float" and d == "double":
        return True  # every float is exactly representable as double
    return False


def _align_expr(col, src: T.DataType, dst: T.DataType):
    """Align one expression to a target type BY NAME, recursively.

    A bare ``cast`` between struct types is POSITIONAL and
    field-count-strict: a batch whose struct misses a subfield crashed
    the append, and a struct carrying the same subfields in a different
    order silently swapped values between fields — persisted corruption
    (review r11). Structs therefore rebuild field-by-name (missing
    subfields → typed NULL, extra source subfields kept — same add-only
    evolution as the top level), arrays align their element type through
    ``transform``, maps their value type through ``transform_values``;
    primitives keep the legacy live-type cast (ADVICE r1 — un-cast
    conflicting primitives write parquet files that disagree on the
    column type, failing far from the write; mirrors BigQuery's
    load-time coercion, popelines/main.py:121-139)."""
    if src == dst:
        return col
    if isinstance(src, T.StructType) and isinstance(dst, T.StructType):
        have = {f.name: f.dataType for f in src.fields}
        parts = []
        for f in dst.fields:
            if f.name in have:
                parts.append(
                    _align_expr(
                        col.getField(f.name), have[f.name], f.dataType
                    ).alias(f.name)
                )
            else:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
        dst_names = {f.name for f in dst.fields}
        for f in src.fields:
            if f.name not in dst_names:
                parts.append(col.getField(f.name).alias(f.name))
        # a NULL struct row must stay NULL, not become a struct of NULLs
        return F.when(col.isNotNull(), F.struct(*parts))
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        return F.transform(
            col, lambda x: _align_expr(x, src.elementType, dst.elementType)
        )
    if isinstance(src, T.MapType) and isinstance(dst, T.MapType):
        out = col
        if src.keyType != dst.keyType and _lossless_cast(
            src.keyType, dst.keyType
        ):
            # statically injective and total (integral widening, →string
            # from integral/boolean, float→double): no collision or NULL
            # key is possible, so the per-row probe below is pure
            # overhead — cast directly (review r12)
            out = F.transform_keys(out, lambda k, v: k.cast(dst.keyType))
        elif src.keyType != dst.keyType:
            # A lossy key cast ('1' and '01' both → int 1, or a
            # non-castable key → NULL) used to surface as Spark's bare
            # duplicate-map-key/null-key error at write execution, far
            # from the cause (review r12). Validate first and raise a
            # message that names the align step and the type pair.
            # try_cast: under ANSI (Spark 4 default) a plain cast throws
            # CAST_INVALID_INPUT before this validation could run; the
            # NULL it yields instead is exactly what the exists() probe
            # detects. The committed transform_keys below keeps the
            # strict cast — it only evaluates after validation passed.
            casted = F.transform(
                F.map_keys(col), lambda k: k.try_cast(dst.keyType)
            )
            ok = col.isNull() | (
                (F.size(F.array_distinct(casted)) == F.size(F.map_keys(col)))
                & ~F.exists(casted, lambda k: k.isNull())
            )
            msg = (
                "schema alignment: casting map keys from "
                f"{src.keyType.simpleString()} to "
                f"{dst.keyType.simpleString()} collided or produced NULL "
                "keys for some row — the batch's key values do not "
                "survive the live table's key type; fix the batch or "
                "re-create the table with the wider key type"
            )
            out = F.when(
                F.assert_true(ok, F.lit(msg)).isNull(),
                F.transform_keys(out, lambda k, v: k.cast(dst.keyType)),
            )
        if src.valueType != dst.valueType:
            out = F.transform_values(
                out, lambda k, v: _align_expr(v, src.valueType, dst.valueType)
            )
        return out
    return col.cast(dst)


def _align_to(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project df to the target schema: missing fields → NULL, extra fields
    kept (they evolve the table); nested structs aligned recursively BY
    NAME (see _align_expr)."""
    cols = []
    have = {f.name for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            src = df.schema[f.name].dataType
            cols.append(
                _align_expr(F.col(f.name), src, f.dataType).alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    for f in df.schema.fields:
        if f.name not in {t.name for t in target.fields}:
            cols.append(F.col(f.name))
    return df.select(*cols)


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Existence through the SAME resolution the writes use. A
    scheme-less path resolves against ``fs.defaultFS`` (_hadoop_fs), so
    checking the driver's local disk for it would report an existing
    HDFS/object-store table as absent — and write_table would then run
    the caller's append as mode("overwrite"), destroying the table
    (review r11). Only an explicit ``file:`` scheme may shortcut."""
    if path.startswith("file:"):
        return os.path.exists(path.removeprefix("file:"))
    fs, p, _ = _hadoop_fs(spark, path)
    return fs.exists(p)


def _hadoop_fs(spark: SparkSession, uri: str):
    """Resolve ``uri`` through the Hadoop FileSystem API — the one
    abstraction that makes ``file://``, ``s3a://``, ``gs://``, ``hdfs://``
    (and anything else with a connector jar on the classpath) share a single
    code path. Returns ``(fs, path, jvm)``. Paths with no scheme resolve
    against ``fs.defaultFS`` (``file:///`` in local mode), so local unit
    tests exercise exactly the calls a remote object store would."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(uri)
    return p.getFileSystem(conf), p, jvm


def _refuse_nonpath_layout(
    spark: SparkSession, warehouse: str, table_name: str,
    op: str, manifest_alt: str, snapshot_alt: str,
) -> None:
    """Path-layout reads/writes must not touch a versioned table. On a
    manifest (ACID) table a root glob hits versions/ JSON or
    double-counts pre-GC rewrite files, and a root ``mode("overwrite")``
    clobbers every committed manifest; on a snapshot table readers only
    see the committed ``_versions`` tip, so a root write either errors
    ("Unable to infer schema" — Spark hides the _-prefixed data) or, with
    autodetect, lands files NO reader will ever return. Fail at the
    operation with the right tool's name instead (review r12)."""
    from popelines_spark.manifest import is_manifest_table

    if is_manifest_table(spark, warehouse, table_name):
        raise ValueError(
            f"{op}: {table_name!r} is a manifest (ACID) table; its files "
            f"are version-addressed and immutable — use {manifest_alt}"
        )
    if is_snapshot_table(spark, warehouse, table_name):
        raise ValueError(
            f"{op}: {table_name!r} is a snapshot-versioned table; readers "
            f"only see the committed tip — use {snapshot_alt}"
        )


def compact_table(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    target_file_bytes: int = 128 << 20,
) -> tuple[int, int]:
    """Rewrite a parquet table into ~``target_file_bytes`` files — the
    hygiene job every append-heavy table needs (incremental loads and
    streaming sinks accrete small files; at 100 TB a scan's task count and
    footer overhead are governed by file count). Returns
    (files_before, files_after).

    Single-writer semantics, NO concurrent readers (ADVICE r2): the swap is
    two non-atomic renames, so between them the table path briefly does not
    exist, and removing the backup can delete files an in-flight reader
    already listed. Readers never see HALF-written data (the staging dir is
    complete before the first rename), but they can hit a transient
    missing-path error. For concurrent-reader safety use the
    snapshot-versioned layout (``write_table_snapshot`` /
    ``read_table_snapshot`` / ``compact_table_snapshot`` below), which
    replaces the rename swap with an atomic commit-marker flip; BigQuery
    does the equivalent server-side (the reference never sees it). This
    in-place variant stays for plain-layout tables that external tools
    read by path.

    All filesystem traffic goes through the Hadoop FileSystem API, so the
    same code path serves ``file://`` (unit-tested), ``s3a://``, ``gs://``
    and ``hdfs://`` wherever the connector jars exist. Note the object-store
    caveat: on S3/GCS "rename" is copy+delete (O(bytes), not O(1)), so the
    swap window is wider there — the manifest-layer advice above applies
    doubly."""
    import math

    # the snapshot arm matters as much as the manifest one: a recursive
    # file listing here would sweep EVERY version dir into one flat
    # rewrite, destroying the committed layout (review r12)
    _refuse_nonpath_layout(spark, warehouse, table_name, "compact_table",
                           "compact_manifest_table",
                           "compact_table_snapshot")
    path = table_path(warehouse, table_name)
    fs, root, jvm = _hadoop_fs(spark, path)
    HPath = jvm.org.apache.hadoop.fs.Path

    def _parquet_files(p):
        out, total = 0, 0
        it = fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().endswith(".parquet"):
                out += 1
                total += st.getLen()
        return out, total

    n_files, total = _parquet_files(root)
    n_out = max(1, math.ceil(total / target_file_bytes))
    stats_before = read_table_stats(spark, warehouse, table_name)
    pcols = _detect_partition_cols(spark, path)
    df = spark.read.parquet(path)
    staging = HPath(root.toString() + ".__compacting")
    backup = HPath(root.toString() + ".__old")
    fs.delete(staging, True)
    if pcols:
        # directory-partitioned table: compaction must PRESERVE the
        # pruning layout (a flat rewrite would silently destroy it) —
        # hash on the partition columns so each value lands in one task
        # → few files per partition directory. maxRecordsPerFile caps
        # the size a skewed partition value can force through that one
        # task: without it a 200 GB day becomes ONE 200 GB file, the
        # opposite of the target_file_bytes hygiene goal (review r11)
        rows_before = (stats_before or {}).get("rows") or 0
        per_file = (
            max(1, int(rows_before * target_file_bytes / max(total, 1)))
            if rows_before else 0
        )
        w = df.repartition(*pcols).write.partitionBy(*pcols)
        if per_file:
            w = w.option("maxRecordsPerFile", per_file)
        w.parquet(staging.toString())
    else:
        df.repartition(n_out).write.parquet(staging.toString())
    fs.delete(backup, True)
    if not fs.rename(root, backup):
        raise IOError(f"compact_table: rename {root} -> {backup} failed")
    if not fs.rename(staging, root):
        if not fs.rename(backup, root):  # roll the live table back
            raise IOError(
                f"compact_table: rename {staging} -> {root} failed AND "
                f"the rollback {backup} -> {root} also failed — the "
                f"table's data is intact at {backup}; restore it by "
                "renaming that directory back before reading"
            )
        raise IOError(f"compact_table: rename {staging} -> {root} failed")
    fs.delete(backup, True)
    after, _ = _parquet_files(root)
    if stats_before is not None:
        # rows/NDV/skew are untouched by compaction — only the byte
        # layout moved; refresh the byte-derived fields and carry the
        # stats forward instead of losing them with the old directory
        carry_stats_forward(spark, warehouse, table_name, stats_before)
    return n_files, after


def put_object(spark: SparkSession, local_file: str, dest_uri: str) -> None:
    """popelines/main.py:157-166 — upload a local file to an object store.
    One Hadoop-FS code path for every scheme: ``copyFromLocalFile`` creates
    parent directories and streams through ``fs.create``, so the identical
    call serves ``file://`` (unit-tested), ``s3a://`` and ``gs://``."""
    fs, dst, jvm = _hadoop_fs(spark, dest_uri)
    src = jvm.org.apache.hadoop.fs.Path("file:" + os.path.abspath(local_file))
    fs.copyFromLocalFile(False, True, src, dst)


def analyze_table(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    broadcast_threshold_bytes: int = 10 << 20,
    key_columns: list[str] | None = None,
) -> dict:
    """Collect table statistics — row count, total bytes, per-column
    null count / min / max / approx NDV — and write them as
    ``_stats.json`` beside the table (Hadoop FileSystem API: same code
    path for file://, s3a://, gs://). Returns the stats dict, including
    ``suggest_broadcast`` — whether the table fits under the broadcast
    threshold — so a planner (or a human) can decide join strategy from
    at-rest metadata instead of a live scan.

    This is the ANALYZE TABLE / compute-statistics half of the
    maintenance pair with compact_table: stats age with appends — rerun
    after loads. One aggregation pass (all column stats in one scan:
    conditional aggregates + approx_count_distinct partials); only the
    one stats row is collected.

    ``key_columns`` names columns this table is JOINED or GROUPED on:
    for each, one extra keyed count records the key-frequency skew
    profile under ``stats["keys"][col]`` — ``max_key_rows`` /
    ``mean_key_rows`` / ``skew_ratio`` plus the top-5 heavy keys — the
    input ``operators/skew.plan_skew_salt`` uses to decide salted-join
    rewrites the same way ``plan_runtime_filter`` consumes NDV. Cost is
    one groupBy shuffle per named column (ANALYZE-time, never
    query-time); only 5 rows per column are collected. When
    ``key_columns`` is omitted, the key columns of the EXISTING stats
    file are re-profiled — "re-run analyze_table after appends" must
    refresh the skew profile, not silently drop it and deactivate
    ``skew="auto"``.
    """
    import json

    from pyspark.sql import functions as F

    path = table_path(warehouse, table_name)
    if key_columns is None:
        prev = read_table_stats(spark, warehouse, table_name)
        key_columns = list((prev or {}).get("keys") or {}) or None
    # a manifest (ACID) table must profile its LIVE tip, not the
    # directory: copy-on-write DML leaves dead files on disk until GC,
    # and a plain glob would double-count every rewritten row (lazy
    # import: manifest.py imports this module)
    from popelines_spark.manifest import is_manifest_table

    manifest_layout = is_manifest_table(spark, warehouse, table_name)
    if manifest_layout:
        from popelines_spark.manifest import read_manifest_table

        df = read_manifest_table(spark, warehouse, table_name)
    elif is_snapshot_table(spark, warehouse, table_name):
        df = read_table_snapshot(spark, warehouse, table_name)
    else:
        df = read_table_evolved(spark, warehouse, table_name)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    flat_cols = [
        f.name for f in df.schema.fields
        if not isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType))
    ]
    for c in flat_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
            F.approx_count_distinct(c).alias(f"__ndv_{c}"),
            # a MERGEABLE NDV summary alongside the point estimate: the
            # Datasketches HLL binary lets update_stats_increment fold an
            # appended batch's sketch into this one in O(batch) instead of
            # re-scanning the table (cast-to-string: the sketch type only
            # ingests integral/string/binary; distinct values stay distinct)
            F.base64(
                F.hll_sketch_agg(F.col(c).cast("string"))
            ).alias(f"__hll_{c}"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()

    fs, root, jvm = _hadoop_fs(spark, path)
    if manifest_layout:
        from popelines_spark.manifest import live_file_bytes

        total_bytes = live_file_bytes(spark, warehouse, table_name)
    else:
        total_bytes = fs.getContentSummary(root).getLength()
    # Broadcast limits are about IN-MEMORY size but total_bytes is on-disk
    # compressed parquet, which commonly expands 3-10× when decoded —
    # suggest_broadcast applies a conservative expansion factor so the flag
    # never recommends broadcasting a table that blows executor memory
    # (ADVICE r5). est_memory_bytes is the estimate the decision uses.
    expansion = 5
    nested_cols = [
        f.name for f in df.schema.fields if f.name not in flat_cols
    ]
    stats = {
        "table": table_name,
        "rows": row["__rows"],
        "total_bytes": int(total_bytes),
        "est_memory_bytes": int(total_bytes) * expansion,
        "suggest_broadcast": int(total_bytes) * expansion
        <= broadcast_threshold_bytes,
        # recorded so layout-only rewrites (compact/relayout) can
        # re-derive suggest_broadcast with the caller's threshold
        "broadcast_threshold_bytes": broadcast_threshold_bytes,
        # nested (struct/array/map) columns have no per-column stats row —
        # named here so their absence from `columns` is visible, not silent
        "skipped_nested_columns": nested_cols,
        "columns": {
            c: {
                "type": df.schema[c].dataType.simpleString(),
                "nulls": row[f"__nulls_{c}"],
                "min": row[f"__min_{c}"],
                "max": row[f"__max_{c}"],
                "approx_ndv": row[f"__ndv_{c}"],
                "ndv_sketch": row[f"__hll_{c}"],
            }
            for c in flat_cols
        },
    }
    for kc in key_columns or []:
        if kc not in flat_cols:
            raise ValueError(
                f"analyze_table: key column {kc!r} is not a flat column of "
                f"{table_name!r} (have {sorted(flat_cols)})"
            )
        top = (
            df.groupBy(kc)
            .agg(F.count(F.lit(1)).alias("__key_rows"))
            .orderBy(F.desc("__key_rows"), F.col(kc).cast("string"))
            .limit(5)
            .collect()
        )
        max_key_rows = int(top[0]["__key_rows"]) if top else 0
        ndv = max(1, int(stats["columns"][kc]["approx_ndv"] or 1))
        mean_key_rows = stats["rows"] / ndv
        stats.setdefault("keys", {})[kc] = {
            "max_key_rows": max_key_rows,
            "mean_key_rows": round(mean_key_rows, 2),
            "skew_ratio": round(max_key_rows / max(mean_key_rows, 1e-9), 2),
            "top_keys": [
                {"value": str(r[kc]), "rows": int(r["__key_rows"])}
                for r in top
            ],
        }
    _write_stats(fs, jvm, path, stats)
    return stats


def _write_stats(fs, jvm, path: str, stats: dict) -> None:
    import json

    stats_path = jvm.org.apache.hadoop.fs.Path(path + "/_stats.json")
    out = fs.create(stats_path, True)
    out.write(bytearray(json.dumps(stats, indent=1).encode()))
    out.close()


def carry_stats_forward(
    spark: SparkSession, warehouse: str, table_name: str, stats: dict
) -> dict:
    """Re-attach ANALYZE stats after a LAYOUT-ONLY rewrite (compaction,
    relayout): rows/NDV/min-max/skew are still exact — only the byte
    layout moved — so instead of losing the stats with the old
    directory, refresh the byte-derived fields from the new files and
    write the rest forward. ``suggest_broadcast`` re-derives with the
    threshold recorded at ANALYZE time."""
    path = table_path(warehouse, table_name)
    fs, root, jvm = _hadoop_fs(spark, path)
    total_bytes = int(fs.getContentSummary(root).getLength())
    expansion = 5
    threshold = int(stats.get("broadcast_threshold_bytes") or (10 << 20))
    stats = dict(stats)
    stats["total_bytes"] = total_bytes
    stats["est_memory_bytes"] = total_bytes * expansion
    stats["suggest_broadcast"] = total_bytes * expansion <= threshold
    _write_stats(fs, jvm, path, stats)
    return stats


def _merge_minmax(type_str: str, old: str | None, new: str | None):
    """Typed min/max merge of two cast-to-string stat values.

    ISO-formatted date/timestamp strings and booleans compare correctly
    lexicographically; numerics must compare as numbers ("9" > "10"
    lexicographically). Returns (min, max) as strings."""
    vals = [v for v in (old, new) if v is not None]
    if not vals:
        return None, None
    # anchored match, not substring: 'interval day to second' contains
    # 'int' but its min/max strings are not float()-parseable
    numeric = re.match(
        r"(tinyint|smallint|integer|int|bigint|long|float|double|decimal)\b",
        type_str.strip().lower(),
    )
    key = (lambda v: float(v)) if numeric else (lambda v: v)
    return min(vals, key=key), max(vals, key=key)


def update_stats_increment(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    appended: DataFrame,
) -> dict | None:
    """Fold an appended batch into the table's ANALYZE stats in
    O(batch) — the incremental half of the stats lifecycle.

    ``analyze_table`` is one full scan; appending a 1 GB batch to a
    100 TB table must not cost a 100 TB re-scan to keep the planner
    current. Every merged field has an exact or mergeable-summary
    update rule:

      - rows / per-column null counts: add;
      - min / max: typed two-value merge (``_merge_minmax``);
      - approx NDV: Datasketches HLL union — ``analyze_table`` stores
        each column's sketch binary (``ndv_sketch``), the batch is
        sketched with the same ``hll_sketch_agg``, and the union's
        estimate replaces ``approx_ndv`` (error bounds identical to a
        full-table sketch: HLL union is lossless);
      - bytes / suggest_broadcast: re-derived from the filesystem
        (exact, O(file listing));
      - columns NEW to the table (add-only evolution): batch profile,
        plus one null per pre-existing row;
      - the ``keys`` skew profile CANNOT be merged (the same key may
        span batches) — it is kept as a LOWER BOUND and flagged
        ``keys_stale`` for the next full ANALYZE.

    Returns the merged stats, or None when there is nothing to merge
    into (no ``_stats.json``, or one written before sketches existed) —
    callers fall back to ``_mark_stats_stale``.
    """
    from pyspark.sql import functions as F

    # Advisory pre-checks WITHOUT the lock: when the stats file is
    # absent / stale / pre-sketch there is nothing to fold, so don't pay
    # the batch aggregation at all. (A stats file appearing between this
    # read and the locked re-read just means one stale-mark — honest and
    # recoverable by the next full ANALYZE.)
    pre = read_table_stats(spark, warehouse, table_name)
    if not _stats_mergeable(pre):
        return None
    # The O(batch) profile aggregation runs BEFORE the lock is claimed:
    # holding `_stats.json.__lock` across a Spark job meant a fold
    # outliving the 600 s breaker horizon got its live lock broken — a
    # second writer entered (last-write-wins undercount) and the original
    # holder's finally then deleted the SECOND writer's lock, cascading
    # (review r12). Pre-computed, the hold is ~2 metadata ops + one
    # O(columns) local-frame job.
    profile = _profile_batch(appended)

    # the read-fold-write below is not atomic: two concurrent appends
    # both folding would last-write-win, permanently undercounting one
    # batch while the file claims freshness. Serialize via an atomic
    # lock claim; the LOSER marks the stats stale (the honest signal —
    # a later full ANALYZE recovers) instead of racing (review r11).
    path = table_path(warehouse, table_name)
    fs, _root, jvm = _hadoop_fs(spark, path)
    from popelines_spark.manifest import _claim_path

    lock = f"{path}/_stats.json.__lock"
    HPath = jvm.org.apache.hadoop.fs.Path
    claimed = _claim_path(fs, lock, jvm)
    if not claimed:
        # a holder that died must not leave stats PERMANENTLY stale
        # (every future fold would lose the claim and re-mark stale,
        # even after a fresh ANALYZE) — break an over-age lock, same
        # presumed-dead lease as every marker in this repo
        import time as _time

        try:
            st = fs.getFileStatus(HPath(lock))
            if _time.time() * 1000.0 - st.getModificationTime() > 600_000:
                fs.delete(HPath(lock), False)
                claimed = _claim_path(fs, lock, jvm)
        except Exception:
            claimed = _claim_path(fs, lock, jvm)  # vanished: retry once
    if not claimed:
        _mark_stats_stale(spark, path)
        return None
    # identity of OUR claim: a breaker that (wrongly) broke a live lock
    # recreates the file with a later mtime — the verified delete below
    # then leaves the successor's lock alone instead of cascading.
    # The stat is RETRIED once; if ownership is still unknowable the
    # release below SKIPS the delete (the staleness breaker reclaims the
    # leaked lock) — an unconditional delete here could remove a
    # successor's live lock, recreating exactly the cascade the
    # verified release exists to stop (ADVICE r12)
    try:
        own_mtime = fs.getFileStatus(HPath(lock)).getModificationTime()
    except Exception:
        try:
            own_mtime = fs.getFileStatus(HPath(lock)).getModificationTime()
        except Exception:
            own_mtime = None
    try:
        return _update_stats_locked(
            spark, warehouse, table_name, appended, profile
        )
    finally:
        _release_verified_lock(fs, HPath(lock), own_mtime)


def _release_verified_lock(fs, lock_hpath, own_mtime) -> None:
    """Delete ``lock_hpath`` only when it is PROVABLY still ours —
    current mtime equals the one recorded at claim time. Ownership
    unknowable (``own_mtime is None``) or mtime mismatch ⇒ leave the
    lock for the staleness breaker: deleting blind could remove a
    successor's live lock after a wrongful break, cascading (review
    r12 + ADVICE r12). Lock ABSENCE is a clean no-op; any other stat
    failure surfaces rather than silently leaking a held lock for the
    full breaker horizon."""
    try:
        st = fs.getFileStatus(lock_hpath)
    except Exception as exc:
        if "FileNotFound" not in str(exc) \
                and "not exist" not in str(exc).lower():
            raise
        return
    if own_mtime is not None and st.getModificationTime() == own_mtime:
        fs.delete(lock_hpath, False)


def _stats_mergeable(stats: dict | None) -> bool:
    """True when an incremental fold into ``stats`` is sound: the file
    exists, no prior fold was lost (``stale``), and NDV sketches are
    present to union into (pre-sketch files need a full re-ANALYZE).

    A ``stale`` flag means a previous append was never folded in —
    merging a new batch and clearing the flag would claim freshness
    while silently missing that append's rows forever."""
    if not stats or not stats.get("columns"):
        return False
    if stats.get("stale"):
        return False
    if not any(
        c.get("ndv_sketch") for c in stats["columns"].values()
    ) and int(stats.get("rows") or 0) > 0:
        return False
    return True


def _profile_batch(appended: DataFrame) -> dict:
    """One O(batch) aggregation over the appended frame: row count and
    per-flat-column nulls / min / max / HLL sketch. Independent of the
    table's stats file, so callers run it BEFORE claiming the stats
    lock (review r12)."""
    from pyspark.sql import functions as F

    flat_cols = [
        f.name for f in appended.schema.fields
        if not isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType))
    ]
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in flat_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
            F.base64(
                F.hll_sketch_agg(F.col(c).cast("string"))
            ).alias(f"__hll_{c}"),
        ]
    row = appended.agg(*aggs).collect()[0].asDict()
    return {"row": row, "flat_cols": flat_cols}


def _update_stats_locked(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    appended: DataFrame,
    profile: dict,
) -> dict | None:
    from pyspark.sql import functions as F

    # authoritative re-read under the lock (the caller's pre-check read
    # was advisory — another writer may have folded since)
    stats = read_table_stats(spark, warehouse, table_name)
    if not _stats_mergeable(stats):
        return None
    row, flat_cols = profile["row"], profile["flat_cols"]
    batch_rows = int(row["__rows"])

    old_rows = int(stats.get("rows") or 0)
    stats = dict(stats)
    stats["rows"] = old_rows + batch_rows
    cols = dict(stats["columns"])
    # one tiny local frame unions ALL columns' sketches in one job
    pairs = [
        (c, (cols.get(c) or {}).get("ndv_sketch"), row[f"__hll_{c}"])
        for c in flat_cols
    ]
    merged_sketch: dict[str, tuple[str | None, int]] = {}
    if pairs:
        pdf = spark.createDataFrame(
            pairs, "col string, old_b64 string, new_b64 string"
        )
        u = F.when(
            F.col("old_b64").isNull(), F.unbase64("new_b64")
        ).when(
            F.col("new_b64").isNull(), F.unbase64("old_b64")
        ).otherwise(
            F.hll_union(
                F.unbase64("old_b64"), F.unbase64("new_b64"), True
            )
        )
        for r in pdf.select(
            "col",
            F.base64(u).alias("sketch"),
            F.coalesce(
                F.hll_sketch_estimate(u), F.lit(0)
            ).alias("ndv"),
        ).collect():
            merged_sketch[r["col"]] = (r["sketch"], int(r["ndv"]))
    for c in flat_cols:
        new_entry = {
            "type": appended.schema[c].dataType.simpleString(),
            "nulls": int(row[f"__nulls_{c}"]),
            "min": row[f"__min_{c}"],
            "max": row[f"__max_{c}"],
        }
        old_entry = cols.get(c)
        if old_entry is None:
            # add-only evolution: pre-existing rows read NULL for it
            new_entry["nulls"] += old_rows
        else:
            new_entry["type"] = old_entry.get("type", new_entry["type"])
            new_entry["nulls"] += int(old_entry.get("nulls") or 0)
            lo, hi = _merge_minmax(
                new_entry["type"], old_entry.get("min"), new_entry["min"]
            )
            _, hi2 = _merge_minmax(
                new_entry["type"], old_entry.get("max"), new_entry["max"]
            )
            new_entry["min"], new_entry["max"] = lo, hi2
        sketch, ndv = merged_sketch.get(c, (None, 0))
        new_entry["ndv_sketch"] = sketch
        new_entry["approx_ndv"] = ndv
        cols[c] = new_entry
    for c, old_entry in cols.items():
        # table columns ABSENT from the batch (autodetect append with a
        # narrower frame): mergeSchema reads NULL for every appended row,
        # so the null count grows; min/max/NDV are untouched by NULLs
        if c not in {f.name for f in appended.schema.fields}:
            e = dict(old_entry)
            e["nulls"] = int(e.get("nulls") or 0) + batch_rows
            cols[c] = e
    stats["columns"] = cols
    stats.pop("stale", None)
    stats["incremental_appends"] = int(
        stats.get("incremental_appends") or 0
    ) + 1
    if stats.get("keys"):
        stats["keys_stale"] = True  # skew profile is now a lower bound
    path = table_path(warehouse, table_name)
    fs, root, jvm = _hadoop_fs(spark, path)
    from popelines_spark.manifest import is_manifest_table, live_file_bytes

    if is_manifest_table(spark, warehouse, table_name):
        total_bytes = live_file_bytes(spark, warehouse, table_name)
    else:
        total_bytes = int(fs.getContentSummary(root).getLength())
    expansion = 5
    threshold = int(stats.get("broadcast_threshold_bytes") or (10 << 20))
    stats["total_bytes"] = total_bytes
    stats["est_memory_bytes"] = total_bytes * expansion
    stats["suggest_broadcast"] = total_bytes * expansion <= threshold
    _write_stats(fs, jvm, path, stats)
    return stats


def read_table_stats(spark: SparkSession, warehouse: str, table_name: str) -> dict | None:
    """Read the ``_stats.json`` written by analyze_table; None if absent."""
    import json

    path = table_path(warehouse, table_name)
    fs, root, jvm = _hadoop_fs(spark, path)
    sp = jvm.org.apache.hadoop.fs.Path(path + "/_stats.json")
    if not fs.exists(sp):
        return None
    stream = fs.open(sp)
    try:
        # py4j can't fill a Python bytearray in place — drain JVM-side
        text = jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
        return json.loads(text)
    finally:
        stream.close()


# --- snapshot-versioned tables (atomic compaction; VERDICT r6 next #6) ---
#
# Layout:   <table>/_versions/v{N:08d}/  parquet files + _COMMITTED marker
# Protocol: a version becomes visible the instant its _COMMITTED marker
# exists; readers resolve "the table" = highest committed version. There
# is NO pointer rename anywhere — visibility is one atomic object
# creation, which holds on file:// and HDFS (create+close) and on modern
# object stores (a single small PUT is atomic per-object), sidestepping
# the copy+delete rename caveat that made plain compact_table unsafe for
# concurrent readers. Version directories are immutable once committed,
# so a reader that resolved v{N} keeps a consistent snapshot even while
# v{N+1} lands — exactly the manifest-lite shape of Delta/Iceberg,
# reduced to the single capability compaction needs.

_VERSIONS_DIR = "_versions"
_COMMIT_MARKER = "_COMMITTED"


def _committed_versions(fs, root, jvm) -> list[int]:
    HPath = jvm.org.apache.hadoop.fs.Path
    vroot = HPath(root.toString() + "/" + _VERSIONS_DIR)
    if not fs.exists(vroot):
        return []
    out = []
    for st in fs.listStatus(vroot):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("v")):
            continue
        try:
            n = int(name[1:])
        except ValueError:
            continue
        if fs.exists(HPath(st.getPath(), _COMMIT_MARKER)):
            out.append(n)
    return sorted(out)


#: A snapshot writer holds its .__reserved marker only for the duration
#: of one O(batch) parquet write; anything older is PRESUMED dead.
#: Compaction's rebase check BREAKS (deletes) such a marker before
#: standing — and the commit flip re-checks its own marker
#: (_flip_snapshot_commit), so a live-but-slow writer that outlived the
#: horizon retracts and retries instead of committing rows a superseding
#: rewrite never saw (review r12). Tune above the longest batch write.
_STALE_RESERVATION_SEC = 900


def _stale_reservation_sec() -> float:
    return float(
        os.environ.get(
            "POPELINES_SNAPSHOT_RESERVATION_STALE_SEC",
            _STALE_RESERVATION_SEC,
        )
    )


def _snapshot_crash_point(name: str) -> None:
    """Fault injection for the snapshot-layout crash drills
    (tests/test_snapshot_chaos.py) — same contract as
    manifest._crash_point: when the environment names this point, die
    the way a SIGKILL'd writer dies (``os._exit``, no finally blocks),
    so the on-disk debris is exactly what real code produces up to that
    instant. Production cost: one env lookup against an unset var."""
    if os.environ.get("POPELINES_SNAPSHOT_CRASH_POINT") == name:
        os._exit(42)


def _reserved_versions(fs, root, jvm) -> list[tuple[int, float]]:
    """Outstanding ``v*.__reserved`` markers under the versions dir as
    ``(version, age_seconds)`` pairs — the in-flight half of the commit
    state that :func:`_committed_versions` can't see."""
    import time

    HPath = jvm.org.apache.hadoop.fs.Path
    vroot = HPath(root.toString() + "/" + _VERSIONS_DIR)
    if not fs.exists(vroot):
        return []
    now_ms = time.time() * 1000
    out = []
    for st in fs.listStatus(vroot):
        name = st.getPath().getName()
        if not name.endswith(".__reserved") or not name.startswith("v"):
            continue
        try:
            n = int(name[1:].split(".", 1)[0])
        except ValueError:
            continue
        out.append((n, max(0.0, (now_ms - st.getModificationTime()) / 1000)))
    return sorted(out)


def snapshot_version_path(warehouse: str, table_name: str, version: int) -> str:
    return (
        f"{table_path(warehouse, table_name)}/{_VERSIONS_DIR}/v{version:08d}"
    )


class ConcurrentSnapshotWriteError(RuntimeError):
    """A snapshot-layout compaction lost the race to an intervening
    append: its rewrite of the pre-append tip was retracted and the
    caller must retry against the new tip. (The manifest layout
    handles this transparently via linearized commits — concurrent
    writers belong there; this error keeps the simpler snapshot
    layout's single-writer contract honest instead of silently
    dropping the appended rows.)"""


def write_table_snapshot(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    df: DataFrame,
    n_files: int | None = None,
) -> int:
    """Write ``df`` as the table's next committed version; returns the new
    version id. Concurrent writers are serialized by an atomic
    reservation claim (loser retries on the next id), so two compactions
    racing produce two distinct versions, never a corrupt mix. The claim
    goes through the active ``manifest.CommitArbiter`` — ONE plug point
    covers both layouts: the default is genuinely atomic on file://
    (POSIX O_CREAT|O_EXCL) and HDFS (NameNode-atomic create); object
    stores without conditional create (plain s3a://) need an arbiter
    backed by the store's conditional PUT, installed via
    ``manifest.set_commit_arbiter`` (the same caveat table as the
    manifest commit lock, in one place)."""
    from popelines_spark.manifest import get_commit_arbiter

    fs, root, jvm = _hadoop_fs(spark, table_path(warehouse, table_name))
    HPath = jvm.org.apache.hadoop.fs.Path
    # the claim primitive (java.io.File.createNewFile on file://) does
    # not create parents — same mkdirs manifest._reserve_version does
    fs.mkdirs(HPath(root.toString() + "/" + _VERSIONS_DIR))
    existing = _committed_versions(fs, root, jvm)
    version = (existing[-1] + 1) if existing else 1
    attempts = 0
    arbiter = get_commit_arbiter()
    while True:
        vpath = snapshot_version_path(warehouse, table_name, version)
        reserved = HPath(vpath + ".__reserved")
        # arbiter.claim: exactly one writer wins id N. The arbiter seam
        # matters on BOTH ends of the spectrum — Hadoop's
        # LocalFileSystem implements create(overwrite=False) as
        # exists-check-then-create (two local racers could both "win"),
        # and raw object stores need the store's conditional PUT; the
        # default routes file:// through POSIX O_CREAT|O_EXCL and lets
        # non-already-exists errors SURFACE instead of spinning ids
        # (review r12, unifying with manifest._claim_marker)
        if arbiter.claim(fs, vpath + ".__reserved", jvm):
            # the marker is deleted AFTER a commit, so a claim won with a
            # STALE committed listing can land on an already-committed id
            # — recheck the tip under the claim and move past it, else
            # mode("overwrite") below would destroy the committed dir
            # (same recheck manifest._reserve_version does; review r12)
            latest = _committed_versions(fs, root, jvm)
            if latest and latest[-1] >= version:
                fs.delete(reserved, False)
                version = latest[-1] + 1
                continue
            break
        attempts += 1
        if attempts > 10_000:
            raise RuntimeError(
                f"write_table_snapshot: {attempts} reservation "
                f"collisions under {root} — stale .__reserved files?"
            )
        version += 1
    # OWNER IDENTITY of the lease (ADVICE r12): record the marker's
    # mtime at claim time. Without it the flip's exists() check re-arms
    # when a compaction breaks our stale marker and a NEW claimant
    # (another write_table_snapshot on the same id, or vacuum's
    # _delete_dir_under_claim) recreates the SAME path — an
    # identity-less flip would then commit into a dir the new owner is
    # mid-overwrite/mid-delete. The stat is retried once; a marker we
    # created microseconds ago failing to stat twice is an FS fault
    # worth surfacing, not papering over with an identity-less lease.
    try:
        own_mtime = fs.getFileStatus(reserved).getModificationTime()
    except Exception:
        own_mtime = fs.getFileStatus(reserved).getModificationTime()
    _snapshot_crash_point("after_reserve")  # debris: bare .__reserved
    # r13 (guide §6): same REBALANCE output sizing as the manifest
    # append — a snapshot version is a full-table rewrite, so carrying
    # the input's partition count writes one tiny file per partition on
    # small tables and unsized files on big ones; AQE sizes both.
    out = df.repartition(n_files) if n_files else rebalance_output(df)
    out.write.mode("overwrite").parquet(vpath)
    # debris: .__reserved + a torn data dir with no _COMMITTED marker
    _snapshot_crash_point("after_data_write")
    _flip_snapshot_commit(fs, vpath, reserved, jvm, own_mtime=own_mtime)
    return version


def _flip_snapshot_commit(
    fs, vpath: str, reserved, jvm, own_mtime: int | None = None
) -> None:
    """The snapshot commit's visibility flip, guarded by an
    OWNER-IDENTIFIED reservation lease check. Two distinct loss modes
    (review r12 + ADVICE r12):

    - marker GONE: a compaction presumed this writer dead (the
      ``.__reserved`` aged past the staleness horizon) and BROKE the
      marker — the base may already be superseded by a rewrite that
      never saw this version, so flipping would strand these rows
      invisibly until GC deletes them. The written data dir is
      retracted and the caller retries against the new tip.
    - marker PRESENT but NOT OURS (mtime differs from the one recorded
      at claim time): after the break, a NEW claimant recreated the
      same marker path — another writer re-using the version id, or
      vacuum's ``_delete_dir_under_claim``. The dir now belongs to that
      claimant (it may be mid-overwrite or mid-delete), so this writer
      must neither flip, nor delete the marker, nor touch the dir; it
      only raises. Its torn rows are overwritten by the new writer or
      reclaimed by the next vacuum (uncommitted dirs are invisible).

    ``own_mtime=None`` skips the identity half (legacy callers/tests);
    ``write_table_snapshot`` always passes it. Residual window: the
    stat-then-flip gap (~2 metadata ops) — the same epsilon every mtime
    lease in this repo documents, now independent of the batch-write
    duration."""
    HPath = jvm.org.apache.hadoop.fs.Path
    try:
        cur_mtime = fs.getFileStatus(reserved).getModificationTime()
    except Exception:
        cur_mtime = None
    if cur_mtime is None:
        fs.delete(HPath(vpath), True)
        raise ConcurrentSnapshotWriteError(
            f"snapshot commit of {vpath}: the version reservation was "
            "broken while writing (a compaction presumed this writer "
            "dead after the staleness horizon) — the version was "
            "retracted; retry against the new tip, or raise "
            "POPELINES_SNAPSHOT_RESERVATION_STALE_SEC above the longest "
            "batch write"
        )
    if own_mtime is not None and cur_mtime != own_mtime:
        raise ConcurrentSnapshotWriteError(
            f"snapshot commit of {vpath}: the version reservation was "
            "broken and RE-CLAIMED by another writer while writing — "
            "this writer's lease identity no longer matches; nothing "
            "was flipped or deleted (the dir belongs to the new "
            "claimant). Retry against the new tip."
        )
    # visibility flip: one atomic object creation
    fs.create(HPath(vpath + "/" + _COMMIT_MARKER), False).close()
    # debris: a COMMITTED version whose .__reserved was never deleted
    _snapshot_crash_point("after_flip")
    fs.delete(reserved, False)


def append_table_snapshot(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    df: DataFrame,
    n_files: int | None = None,
) -> int:
    """WRITE_APPEND on the snapshot layout: new version = current
    committed rows + ``df``, with the same add-only schema evolution as
    ``write_table`` (union by name, missing fields → NULL, conflicting
    primitives coerced to the live type). Readers pinned to any prior
    version are untouched; the append becomes visible in ONE commit-marker
    flip — the reference's atomic BigQuery append job
    (popelines/main.py:135-139) on a plain object store. First append on
    an empty table degrades to write_table_snapshot.

    Concurrency: SINGLE WRITER PER TABLE for appends. The reservation
    serializes version ids (racing compactions — full rewrites — stay
    safe), but this read-union-write is not rebased after the
    reservation: two RACING appends would both base on the same parent
    and the later commit would omit the earlier's rows. Concurrent
    appenders belong on the manifest layout
    (manifest.append_manifest_table), which rebases and heals.

    COST: O(table) data written per append — each version dir is
    self-contained (that is what makes reads a plain ``spark.read`` of
    one directory and retention GC a directory delete). Right for
    replace-mostly / append-rarely tables; a frequently-appended large
    table belongs on the manifest layout, whose appends write O(batch)
    and carry parent files by reference."""
    try:
        current = read_table_snapshot(spark, warehouse, table_name)
    except FileNotFoundError:
        return write_table_snapshot(
            spark, warehouse, table_name, df, n_files=n_files
        )
    target = merge_schemas(current.schema, df.schema)
    merged = _align_to(current, target).unionByName(
        _align_to(df, target), allowMissingColumns=True
    )
    # NO materialization: the union reads the current version dir while
    # the write targets a NEW dir, so streaming the plan straight into
    # the writer is safe — the localCheckpoint this used to do cached
    # O(table) unreplicated blocks per append (an executor loss failed
    # the whole job) to save only a directory re-listing (review r11)
    return write_table_snapshot(
        spark, warehouse, table_name, merged, n_files=n_files
    )


def read_table_snapshot(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    version: int | None = None,
) -> DataFrame:
    """Read a COMMITTED snapshot version (uncommitted/torn version dirs
    are invisible by construction).

    ``version=None`` reads the latest; an explicit ``version`` is TIME
    TRAVEL — any committed version still inside the retention window
    (``compact_table_snapshot(keep_versions=...)``) reads exactly as it
    was committed, the debugging/backfill affordance BigQuery gives the
    reference via table snapshots/``FOR SYSTEM_TIME AS OF``. A version
    that never existed or was retention-GC'd raises with the available
    window listed."""
    fs, root, jvm = _hadoop_fs(spark, table_path(warehouse, table_name))
    versions = _committed_versions(fs, root, jvm)
    if not versions:
        raise FileNotFoundError(
            f"no committed snapshot versions under {root}"
        )
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"snapshot version {version} of {table_name} is not available"
            f" (committed versions: {versions} — older ones may have been"
            " retention-GC'd)"
        )
    return spark.read.parquet(
        snapshot_version_path(warehouse, table_name, version)
    )


def compact_table_snapshot(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    target_file_bytes: int = 128 << 20,
    keep_versions: int = 2,
) -> tuple[int, int]:
    """Snapshot-safe compaction: read the current committed version,
    rewrite it into ~target-size files as a NEW version, commit, then GC
    versions beyond the ``keep_versions`` most recent (retention must
    exceed the longest reader; committed dirs are immutable until GC'd).
    Returns (files_before, files_after). A reader racing this sees
    exactly the old or the new file set — never a mix, never a missing
    path (the plain compact_table's documented failure mode)."""
    import math

    fs, root, jvm = _hadoop_fs(spark, table_path(warehouse, table_name))
    versions = _committed_versions(fs, root, jvm)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {root}")
    cur = snapshot_version_path(warehouse, table_name, versions[-1])
    _, curp, _ = _hadoop_fs(spark, cur)

    def _parquet_files(p):
        out, total = 0, 0
        it = fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().endswith(".parquet"):
                out += 1
                total += st.getLen()
        return out, total

    n_before, total = _parquet_files(curp)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(cur)
    new_v = write_table_snapshot(
        spark, warehouse, table_name, df, n_files=n_out
    )
    # REBASE CHECK: the reservation serializes version NUMBERS, not
    # content lineage — if an append committed between our tip read and
    # our commit, the compacted version (a rewrite of the PRE-append
    # tip) is now latest and the appended rows would vanish from the
    # live view, then be lost for good at the next GC (review r11).
    # Detect the intervening commit, retract our own version, and raise
    # for the caller to retry against the new tip.
    #
    # The committed-versions listing alone was TOCTOU-incomplete (review
    # r12): an append that RESERVED a lower number before our commit but
    # flips its _COMMITTED marker after our listing went undetected. A
    # writer deletes its .__reserved only AFTER the _COMMITTED flip, so
    # scanning reservations FIRST and committed versions SECOND leaves no
    # blind window: a racer is visible in at least one of the two scans.
    # Reservations older than the staleness horizon are PRESUMED-dead
    # writers: BREAK the marker (delete it) before standing, so a
    # live-but-slow holder that outlived the horizon finds its lease
    # gone at flip time (_flip_snapshot_commit) and retracts instead of
    # committing rows this compaction never saw — ignoring the marker
    # silently lost that batch at the next GC (review r12). A dead
    # writer's marker is crash debris either way; breaking it also
    # stops it livelocking every future compaction.
    HPath = jvm.org.apache.hadoop.fs.Path
    stale_sec = _stale_reservation_sec()
    in_flight = []
    for v, age in _reserved_versions(fs, root, jvm):
        if not (versions[-1] < v < new_v):
            continue
        if age < stale_sec:
            in_flight.append(v)
        else:
            fs.delete(
                HPath(
                    snapshot_version_path(warehouse, table_name, v)
                    + ".__reserved"
                ),
                False,
            )
    committed = _committed_versions(fs, root, jvm)
    intervening = sorted(
        set(v for v in committed if versions[-1] < v < new_v) | set(in_flight)
    )
    if intervening:
        fs.delete(
            HPath(snapshot_version_path(warehouse, table_name, new_v)),
            True,
        )
        raise ConcurrentSnapshotWriteError(
            f"compact_table_snapshot of {table_name}: version(s) "
            f"{intervening} committed or reserved in-flight while "
            f"compacting v{versions[-1]} — the compacted v{new_v} was "
            "retracted; retry to compact the new tip"
        )
    # GC: everything older than the keep_versions most recent committed
    committed = _committed_versions(fs, root, jvm)
    for v in committed[:-keep_versions] if keep_versions else committed[:-1]:
        fs.delete(
            HPath(snapshot_version_path(warehouse, table_name, v)), True
        )
    _, newp, _ = _hadoop_fs(
        spark, snapshot_version_path(warehouse, table_name, new_v)
    )
    n_after, _ = _parquet_files(newp)
    return n_before, n_after


def vacuum_snapshot_debris(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    horizon_sec: float | None = None,
) -> dict:
    """Remove crash debris from a snapshot table's ``_versions`` dir.

    Compaction's retention GC only deletes old COMMITTED versions; a
    writer that died mid-commit leaves debris no other path reclaims:

    - a bare ``.__reserved`` marker (died before/while writing data);
    - a TORN data dir — files but no ``_COMMITTED`` marker (died before
      the flip);
    - a committed version still holding its ``.__reserved`` (died
      between the flip and the marker delete — the version itself is
      fine, only the marker is debris).

    Safety rules, in order of strength:
    - an uncommitted dir with NO reservation can never become visible
      (the flip is lease-checked against the reservation,
      ``_flip_snapshot_commit``), so it is deleted at ANY age;
    - a reservation (and its torn dir) is only touched once its age
      passes ``horizon_sec`` (default: the staleness horizon) — the
      same presumed-dead lease compaction's rebase check applies. A
      live-but-slow writer whose marker we break retracts at its flip
      and retries; it never half-commits.

    Returns ``{"markers": [...], "torn_dirs": [...], "orphan_dirs":
    [...]}`` — the version ids cleaned per class. Idempotent; safe to
    run on a live table (the worst case is making a slow writer retry,
    identical to compaction's presumed-dead rule)."""
    fs, root, jvm = _hadoop_fs(spark, table_path(warehouse, table_name))
    HPath = jvm.org.apache.hadoop.fs.Path
    horizon = (
        _stale_reservation_sec() if horizon_sec is None else float(horizon_sec)
    )
    committed = set(_committed_versions(fs, root, jvm))
    out: dict[str, list[int]] = {"markers": [], "torn_dirs": [], "orphan_dirs": []}

    def _marker(v: int):
        return HPath(
            snapshot_version_path(warehouse, table_name, v) + ".__reserved"
        )

    def _delete_dir_under_claim(v: int, cls: str) -> None:
        """Delete version dir ``v`` while HOLDING its reservation.

        The reservation is the protocol's mutual-exclusion primitive:
        while we hold it no new writer can claim id ``v`` and write into
        the dir we are deleting, and the dead writer whose marker was
        broken can never flip (lease check). The commit marker is
        re-read UNDER the claim — a writer that flipped before the
        break keeps its dir; only a provably-unreachable dir is swept.
        Losing the claim race to a live writer is a skip, never a
        delete. A vacuum crash mid-claim leaves one more bare marker —
        the very debris class the next vacuum reclaims."""
        from popelines_spark.manifest import get_commit_arbiter

        if not get_commit_arbiter().claim(
            fs,
            snapshot_version_path(warehouse, table_name, v) + ".__reserved",
            jvm,
        ):
            return  # a racer claimed v — it is live, leave it alone
        try:
            dirp = HPath(snapshot_version_path(warehouse, table_name, v))
            if fs.exists(HPath(dirp, _COMMIT_MARKER)):
                return  # flipped before the marker break — live version
            if fs.exists(dirp):
                fs.delete(dirp, True)
                out[cls].append(v)
        finally:
            fs.delete(_marker(v), False)

    reserved = {v: age for v, age in _reserved_versions(fs, root, jvm)}
    for v, age in reserved.items():
        if v in committed:
            # the flip already happened; the writer's only remaining act
            # was this delete — pure debris at ANY age
            fs.delete(_marker(v), False)
            out["markers"].append(v)
            continue
        if age < horizon:
            continue  # maybe a live writer — leave the lease alone
        # break the presumed-dead writer's marker FIRST: after it is
        # gone its lease-checked flip can never succeed (same rule as
        # compaction's rebase check) — then re-claim the id ourselves
        # so no NEW writer can land on the dir mid-delete
        fs.delete(_marker(v), False)
        out["markers"].append(v)
        _delete_dir_under_claim(v, "torn_dirs")
    # orphan dirs: uncommitted, reservation already gone (broken by a
    # compaction rebase or a prior vacuum) — unreachable at any age,
    # but deleted under the same claim so a racing writer that re-used
    # the id is never half-deleted
    vroot = HPath(root.toString() + "/" + _VERSIONS_DIR)
    if fs.exists(vroot):
        for st in fs.listStatus(vroot):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("v")):
                continue
            try:
                v = int(name[1:])
            except ValueError:
                continue
            if v in committed or v in reserved or v in out["torn_dirs"]:
                continue
            _delete_dir_under_claim(v, "orphan_dirs")
    return out
