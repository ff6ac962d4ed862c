"""Manifest tables: an Iceberg-style ACID layout where a version is a
FILE LIST, not a directory of rewritten data.

The snapshot layout (io.py:write/append_table_snapshot) gives atomic
visibility and time travel but its append is copy-on-write — at 100 TB
rewriting the table per batch is the wrong cost model. Manifest tables
fix exactly that:

 - data files are immutable, written ONCE under ``data/v{N}/`` by the
   batch that created them;
 - a version is ``versions/{N}/manifest.json`` — the list of member data
   files (old + new) — made visible by the same commit-marker flip and
   create-no-overwrite version reservation as the snapshot layout, so
   concurrent writers serialize and readers never see a torn state;
 - append cost is O(batch) + one manifest write, never O(table);
 - time travel = read any retained manifest; compaction = rewrite into
   one new file set + a manifest that references ONLY it; GC = delete
   data files referenced by NO retained manifest (never by membership
   in a "latest" directory — a file can serve many versions).

Reference basis: BigQuery gives the reference atomic load jobs and
snapshot decorators (popelines/main.py:100-155's WRITE_APPEND /
WRITE_TRUNCATE); this is that contract on a bare object store, through
the same Hadoop FS calls that run against s3a:// and gs://.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from popelines_spark.io import _align_to, _hadoop_fs, table_path
from popelines_spark.schemas import merge_schemas

_COMMIT = "_COMMITTED"


def _paths(warehouse: str, name: str):
    root = table_path(warehouse, name)
    return root, f"{root}/versions", f"{root}/data"


def _committed_manifest_versions(fs, vroot, jvm) -> list[int]:
    HPath = jvm.org.apache.hadoop.fs.Path
    out = []
    p = HPath(vroot)
    if not fs.exists(p):
        return out
    for st in fs.listStatus(p):
        n = st.getPath().getName()
        if n.isdigit() and fs.exists(HPath(f"{vroot}/{n}/{_COMMIT}")):
            out.append(int(n))
    return sorted(out)


def _read_manifest(fs, vroot, version, jvm) -> dict:
    HPath = jvm.org.apache.hadoop.fs.Path
    stream = fs.open(HPath(f"{vroot}/{version}/manifest.json"))
    try:
        # py4j passes Python buffers to Java BY VALUE — a read(byte[])
        # loop mutates only the Java copy. Drain JVM-side instead.
        text = jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(text)


def _reserve_version(fs, vroot, jvm) -> int:
    HPath = jvm.org.apache.hadoop.fs.Path
    existing = _committed_manifest_versions(fs, vroot, jvm)
    version = (existing[-1] + 1) if existing else 1
    attempts = 0
    while True:
        reserved = HPath(f"{vroot}/{version}.__reserved")
        try:
            fs.mkdirs(HPath(vroot))
            fs.create(reserved, False).close()
            return version
        except Exception as exc:
            msg = str(exc)
            if (
                "FileAlreadyExists" not in msg
                and "already exists" not in msg.lower()
            ):
                raise
            attempts += 1
            if attempts > 10_000:
                raise RuntimeError(
                    f"manifest reservation spinning under {vroot}"
                ) from exc
            version += 1


def _commit_manifest(
    spark, fs, vroot, version, files: list[str], schema_json: str, jvm,
    batch_id: str | None = None,
    file_stats: dict | None = None,
) -> None:
    HPath = jvm.org.apache.hadoop.fs.Path
    vdir = f"{vroot}/{version}"
    fs.mkdirs(HPath(vdir))
    doc = {"version": version, "files": sorted(files), "schema": schema_json}
    if batch_id is not None:
        doc["batch_id"] = batch_id
    if file_stats:
        doc["file_stats"] = file_stats
    body = json.dumps(doc).encode("utf-8")
    out = fs.create(HPath(f"{vdir}/manifest.json"), True)
    try:
        out.write(body)
    finally:
        out.close()
    # visibility flip: one atomic object creation, manifest already durable
    fs.create(HPath(f"{vdir}/{_COMMIT}"), False).close()
    fs.delete(HPath(f"{vroot}/{version}.__reserved"), False)


def _list_parquet(fs, path, jvm) -> list[str]:
    HPath = jvm.org.apache.hadoop.fs.Path
    return [
        st.getPath().toString()
        for st in fs.listStatus(HPath(path))
        if st.getPath().getName().endswith(".parquet")
    ]


def append_manifest_table(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    df: DataFrame,
    n_files: int | None = None,
    batch_id: str | int | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Append ``df`` as a new version whose manifest = previous files +
    this batch's files. O(batch) data written; old files untouched.
    Add-only schema evolution: the batch is aligned to the merged schema
    (missing fields NULL, conflicting primitives coerced); EXISTING files
    stay as written — the reader supplies the evolved schema, exactly the
    parquet-mergeSchema economics of write_table.

    ``batch_id`` makes the append IDEMPOTENT: if any committed manifest
    already carries this id, the call is a no-op returning that version —
    the exactly-once contract a streaming foreachBatch sink needs across
    restarts (streaming/manifest_sink.py).

    ``stats_cols`` records the batch's min/max for those columns against
    every file the batch created — Iceberg-style scan-planning stats:
    ``read_manifest_table(prune=[(col, lo, hi)])`` then drops files whose
    recorded range misses the predicate WITHOUT opening a single footer
    (batch granularity — daily batches make this date-range pruning of
    history, the incremental-query fast path)."""
    root, vroot, droot = _paths(warehouse, table_name)
    fs, _, jvm = _hadoop_fs(spark, root)
    versions = _committed_manifest_versions(fs, vroot, jvm)
    if batch_id is not None:
        for v in versions:
            if _read_manifest(fs, vroot, v, jvm).get("batch_id") == str(
                batch_id
            ):
                return v
    prev_files: list[str] = []
    target_schema = df.schema
    if versions:
        man = _read_manifest(fs, vroot, versions[-1], jvm)
        prev_files = man["files"]
        from pyspark.sql.types import StructType

        live = StructType.fromJson(json.loads(man["schema"]))
        target_schema = merge_schemas(live, df.schema)
        df = _align_to(df, target_schema)
        target_schema = df.schema
    version = _reserve_version(fs, vroot, jvm)
    ddir = f"{droot}/v{version}"
    out = df.repartition(n_files) if n_files else df
    batch_stats = None
    if stats_cols:
        from pyspark.sql import functions as F

        out = out.localCheckpoint(eager=True)  # stats + write: one compute
        row = out.agg(
            *[F.min(c).alias(f"__lo_{c}") for c in stats_cols],
            *[F.max(c).alias(f"__hi_{c}") for c in stats_cols],
        ).collect()[0]
        def _j(v):
            # JSON-safe stat values; non-primitives (timestamps, dates,
            # decimals) become ISO-format strings, which compare
            # lexicographically consistently — pass prune bounds in the
            # same string form for those columns
            return v if isinstance(v, (int, float, str, type(None))) else str(v)

        batch_stats = {
            c: [_j(row[f"__lo_{c}"]), _j(row[f"__hi_{c}"])]
            for c in stats_cols
        }
    out.write.mode("overwrite").parquet(ddir)
    new_files = _list_parquet(fs, ddir, jvm)
    # carry forward prior per-file stats; stamp this batch's files
    prev_stats = {}
    if versions:
        prev_stats = man.get("file_stats", {})
    file_stats = dict(prev_stats)
    if batch_stats is not None:
        for f in new_files:
            file_stats[f] = batch_stats
    _commit_manifest(
        spark, fs, vroot, version,
        prev_files + new_files, json.dumps(target_schema.jsonValue()), jvm,
        batch_id=None if batch_id is None else str(batch_id),
        file_stats=file_stats,
    )
    return version


def manifest_file_list(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    version: int | None = None,
    prune: list[tuple] | None = None,
) -> list[str]:
    """The version's member files after stats pruning — the scan-planning
    primitive read_manifest_table builds on (exposed for tests/tooling).
    ``prune`` entries are (col, lo, hi) closed ranges; a file is dropped
    only when its RECORDED range provably misses one — files without
    stats for the column are always kept (pruning may keep extra files,
    never lose rows)."""
    root, vroot, _ = _paths(warehouse, table_name)
    fs, _, jvm = _hadoop_fs(spark, root)
    versions = _committed_manifest_versions(fs, vroot, jvm)
    if not versions:
        raise FileNotFoundError(f"no committed manifest versions under {root}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"manifest version {version} of {table_name} not available"
            f" (committed: {versions})"
        )
    man = _read_manifest(fs, vroot, version, jvm)
    files = man["files"]
    if prune:
        stats = man.get("file_stats", {})
        kept = []
        for f in files:
            st = stats.get(f)
            drop = False
            if st:
                for col, lo, hi in prune:
                    rng = st.get(col)
                    if rng is None or rng[0] is None or rng[1] is None:
                        continue
                    if rng[1] < lo or rng[0] > hi:
                        drop = True
                        break
            if not drop:
                kept.append(f)
        files = kept
    return files


def read_manifest_table(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    version: int | None = None,
    prune: list[tuple] | None = None,
) -> DataFrame:
    """Read a committed manifest version (latest by default; explicit
    ``version`` = time travel). The manifest's schema is applied on read,
    so pre-evolution files surface NULLs for later columns without
    mergeSchema footer sampling. ``prune`` drops files by recorded batch
    stats BEFORE Spark sees a path (manifest_file_list) — callers still
    apply the row-level predicate; pruning only shrinks the scan."""
    root, vroot, _ = _paths(warehouse, table_name)
    fs, _, jvm = _hadoop_fs(spark, root)
    versions = _committed_manifest_versions(fs, vroot, jvm)
    if not versions:
        raise FileNotFoundError(f"no committed manifest versions under {root}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"manifest version {version} of {table_name} not available"
            f" (committed: {versions})"
        )
    man = _read_manifest(fs, vroot, version, jvm)
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(man["schema"]))
    files = manifest_file_list(
        spark, warehouse, table_name, version=version, prune=prune
    )
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


def compact_manifest_table(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    n_files: int = 8,
) -> int:
    """Rewrite the current version into ``n_files`` files and commit a
    manifest referencing ONLY the rewrite — readers of prior versions
    keep their file lists; nothing is deleted here (see gc)."""
    root, vroot, droot = _paths(warehouse, table_name)
    fs, _, jvm = _hadoop_fs(spark, root)
    current = read_manifest_table(spark, warehouse, table_name)
    schema_json = json.dumps(current.schema.jsonValue())
    version = _reserve_version(fs, vroot, jvm)
    ddir = f"{droot}/v{version}"
    current.repartition(n_files).write.mode("overwrite").parquet(ddir)
    _commit_manifest(
        spark, fs, vroot, version,
        _list_parquet(fs, ddir, jvm), schema_json, jvm,
    )
    return version


def gc_manifest_table(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    keep_versions: int = 2,
) -> tuple[int, int]:
    """Drop manifests beyond the ``keep_versions`` most recent, then
    delete data files referenced by NO retained manifest. Returns
    (versions_dropped, files_deleted). Retention IS the reader contract:
    a reader pinned inside the window never loses a file, because files
    are only deleted when no retained manifest lists them."""
    root, vroot, droot = _paths(warehouse, table_name)
    fs, _, jvm = _hadoop_fs(spark, root)
    HPath = jvm.org.apache.hadoop.fs.Path
    versions = _committed_manifest_versions(fs, vroot, jvm)
    drop = versions[:-keep_versions] if keep_versions else versions
    keep = versions[len(drop):]
    retained: set[str] = set()
    for v in keep:
        retained.update(_read_manifest(fs, vroot, v, jvm)["files"])
    n_deleted = 0
    for v in drop:
        old = _read_manifest(fs, vroot, v, jvm)["files"]
        fs.delete(HPath(f"{vroot}/{v}"), True)
        for f in old:
            if f not in retained and fs.exists(HPath(f)):
                fs.delete(HPath(f), False)
                n_deleted += 1
    return len(drop), n_deleted
