"""Row-level DML on manifest tables — copy-on-write at FILE granularity.

The path-table DML (pipeline.py delete_rows/update_rows/upsert_table)
materializes and truncate-rewrites the whole table — the right cost for
small governed tables, the wrong one at 100 TB. Here a DELETE/UPDATE/
MERGE commits a new manifest version where

 - files provably untouched by the predicate are carried BY REFERENCE
   (byte-identical on disk, same paths — never rewritten, never read
   beyond the targeting scan);
 - only files that actually contain matching rows are rewritten, into
   ``data/v{N}``, minus/with the changed rows;
 - the commit is one manifest flip (op="replace"), time-travel intact.

Targeting is two-stage, Iceberg-style: recorded batch stats first
(``prune`` bounds skip whole files without opening a footer), then one
column-pruned scan that maps the predicate to the distinct files holding
matching rows (``input_file_name()``). At 100 TB a date-scoped DELETE
touches only the files whose recorded ranges overlap the date — O(hit),
not O(table).

Concurrency: the manifest flip is LINEARIZED (manifest.py's commit
lock) — a replace whose parent is no longer the tip is refused at the
flip and the whole DML retries against the new tip (a lost-race rewrite
is useless: it rewrote files of a superseded state). Appends racing a
replace are never lost: their flip rebases the same way.

Reference basis: the reference reaches DELETE/UPDATE/MERGE through
BigQuery DML via bq_query (popelines/main.py:236-243); this is that DML
surface at lakehouse cost on a bare object store.
"""

from __future__ import annotations

import json
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from popelines_spark.manifest import (
    ConcurrentWriteError,
    StaleParentError,
    _commit_manifest,
    _committed_manifest_versions,
    _crash_point,
    _hadoop_fs,
    _list_parquet,
    _paths,
    _read_manifest_or_none,
    _release_reservation,
    _reserve_version,
    heal_manifest_table,
)
from popelines_spark.operators.par import rebalance_output
from popelines_spark.schemas import merge_schemas


def _canon(p: str) -> tuple[str, str, str]:
    """Canonical (scheme, authority, path) so Hadoop's Path.toString()
    (``file:/tmp/x``) and Spark's input_file_name() (``file:///tmp/x``)
    compare equal."""
    u = urlparse(p)
    if not u.scheme:
        return ("file", "", p)
    return (u.scheme, u.netloc, unquote(u.path))


def _affected_files(
    spark: SparkSession,
    schema,
    candidates: list[str],
    cond,
) -> list[str]:
    """The manifest files among ``candidates`` that contain ≥1 row where
    ``cond`` is TRUE — ONE column-pruned scan (the predicate's columns +
    the virtual file name), result bounded by the file count."""
    if not candidates:
        return []
    hit = (
        spark.read.schema(schema)
        .parquet(*candidates)
        .where(cond)
        .select(F.input_file_name().alias("_f"))
        .distinct()
        .collect()
    )
    hit_canon = {_canon(r["_f"]) for r in hit}
    return [f for f in candidates if _canon(f) in hit_canon]


class _Conflict(Exception):
    pass


def _is_missing_file_error(exc: Exception) -> bool:
    """A scan that lost the race to GC (its pinned parent's files were
    reclaimed mid-build) surfaces as a missing-path error from the
    parquet reader. That is a CONCURRENCY event, not a caller error —
    the standard lakehouse contract (Iceberg/Delta concurrent writers
    re-validate and retry after a vacuum) — so callers map it to a
    rebase-and-retry instead of failing the DML."""
    s = str(exc)
    # match only the specific phrasings Spark's readers use for a
    # vanished input path — the bare substring "does not exist" also
    # appears in py4j "Method ... does not exist" signature errors and
    # catalog "Table or view ... does not exist" errors, which are
    # deterministic bugs that must SURFACE, not be retried as races
    # (same rule as manifest._read_manifest_or_none)
    # FAILED_READ_FILE is an UMBRELLA class that also covers corrupt
    # footers and parquet type mismatches — deterministic failures that
    # retrying as races would bury under a bogus ConcurrentWriteError
    # (review r12); match only its vanished-file subclass
    return (
        "PATH_NOT_FOUND" in s
        or "FileNotFoundException" in s
        or "FAILED_READ_FILE.FILE_NOT_EXIST" in s
        or "Path does not exist" in s
    )


def _replace_commit(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    build,  # (tip_manifest, schema) -> (affected, rewritten_df|None, extra_df|None, schema_out)
    max_retries: int = 3,
):
    """Shared OCC skeleton for replace-type commits. ``build`` runs
    against the rebased tip and returns which files to drop, the
    rewrite of their surviving rows, an optional extra frame of brand-new
    rows (MERGE inserts), and the (possibly evolved) output schema.
    Retries the WHOLE operation against the new tip on conflict."""
    from pyspark.sql.types import StructType

    root, vroot, droot = _paths(warehouse, table_name)
    fs, _, jvm = _hadoop_fs(spark, root)
    HPath = jvm.org.apache.hadoop.fs.Path
    last: Exception | None = None
    healed_once = False
    for _ in range(max_retries):
        version = _reserve_version(fs, vroot, jvm)
        try:
            versions = _committed_manifest_versions(fs, vroot, jvm)
            if not versions:
                raise FileNotFoundError(
                    f"no committed manifest versions under {root}"
                )
            parent = versions[-1]
            man = _read_manifest_or_none(fs, vroot, parent, jvm)
            if man is None:
                # our chosen parent was retracted between listing and
                # read — same treatment as a moved tip: retry afresh
                raise _Conflict(f"parent {parent} retracted under read")
            schema = StructType.fromJson(json.loads(man["schema"]))
            try:
                affected, rewritten, extra, schema_out = build(man, schema)
                ddir = f"{droot}/v{version}"
                new_files: list[str] = []
                frames = [f for f in (rewritten, extra) if f is not None]
                if frames:
                    out = frames[0]
                    for f in frames[1:]:
                        out = out.unionByName(f, allowMissingColumns=True)
                    # r13 (guide §6): the survivor rewrite otherwise
                    # inherits one partition per affected input file, so
                    # a CoW UPDATE touching N small files writes ~N small
                    # files again — rebalance heals the layout instead of
                    # perpetuating it (same sizing as the append path).
                    out = rebalance_output(out)
                    out.write.mode("overwrite").parquet(ddir)
                    # debris: survivor rewrite on disk, commit never ran
                    _crash_point("after_rewrite_write")
                    new_files = _list_parquet(fs, ddir, jvm)
            except Exception as exc:
                if isinstance(exc, (_Conflict, _NoOp)) or not (
                    _is_missing_file_error(exc)
                ):
                    raise
                # the pinned parent's files were GC'd mid-build: rebase
                # onto the current tip and rebuild against live files
                raise _Conflict(
                    f"parent {parent} files reclaimed by GC mid-build"
                ) from exc
            affected_set = set(affected)
            files = [f for f in man["files"] if f not in affected_set]
            files += new_files
            file_stats = {
                f: s
                for f, s in man.get("file_stats", {}).items()
                if f not in affected_set
            }
            # cheap early check before taking the commit lock: a racing
            # commit since the rebase read means our rewrite targeted a
            # stale tip (the lock would refuse it anyway — this just
            # skips the lock round-trip for definitely-stale flips)
            now = _committed_manifest_versions(fs, vroot, jvm)
            if now and now[-1] != parent:
                raise _Conflict(f"tip moved {parent} -> {now[-1]}")
            try:
                _commit_manifest(
                    spark, fs, vroot, version, files,
                    json.dumps(schema_out.jsonValue()), jvm,
                    parent=parent, op="replace",
                    batch_ids=man.get("batch_ids", []),
                    file_stats=file_stats,
                )
            except StaleParentError as exc:
                # the linearized flip refused a stale parent: the
                # rewrite targeted superseded state — retry the whole
                # DML against the new tip. (This closed the
                # near-simultaneous-walk race where two replaces flipped
                # parented on the same manifest and neither's own
                # post-commit walk saw the other.)
                raise _Conflict(str(exc)) from exc
            try:
                heal_manifest_table(spark, warehouse, table_name)
            except Exception:
                # OUR replace is durably on the tip; NO best-effort heal
                # failure (transient orphan ConcurrentWriteError, a
                # racing retraction's FileNotFoundError, reservation
                # churn) may convert this success into a caller-visible
                # failure — an application-level retry of a
                # non-idempotent UPDATE would double-apply (review r12).
                # The next writer/GC heals.
                import logging

                logging.getLogger(__name__).warning(
                    "post-replace heal of %s deferred", table_name,
                    exc_info=True,
                )
            return version
        except _Conflict as exc:
            _release_reservation(fs, vroot, version, jvm)
            last = exc
            # heal once, on the FIRST conflict only: under linearized
            # commits a refused flip leaves nothing of OURS to repair —
            # the heal exists for pre-linearization/crash debris that
            # may be blocking the table, and that either heals on the
            # first pass or needs the loud post-retry failure. Healing
            # on every conflict paid an O(all manifests) scan per lost
            # race for a removed failure mode (review r11).
            if not healed_once:
                healed_once = True
                try:
                    heal_manifest_table(spark, warehouse, table_name)
                except (ConcurrentWriteError, FileNotFoundError):
                    pass
            continue
        except Exception:
            _release_reservation(fs, vroot, version, jvm)
            raise
    raise ConcurrentWriteError(
        f"replace on {table_name} lost {max_retries} optimistic races"
    ) from last


def _count_and_validate_set_exprs(
    src: DataFrame,
    cond,
    set_exprs: dict[str, str],
    types: dict,
) -> int:
    """ONE aggregation over ``src`` returning the matched-row count,
    raising first if any SET expression's value on a matched row would
    be silently corrupted by the cast back to the column's declared
    type (ADVICE r12 — non-ANSI casts truncate without error, where
    BigQuery rejects the assignment). Lossless test per drifting
    column: cast(expr AS declared) must round-trip to the expression's
    own type and compare null-safe equal; overflow clamps and
    fractional truncation both fail it. Matched NULLs pass (NULL is
    representable in every type). Widening drifts (int→long, long→
    double literals) round-trip and sail through — the probe is
    data-dependent, maximally permissive, and shares the n_updated
    pass, so valid UPDATEs pay nothing extra. An intended truncation is
    spelled explicitly: CAST(expr AS <declared type>) in the SET
    expression makes expr's type equal the declared type, and the
    probe skips it."""
    set_cols = list(set_exprs)
    probe = src.select(
        *[F.expr(set_exprs[c]).alias(f"__e_{i}") for i, c in enumerate(set_cols)]
    ).schema
    etypes = {c: probe.fields[i].dataType for i, c in enumerate(set_cols)}
    drifting = [c for c in set_cols if etypes[c] != types[c]]
    aggs = [F.sum(cond.cast("long")).alias("__n")]
    for i, c in enumerate(drifting):
        e = F.expr(set_exprs[c])
        # try_cast, not cast: under ANSI (the session default) a cast
        # overflow in the PROBE would throw a raw ArithmeticException
        # mid-aggregation; try_cast nulls it and the null fails the
        # round-trip below, so every lossy value funnels into the one
        # friendly ValueError
        tc = e.try_cast(types[c])
        bad = (
            cond
            & e.isNotNull()
            & (tc.isNull() | ~tc.try_cast(etypes[c]).eqNullSafe(e))
        )
        aggs.append(F.sum(bad.cast("long")).alias(f"__bad_{i}"))
    row = src.agg(*aggs).collect()[0]
    for i, c in enumerate(drifting):
        n_bad = row[f"__bad_{i}"] or 0
        if n_bad:
            decl = types[c].simpleString()
            raise ValueError(
                f"UPDATE SET {c} = {set_exprs[c]}: the expression's type "
                f"({etypes[c].simpleString()}) does not losslessly coerce "
                f"to the declared column type ({decl}) for {n_bad} matched "
                f"row(s) — values would be silently truncated/clamped. "
                f"Wrap the expression in an explicit CAST(... AS {decl}) "
                "if the truncation is intended."
            )
    return int(row["__n"] or 0)


def _apply_set_exprs(
    src: DataFrame,
    cond,
    set_exprs: dict[str, str],
    types: dict,
) -> DataFrame:
    """The UPDATE projection both layouts share: each SET expression is
    evaluated against the PRE-update row (``SET a=b, b=a`` swaps) and
    cast back to the column's DECLARED type so at-rest types never
    drift; unmatched rows pass through untouched. Callers run
    :func:`_count_and_validate_set_exprs` first — the cast here is only
    reached for values the probe proved lossless."""
    return src.select(
        *[
            F.when(
                cond, F.expr(set_exprs[c]).cast(types[c])
            ).otherwise(F.col(c)).alias(c)
            if c in set_exprs
            else F.col(c)
            for c in src.columns
        ]
    )


class _NoOp(Exception):
    """Predicate matched no file — nothing to rewrite, no commit."""

    def __init__(self, version: int):
        self.version = version


def delete_manifest_rows(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    predicate: str,
    prune: list[tuple] | None = None,
) -> tuple[int, int]:
    """SQL DELETE on a manifest table: rows where ``predicate`` is TRUE
    are removed (NULL keeps the row); returns (new_version, n_deleted).
    Only files containing matching rows are rewritten — everything else
    is carried by reference, byte-identical. Optional ``prune`` bounds
    (col, lo, hi) must be IMPLIED by the predicate; they let the
    targeting scan skip files via recorded batch stats."""
    n_deleted = 0

    def build(man, schema):
        nonlocal n_deleted
        cond = F.coalesce(F.expr(predicate).cast("boolean"), F.lit(False))
        candidates = man["files"]
        if prune:
            from popelines_spark.manifest import _prune_files

            # prune from the manifest ALREADY IN HAND: a pinned re-read
            # races the retract path and costs extra listings per retry
            candidates = _prune_files(man, prune)
        affected = _affected_files(spark, schema, candidates, cond)
        if not affected:
            raise _NoOp(man["version"])
        src = spark.read.schema(schema).parquet(*affected)
        n_deleted = src.where(cond).count()  # assign: retries rebuild
        kept = src.where(~cond)
        return affected, kept, None, schema

    try:
        v = _replace_commit(spark, warehouse, table_name, build)
    except _NoOp as noop:
        return noop.version, 0
    return v, n_deleted


def update_manifest_rows(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    set_exprs: dict[str, str],
    predicate: str,
    prune: list[tuple] | None = None,
) -> tuple[int, int]:
    """SQL UPDATE on a manifest table: rows where ``predicate`` is TRUE
    get each ``column: sql_expression`` applied — every SET expression
    evaluated against the PRE-update row (``SET a=b, b=a`` swaps) — in a
    copy-on-write commit that rewrites only the files holding matching
    rows. Returns (new_version, n_updated)."""
    n_updated = 0

    def build(man, schema):
        nonlocal n_updated
        unknown = set(set_exprs) - {f.name for f in schema.fields}
        if unknown:
            raise ValueError(
                f"UPDATE of non-existent column(s): {sorted(unknown)}"
            )
        cond = F.expr(predicate)
        candidates = man["files"]
        if prune:
            from popelines_spark.manifest import _prune_files

            # prune from the manifest ALREADY IN HAND: a pinned re-read
            # races the retract path and costs extra listings per retry
            candidates = _prune_files(man, prune)
        affected = _affected_files(spark, schema, candidates, cond)
        if not affected:
            raise _NoOp(man["version"])
        src = spark.read.schema(schema).parquet(*affected)
        # cast each SET expression back to the column's DECLARED type:
        # a type-drifting expression (cnt/2 on a LONG returns DOUBLE)
        # coerced the whole output column, wrote DOUBLE parquet under a
        # manifest still declaring LONG, and every subsequent read
        # failed far from the cause (review r12). The cast-back is
        # VALIDATED per matched row (ADVICE r12): under non-ANSI cast
        # semantics it silently truncates (SET cnt=cnt/2 on LONG wrote
        # floor(cnt/2) with no error — BigQuery REJECTS FLOAT64→INT64
        # assignment), so any matched value that does not round-trip
        # through the declared type raises instead of corrupting; an
        # intended truncation is spelled with an explicit CAST in the
        # SET expression. Folded into the n_updated aggregation — the
        # probe costs no extra pass.
        types = {f.name: f.dataType for f in schema.fields}
        n_updated = _count_and_validate_set_exprs(
            src, cond, set_exprs, types
        )
        updated = _apply_set_exprs(src, cond, set_exprs, types)
        return affected, updated, None, schema

    try:
        v = _replace_commit(spark, warehouse, table_name, build)
    except _NoOp as noop:
        return noop.version, 0
    return v, n_updated


def upsert_manifest_table(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    source: DataFrame,
    keys: list[str],
) -> int:
    """MERGE into a manifest table: target rows matched on ``keys`` take
    the source's values, unmatched source rows are inserted, unmatched
    target rows survive UNTOUCHED — files with no matching key are
    carried by reference. Duplicate source keys raise (BigQuery/Delta
    MERGE semantics; the same lazy guard as operators/upsert). Add-only
    schema evolution applies to new source columns. Returns the new
    version."""
    from popelines_spark.io import _align_to

    def build(man, schema):
        src = source
        target_schema = merge_schemas(schema, src.schema)
        keyset = (
            src.select(*keys).distinct()
        )
        # targeting scan: files holding ≥1 matching key (broadcast the
        # source key set — MERGE sources are batch-sized by contract).
        # input_file_name() is stamped BEFORE the join: after a join of
        # two file sources the expression fails analysis
        # (MULTI_SOURCES_UNSUPPORTED_FOR_EXPRESSION).
        # NULL-SAFE key match, like the merge itself (operators/upsert
        # joins via eqNullSafe): a plain on=keys probe never matches
        # NULL=NULL, so a NULL-key target row's file was carried by
        # reference while the merge re-inserted the source's NULL-key
        # row — silent duplication (review r12)
        if man["files"]:
            tgt_probe = (
                spark.read.schema(schema)
                .parquet(*man["files"])
                .select(F.input_file_name().alias("_f"), *keys)
                .alias("__t")
            )
            cond = None
            for k in keys:
                c = F.col(f"__t.{k}").eqNullSafe(F.col(f"__s.{k}"))
                cond = c if cond is None else (cond & c)
            probe = (
                tgt_probe.join(
                    F.broadcast(keyset.alias("__s")), on=cond, how="leftsemi"
                )
                .select("_f")
                .distinct()
                .collect()
            )
        else:
            probe = []
        hit_canon = {_canon(r["_f"]) for r in probe}
        affected = [f for f in man["files"] if _canon(f) in hit_canon]
        from popelines_spark.operators.upsert import upsert as _merge

        if affected:
            tgt_hit = spark.read.schema(schema).parquet(*affected)
        else:
            tgt_hit = spark.createDataFrame([], schema)
        merged = _merge(tgt_hit, src, keys)
        merged = _align_to(merged, target_schema)
        return affected, merged, None, merged.schema

    return _replace_commit(spark, warehouse, table_name, build)
