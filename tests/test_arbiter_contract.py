"""CommitArbiter CONTRACT suite (VERDICT r12 next #5).

The arbiter seam (manifest.py CommitArbiter / set_commit_arbiter)
documents two primitives every implementation must provide; until this
round only the lock-file default existed, so the seam had never been
proven against a second implementation. These tests state the contract
executably and run it over BOTH arbiters:

  claim(fs, path, jvm):
    - exactly ONE of N racing callers returns True for a fresh path;
    - the marker file exists afterwards (the protocols lease off its
      mtime and release via fs.delete);
    - False when the path already exists; claimable again after delete.

  run_locked(fs, vroot, jvm, fn, timeout_sec, stale_sec):
    - per-vroot mutual exclusion (no two fn bodies overlap);
    - independent vroots do not exclude each other;
    - timeout raises ConcurrentWriteError;
    - a holder older than stale_sec is broken and superseded;
    - a superseded holder's release must NOT free the successor's lock
      (owner-identity release — the ADVICE r12 cascade class).
"""

import threading
import time

import pytest

from popelines_spark.arbiters import SQLiteCASArbiter
from popelines_spark.io import _hadoop_fs
from popelines_spark.manifest import ConcurrentWriteError, LockFileArbiter


@pytest.fixture(params=["lockfile", "sqlite"])
def arbiter(request, tmp_path):
    if request.param == "lockfile":
        return LockFileArbiter()
    return SQLiteCASArbiter(str(tmp_path / "cas.db"))


@pytest.fixture()
def fsjvm(spark, tmp_path):
    fs, _, jvm = _hadoop_fs(spark, str(tmp_path))
    return fs, jvm


def test_claim_single_winner(arbiter, fsjvm, tmp_path):
    fs, jvm = fsjvm
    path = str(tmp_path / "v1.__reserved")
    wins = []
    barrier = threading.Barrier(8)

    def worker():
        barrier.wait()
        if arbiter.claim(fs, path, jvm):
            wins.append(1)

    ts = [threading.Thread(target=worker) for _ in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len(wins) == 1
    import os

    assert os.path.exists(path), "winning claim must materialize the file"


def test_claim_false_when_exists_and_reclaimable(arbiter, fsjvm, tmp_path):
    import os

    fs, jvm = fsjvm
    path = str(tmp_path / "v2.__reserved")
    assert arbiter.claim(fs, path, jvm) is True
    assert arbiter.claim(fs, path, jvm) is False
    os.unlink(path)  # protocol release = fs.delete of the marker
    assert arbiter.claim(fs, path, jvm) is True


def test_run_locked_mutual_exclusion(arbiter, fsjvm, tmp_path):
    fs, jvm = fsjvm
    vroot = str(tmp_path / "t" / "versions")
    import os

    os.makedirs(vroot, exist_ok=True)
    state = {"inside": 0, "overlap": 0, "runs": 0}
    lock = threading.Lock()

    def body():
        with lock:
            state["inside"] += 1
            if state["inside"] > 1:
                state["overlap"] += 1
        time.sleep(0.01)
        with lock:
            state["inside"] -= 1
            state["runs"] += 1

    def worker():
        for _ in range(5):
            arbiter.run_locked(fs, vroot, jvm, body,
                               timeout_sec=30, stale_sec=300)

    ts = [threading.Thread(target=worker) for _ in range(6)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert state["runs"] == 30
    assert state["overlap"] == 0, "two fn bodies overlapped"


def test_run_locked_independent_vroots_dont_block(arbiter, fsjvm, tmp_path):
    import os

    fs, jvm = fsjvm
    va, vb = str(tmp_path / "a" / "versions"), str(tmp_path / "b" / "versions")
    os.makedirs(va), os.makedirs(vb)
    a_holds = threading.Event()
    a_release = threading.Event()

    def hold_a():
        def body():
            a_holds.set()
            a_release.wait(timeout=10)

        arbiter.run_locked(fs, va, jvm, body, timeout_sec=30, stale_sec=300)

    t = threading.Thread(target=hold_a)
    t.start()
    assert a_holds.wait(timeout=10)
    t0 = time.time()
    arbiter.run_locked(fs, vb, jvm, lambda: None,
                       timeout_sec=5, stale_sec=300)
    assert time.time() - t0 < 2, "vroot B waited on vroot A's lock"
    a_release.set()
    t.join()


def test_run_locked_timeout_raises(arbiter, fsjvm, tmp_path):
    import os

    fs, jvm = fsjvm
    vroot = str(tmp_path / "to" / "versions")
    os.makedirs(vroot)
    holds = threading.Event()
    release = threading.Event()

    def hold():
        def body():
            holds.set()
            release.wait(timeout=20)

        arbiter.run_locked(fs, vroot, jvm, body,
                           timeout_sec=30, stale_sec=300)

    t = threading.Thread(target=hold)
    t.start()
    assert holds.wait(timeout=10)
    with pytest.raises(ConcurrentWriteError, match="not acquired"):
        arbiter.run_locked(fs, vroot, jvm, lambda: None,
                           timeout_sec=0.3, stale_sec=300)
    release.set()
    t.join()


def test_superseded_holder_release_spares_successor(
    arbiter, fsjvm, tmp_path
):
    """The owner-identity half: holder A outlives stale_sec inside fn;
    B breaks the lease and enters; A's release on exit must NOT free
    B's lock — a probe with a short timeout still fails while B holds,
    and succeeds once B releases."""
    import os

    fs, jvm = fsjvm
    vroot = str(tmp_path / "id" / "versions")
    os.makedirs(vroot)
    b_holds = threading.Event()
    b_release = threading.Event()
    a_done = threading.Event()

    def a():
        def body():
            # outlive the lease; wait until B provably holds AND A can
            # observe its own release path run while B is inside
            assert b_holds.wait(timeout=20)

        arbiter.run_locked(fs, vroot, jvm, body,
                           timeout_sec=30, stale_sec=0.2)
        a_done.set()

    def b():
        def body():
            b_holds.set()
            b_release.wait(timeout=20)

        # start after A's lease is stale; break + take over
        arbiter.run_locked(fs, vroot, jvm, body,
                           timeout_sec=30, stale_sec=0.2)

    ta = threading.Thread(target=a)
    ta.start()
    time.sleep(0.5)  # let A's lease go stale
    tb = threading.Thread(target=b)
    tb.start()
    assert b_holds.wait(timeout=10)
    assert a_done.wait(timeout=10), "A never exited"
    # A has released (or tried to); B still inside fn — the lock must
    # still be HELD: a short-timeout probe times out
    with pytest.raises(ConcurrentWriteError):
        arbiter.run_locked(fs, vroot, jvm, lambda: None,
                           timeout_sec=0.3, stale_sec=300)
    b_release.set()
    tb.join()
    # and once B releases, the lock is free again
    arbiter.run_locked(fs, vroot, jvm, lambda: None,
                       timeout_sec=5, stale_sec=300)


def test_sqlite_arbiter_end_to_end_append_race(spark, tmp_path):
    """The second implementation drives the REAL commit path: racing
    idempotent appends through append_manifest_table under the SQLite
    CAS arbiter converge to exactly-once."""
    from pyspark.sql import functions as F

    from popelines_spark.manifest import (
        append_manifest_table,
        heal_manifest_table,
        read_manifest_table,
        set_commit_arbiter,
    )

    wh = str(tmp_path / "wh")
    prev = set_commit_arbiter(SQLiteCASArbiter(str(tmp_path / "cas.db")))
    try:
        base = spark.range(100).select(
            F.col("id").alias("k"), F.lit("base").alias("tag")
        )
        append_manifest_table(spark, wh, "t", base, batch_id="base")
        errs = []

        def writer(w):
            df = spark.range((w + 1) * 1000, (w + 1) * 1000 + 50).select(
                F.col("id").alias("k"), F.lit(f"w{w}").alias("tag")
            )
            for attempt in range(5):
                try:
                    append_manifest_table(
                        spark, wh, "t", df, batch_id=f"w{w}"
                    )
                    return
                except Exception as exc:  # retry the documented signal
                    if "Concurrent" not in type(exc).__name__:
                        errs.append(exc)
                        return
            errs.append(RuntimeError(f"writer {w} exhausted retries"))

        ts = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert not errs, errs
        # replay every batch id: all no-ops
        for w in range(4):
            df = spark.range((w + 1) * 1000, (w + 1) * 1000 + 50).select(
                F.col("id").alias("k"), F.lit(f"w{w}").alias("tag")
            )
            append_manifest_table(spark, wh, "t", df, batch_id=f"w{w}")
        got = read_manifest_table(spark, wh, "t")
        assert got.count() == 100 + 4 * 50
        assert got.select("k").distinct().count() == 100 + 4 * 50
        assert heal_manifest_table(spark, wh, "t") == 0
    finally:
        set_commit_arbiter(prev)
