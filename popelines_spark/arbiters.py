"""Alternate :class:`~popelines_spark.manifest.CommitArbiter`
implementations (VERDICT r12 next #5).

The default ``LockFileArbiter`` rests on the filesystem's atomic
``create(overwrite=False)`` — genuine on ``file://`` (POSIX
``O_CREAT|O_EXCL``) and ``hdfs://``, but NOT on raw object stores,
where the claim degrades to exists-check-then-PUT. Stores with a
conditional write (S3 ``If-None-Match: *`` PUT, GCS
``ifGenerationMatch=0``) plug their compare-and-set in through the
arbiter seam; :class:`SQLiteCASArbiter` below is a concrete,
contract-tested stand-in for that class of arbiter: an external
coordination store (a SQLite file — its ``BEGIN IMMEDIATE``
write-transaction is a genuine cross-process compare-and-set) decides
every race, and the filesystem only materializes what the CAS already
decided. It exists so the seam is proven against a SECOND
implementation (tests/test_arbiter_contract.py parametrizes the
contract over both), not because SQLite is the production answer —
swap the ``_txn`` body for the store's conditional PUT and the rest
carries over verbatim.

Selection: ``set_commit_arbiter(SQLiteCASArbiter(db))`` in-process, or
``POPELINES_COMMIT_ARBITER=sqlite:/path/to/cas.db`` in the environment
(read once at manifest import — the hook multi-process drills use to
install the arbiter in subprocess writers).
"""

from __future__ import annotations

import contextlib
import os
import random
import sqlite3
import time
import uuid


class SQLiteCASArbiter:
    """Commit arbiter whose mutual exclusion comes from a SQLite
    database's write transaction, standing in for a store-native
    conditional PUT.

    - :meth:`claim` — conditional file creation: the DB transaction is
      the ``If-None-Match`` guard; the marker FILE is still written
      (the protocols release claims via ``fs.delete`` and age leases
      via the marker's mtime, so the file remains the visible state —
      the DB only serializes the decide-and-create step).
    - :meth:`run_locked` — a per-table lease ROW keyed by ``vroot``
      with an owner token: INSERT-if-absent is the acquire CAS, an
      over-age row is broken by UPDATE inside the same transaction
      (re-checked under the CAS — no breaker file needed), and release
      is DELETE ... WHERE holder = our token, so a holder that was
      presumed dead and superseded can never free its successor's
      lock. A crashed holder's row ages out via ``stale_sec`` exactly
      like the default's lock file.
    """

    def __init__(self, db_path: str):
        self.db_path = db_path
        with self._txn() as con:
            con.execute(
                "CREATE TABLE IF NOT EXISTS locks ("
                "key TEXT PRIMARY KEY, holder TEXT NOT NULL, "
                "ts REAL NOT NULL)"
            )

    @contextlib.contextmanager
    def _txn(self):
        """One serialized write transaction — the compare-and-set.
        ``BEGIN IMMEDIATE`` takes the database write lock up front, so
        every read inside the block is already exclusive with every
        other writer, across threads AND processes."""
        con = sqlite3.connect(self.db_path, timeout=60.0)
        try:
            con.execute("BEGIN IMMEDIATE")
            yield con
            con.commit()
        except BaseException:
            con.rollback()
            raise
        finally:
            con.close()

    # -- the two protocol primitives ----------------------------------

    def claim(self, fs, path: str, jvm) -> bool:
        HPath = jvm.org.apache.hadoop.fs.Path
        with self._txn():
            if fs.exists(HPath(path)):
                return False
            # overwrite=True is safe: the CAS above proved absence, and
            # no other claimer can be inside this block concurrently
            fs.create(HPath(path), True).close()
            return True

    def run_locked(self, fs, vroot, jvm, fn, timeout_sec=None,
                   stale_sec=None):
        from popelines_spark.manifest import ConcurrentWriteError

        if timeout_sec is None:
            timeout_sec = float(
                os.environ.get("POPELINES_LOCK_TIMEOUT_SEC", 120.0)
            )
        if stale_sec is None:
            stale_sec = float(
                os.environ.get("POPELINES_LOCK_STALE_SEC", 300.0)
            )
        key = str(vroot)
        token = uuid.uuid4().hex
        deadline = time.time() + timeout_sec
        while True:
            got = False
            with self._txn() as con:
                row = con.execute(
                    "SELECT holder, ts FROM locks WHERE key = ?", (key,)
                ).fetchone()
                now = time.time()
                if row is None:
                    con.execute(
                        "INSERT INTO locks(key, holder, ts) "
                        "VALUES (?, ?, ?)",
                        (key, token, now),
                    )
                    got = True
                elif now - row[1] > stale_sec:
                    # presumed-dead takeover, decided UNDER the CAS —
                    # no separate breaker file, no re-stat window
                    con.execute(
                        "UPDATE locks SET holder = ?, ts = ? "
                        "WHERE key = ?",
                        (token, now, key),
                    )
                    got = True
            if got:
                try:
                    return fn()
                finally:
                    with self._txn() as con:
                        # identity-verified release: only OUR row
                        con.execute(
                            "DELETE FROM locks WHERE key = ? "
                            "AND holder = ?",
                            (key, token),
                        )
            if time.time() > deadline:
                raise ConcurrentWriteError(
                    f"commit lock under {vroot} not acquired in "
                    f"{timeout_sec}s (SQLiteCASArbiter {self.db_path})"
                )
            time.sleep(0.002 + random.random() * 0.01)


def arbiter_from_env():
    """Build the arbiter named by ``POPELINES_COMMIT_ARBITER``, or None
    for the default. Formats: ``sqlite:<db path>``. Subprocess drills
    (tools/stress_manifest.py, tools/chaos_concurrent.py) use this to
    run every writer under the same external CAS."""
    spec = os.environ.get("POPELINES_COMMIT_ARBITER", "")
    if not spec:
        return None
    if spec.startswith("sqlite:"):
        return SQLiteCASArbiter(spec[len("sqlite:"):])
    raise ValueError(
        f"unknown POPELINES_COMMIT_ARBITER spec {spec!r} "
        "(supported: sqlite:<db path>)"
    )
