"""Atomic, manifest-driven checkpointing for resumable builds.

Reference analog: the KVS ``persist()`` append-log + the indexer's
incremental skip of already-indexed rows
(`/root/reference/src/cis5550/kvs/Worker.java:115-155`,
`/root/reference/src/cis5550/jobs/Indexer.java:196-231`). Here a unit
of work (a build stage or a doc-range partition) writes its output to a
temp directory, fsyncs a JSON manifest recording lineage (input
fingerprint, row counts, timings), and renames into place — rename is
the atomic commit. Resume = skip any unit whose manifest is present and
whose input fingerprint matches.
"""

from __future__ import annotations

import json
import os
import shutil
import time

MANIFEST = "_MANIFEST.json"


def is_complete(path: str, fingerprint: str | None = None) -> bool:
    m = os.path.join(path, MANIFEST)
    if not os.path.exists(m):
        return False
    if fingerprint is None:
        return True
    try:
        with open(m) as f:
            return json.load(f).get("fingerprint") == fingerprint
    except (json.JSONDecodeError, OSError):
        return False


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


class atomic_dir:
    """``with atomic_dir(final) as tmp: write into tmp`` — commits by
    writing the manifest into tmp and renaming tmp -> final. A crash at
    any point leaves either nothing or a stale .tmp (ignored/cleaned on
    resume), never a partial final directory."""

    def __init__(self, final_path: str, fingerprint: str = "", **manifest_extra):
        self.final = final_path
        self.tmp = final_path + ".tmp"
        self.fingerprint = fingerprint
        self.extra = manifest_extra
        self.t0 = None

    def __enter__(self) -> "atomic_dir":
        if os.path.exists(self.tmp):
            shutil.rmtree(self.tmp)
        os.makedirs(self.tmp, exist_ok=True)
        self.t0 = time.monotonic()
        return self

    def commit(self, **stats) -> None:
        manifest = {
            "fingerprint": self.fingerprint,
            "seconds": round(time.monotonic() - self.t0, 3),
            **self.extra,
            **stats,
        }
        # durability order: data files -> manifest -> dir entries ->
        # rename -> parent dir. Without the data-file fsyncs a power
        # loss can persist the rename + manifest while the parquet
        # pages are still unflushed — is_complete() would then skip a
        # corrupt unit on every future resume.
        for root, dirs, files in os.walk(self.tmp):
            for fname in files:
                with open(os.path.join(root, fname), "rb") as df:
                    os.fsync(df.fileno())
            # nested dirs too (partitioned output): an unfsynced
            # subdirectory can lose its file ENTRIES across power loss
            # even when the file contents were flushed
            for dname in dirs:
                self._fsync_dir(os.path.join(root, dname))
        mpath = os.path.join(self.tmp, MANIFEST)
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        self._fsync_dir(self.tmp)
        if os.path.exists(self.final):
            # rename ASIDE first: an in-place rmtree(final) can crash
            # half-done with the old manifest still present — a
            # partial final dir that is_complete() trusts. Renames are
            # atomic; the doomed copy is deleted only after the new
            # one is in place.
            doomed = self.final + ".old.tmp"
            shutil.rmtree(doomed, ignore_errors=True)
            os.rename(self.final, doomed)
        else:
            doomed = None
        os.rename(self.tmp, self.final)
        self._fsync_dir(os.path.dirname(self.final) or ".")
        if doomed is not None:
            shutil.rmtree(doomed, ignore_errors=True)

    @staticmethod
    def _fsync_dir(path: str) -> None:
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None and os.path.exists(self.tmp):
            shutil.rmtree(self.tmp, ignore_errors=True)
        return False
