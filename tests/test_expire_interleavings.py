"""Property test (VERDICT r4 task 7): the delta-form manifest chain
stays consistent under random interleavings of commit / append-commit /
expire_snapshots / remove_orphans / cold re-read.

The subtle invariant: a delta-form snapshot references most of its
file map through its `files_base` chain, expiration rewrites the
oldest retained snapshot to be self-contained, and orphan GC resolves
chains via snapshot() — so after ANY interleaving, (1) every retained
epoch resolves, from a cold handle, to exactly the file map it was
committed with, (2) every file that map references still exists on
disk, and (3) the oldest retained snapshot never references an expired
files_base. Spark-free: commit() takes path lists and footer reads on
the synthetic files fail soft into the no-bounds conservative path.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from canal_spark.plans.table import SnapshotTable, _SNAP_RE

STEP = st.sampled_from(
    ["commit", "commit", "commit", "append", "expire2", "expire4", "orphan", "reread"]
)


def _mkfiles(root: str, epoch: int, buckets: list[int]) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for b in buckets:
        d = os.path.join(root, "data", f"epoch={epoch}", f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        full = os.path.join(d, "part-0.parquet")
        with open(full, "wb") as f:
            f.write(b"x")  # not real parquet: bounds read fails soft
        out[b] = [full]  # commit() relativizes against the table root
    return out


def _retained_epochs(table: SnapshotTable) -> list[int]:
    return sorted(
        int(m.group(1))
        for fn in os.listdir(table.meta_dir)
        if (m := _SNAP_RE.match(fn))
    )


def _check_all(root: str, truth: dict[int, dict]) -> None:
    cold = SnapshotTable(root)  # fresh handle: no memoized chain state
    retained = _retained_epochs(cold)
    assert retained, "current snapshot must never expire"
    assert set(retained) <= set(truth)
    for e in retained:
        snap = cold.snapshot(e)
        assert snap["files"] == truth[e], f"epoch {e} resolved differently cold"
        for fes in snap["files"].values():
            for fe in fes:
                assert os.path.exists(os.path.join(root, fe["path"])), (
                    f"epoch {e} references deleted file {fe['path']}"
                )


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    steps=st.lists(STEP, min_size=6, max_size=28),
    bucket_picks=st.lists(st.integers(min_value=0, max_value=3), min_size=28, max_size=28),
)
def test_expire_orphan_commit_interleavings(steps, bucket_picks):
    root = tempfile.mkdtemp(prefix="canal_prop_")
    try:
        table = SnapshotTable.create(root, n_buckets=4)
        truth: dict[int, dict] = {0: table.snapshot(0)["files"]}
        epoch = 0
        for i, step in enumerate(steps):
            if step in ("commit", "append"):
                epoch += 1
                buckets = sorted({bucket_picks[i], (bucket_picks[i] + i) % 4})
                files = _mkfiles(root, epoch, buckets)
                assert table.commit(
                    epoch, files, {}, [], append=(step == "append")
                )
                # record what this epoch's map MUST resolve to forever
                truth[epoch] = SnapshotTable(root).snapshot(epoch)["files"]
            elif step in ("expire2", "expire4"):
                retain = 2 if step == "expire2" else 4
                expired = table.expire_snapshots(retain_last=retain)
                for e in expired:
                    truth.pop(e, None)
                # oldest retained must now be self-contained on disk
                import json

                oldest = _retained_epochs(table)[0]
                with open(table._snap_path(oldest)) as f:
                    assert "files" in json.load(f)
            elif step == "orphan":
                table.remove_orphans(min_age_seconds=0.0)
            elif step == "reread":
                _check_all(root, truth)
        _check_all(root, truth)
        # final orphan sweep must keep every retained-referenced file
        table.remove_orphans(min_age_seconds=0.0)
        _check_all(root, truth)
    finally:
        shutil.rmtree(root, ignore_errors=True)
