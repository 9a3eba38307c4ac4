"""Deployment CLI: `python -m canal_spark replay/status/maintain` as a
user would run it — separate processes, resume across invocations,
JSON output contract."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*argv: str) -> dict:
    env = {**os.environ, "CANAL_SPARK_MASTER": "local[4]"}
    out = subprocess.run(
        [sys.executable, "-m", "canal_spark", *argv],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_replay_status_maintain_roundtrip(changelog_dir, tmp_path):
    table = str(tmp_path / "t")
    # budgeted replay in its own process
    r1 = _run(
        "replay", "--changelog", changelog_dir, "--table", table,
        "--buckets", "8", "--lsn-budget", "600", "--max-epochs", "2",
    )
    assert r1["final_epoch"] == 2 and r1["rows"] > 0
    # resume to completion in a SECOND process (cold restart)
    r2 = _run("replay", "--changelog", changelog_dir, "--table", table,
              "--lsn-budget", "1000000000")
    assert r2["final_epoch"] >= r1["final_epoch"]
    # re-running a completed replay is a no-op
    r3 = _run("replay", "--changelog", changelog_dir, "--table", table,
              "--lsn-budget", "1000000000")
    assert r3 == r2
    # status needs no Spark session
    st = _run("status", "--table", table)
    assert st["epoch"] == r2["final_epoch"]
    assert st["checkpoints"] == {str(k): v for k, v in r2["checkpoints"].items()}
    # pin an old epoch by name before aggressive maintenance
    tg = _run("tag", "--table", table, "--name", "keep", "--epoch", "1")
    assert tg == {"tag": "keep", "epoch": 1}
    # a branch ref pins the same way and can later move (WAP surface)
    rf = _run("ref", "--table", table, "--name", "main", "--epoch", "1")
    assert rf == {"ref": "main", "epoch": 1}
    # maintenance: expire + compact + gc
    mt = _run(
        "maintain", "--table", table, "--expire-retain", "1",
        "--compact", "--changelog", changelog_dir, "--gc", "--gc-min-age", "0",
    )
    assert mt["expired_snapshots"] and mt["orphans_removed"] > 0
    assert mt["tombstones_dropped"] >= 0
    # the pinned epoch survived the expire+gc cycle; drop releases it
    assert 1 not in mt["expired_snapshots"]
    assert _run("tag", "--table", table)["tags"] == {"keep": 1}
    assert _run("tag", "--table", table, "--drop", "keep")["tags"] == {}
    assert _run("ref", "--table", table)["refs"] == {"main": 1}
    # maintenance commits epochs of its own, so the head only moved forward
    ff = _run("ref", "--table", table, "--fast-forward", "main")
    assert ff["epoch"] >= st["epoch"]
    assert _run("ref", "--table", table, "--drop", "main")["refs"] == {}
    # table still readable at the same row count
    st2 = _run("status", "--table", table)
    assert st2["epoch"] >= st["epoch"]


def test_cli_mor_replay_then_compact_files(changelog_dir, tmp_path):
    """Operator workflow for merge-on-read: budgeted MoR replay (cold
    restart between invocations), then `maintain --compact-files` folds
    the accumulated fragments in one commit epoch, then the replay
    finishes against the compacted base and the final row count matches
    a pure-CoW replay of the same changelog."""
    table = str(tmp_path / "t")
    r1 = _run(
        "replay", "--changelog", changelog_dir, "--table", table,
        "--buckets", "8", "--lsn-budget", "600", "--max-epochs", "3",
        "--write-mode", "mor",
    )
    assert r1["final_epoch"] == 3
    mt = _run("maintain", "--table", table, "--compact-files", str(1 << 30))
    assert mt["compacted_buckets"], "MoR epochs must leave fragments to fold"
    assert all(v["files_after"] == 1 for v in mt["compacted_buckets"].values())
    r2 = _run("replay", "--changelog", changelog_dir, "--table", table,
              "--lsn-budget", "1000000000", "--write-mode", "mor")
    cow = _run("replay", "--changelog", changelog_dir,
               "--table", str(tmp_path / "cow"), "--buckets", "8",
               "--lsn-budget", "1000000000")
    assert r2["rows"] == cow["rows"]
    assert r2["checkpoints"] == cow["checkpoints"]


def test_cli_compact_files_rejects_nonpositive_target(tmp_path):
    from canal_spark.plans.table import SnapshotTable

    SnapshotTable.create(str(tmp_path / "t"), n_buckets=2)
    out = subprocess.run(
        [sys.executable, "-m", "canal_spark", "maintain",
         "--table", str(tmp_path / "t"), "--compact-files", "0"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 2
    assert "must be positive" in out.stderr


def test_cli_lookup_point_key(changelog_dir, tmp_path):
    table = str(tmp_path / "t")
    out = _run("replay", "--changelog", changelog_dir, "--table", table,
               "--buckets", "8", "--lsn-budget", "1000000")
    assert out["rows"] > 0
    # pick a known-live key via a tiny status-free probe: replay output
    # has no keys, so look one up from the table directly
    import pyarrow.parquet as pq
    import glob as _glob
    f = sorted(_glob.glob(f"{table}/data/epoch=*/bucket=*/*.parquet"))[0]
    key = pq.read_table(f, columns=["doc_id"]).column(0)[0].as_py()
    res = _run("lookup", "--table", table, "--key", key)
    assert res["key"] == key and len(res["rows"]) == 1
    assert res["rows"][0]["doc_id"] == key
    assert res["files_opened"] >= 1
    miss = _run("lookup", "--table", table, "--key", "no-such-doc")
    assert miss["rows"] == []


def test_cli_lookup_numeric_key_column(spark, tmp_path):
    """On a table whose key column is numeric, the CLI must cast the
    raw --key string to the key type before pruning (str-vs-int footer
    bounds are unorderable) and before the residual filter (bigint vs
    string coerces to double with precision loss past 2^53)."""
    from canal_spark.operators.merge import merge_epoch
    from canal_spark.plans.table import SnapshotTable

    schema = [
        {"id": 1, "name": "uid", "type": "bigint"},
        {"id": 2, "name": "tokens", "type": "array<int>"},
    ]
    table = SnapshotTable.create(
        str(tmp_path / "t"), n_buckets=4, schema=schema, key_col="uid"
    )
    # a key past 2^53 catches any double coercion in the residual filter
    big = (1 << 60) + 7
    delta = spark.createDataFrame(
        [(big + i, [i], "INSERT", i) for i in range(50)],
        "uid long, tokens array<int>, op string, _seq long",
    )
    files = merge_epoch(spark, table, delta, 1)
    table.commit(1, files, {}, [])

    res = _run("lookup", "--table", str(tmp_path / "t"), "--key", str(big + 3))
    assert res["key"] == big + 3
    assert len(res["rows"]) == 1 and res["rows"][0]["uid"] == big + 3
    # a non-numeric key string is a usage error, not a traceback
    out = subprocess.run(
        [sys.executable, "-m", "canal_spark", "lookup",
         "--table", str(tmp_path / "t"), "--key", "not-a-number"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
        env={**os.environ, "CANAL_SPARK_MASTER": "local[4]"},
    )
    assert out.returncode == 2 and "not a valid bigint" in out.stderr


def test_cli_stream_drain_and_incremental_rerun(changelog_dir, tmp_path):
    """`stream` drains the directory exactly-once; a second process on
    the same checkpoint is a no-op; a third sees only NEW files."""
    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src)
    files = sorted(f for f in os.listdir(changelog_dir) if f.endswith(".parquet"))
    for f in files[:3]:
        shutil.copy(os.path.join(changelog_dir, f), os.path.join(src, f))
    table, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    r1 = _run("stream", "--changelog", src, "--table", table,
              "--checkpoint", ckpt, "--buckets", "8")
    assert r1["epoch"] == 3 and r1["rows"] > 0
    r2 = _run("stream", "--changelog", src, "--table", table, "--checkpoint", ckpt)
    assert r2 == r1  # cold rerun: nothing redelivered
    for f in files[3:]:
        shutil.copy(os.path.join(changelog_dir, f), os.path.join(src, f))
    r3 = _run("stream", "--changelog", src, "--table", table, "--checkpoint", ckpt)
    assert r3["epoch"] == len(files) and r3["rows"] >= r1["rows"]
    # the drained stream table equals the batch engine's final state
    bt = str(tmp_path / "bt")
    rb = _run("replay", "--changelog", changelog_dir, "--table", bt, "--buckets", "8")
    assert rb["rows"] == r3["rows"] and rb["checkpoints"] == r3["checkpoints"]


def test_cli_multi_replay_and_multi_stream(changelog_dir, tmp_path):
    """Instance-level CLI: `multi-replay` routes one changelog into two
    tables under the group epoch and a rerun is a no-op; `multi-stream`
    over the same changelog reaches the identical per-route states."""
    grp = str(tmp_path / "grp")
    routes = [
        f"low={tmp_path}/ta::src[0-4]",
        f"high={tmp_path}/tb::src[5-9]",
    ]
    r1 = _run(
        "multi-replay", "--changelog", changelog_dir, "--group-dir", grp,
        "--route", routes[0], "--route", routes[1],
        "--buckets", "8", "--lsn-budget", "1000",
    )
    assert r1["group_epoch"] >= 2 and all(v > 0 for v in r1["rows"].values())
    r2 = _run(
        "multi-replay", "--changelog", changelog_dir, "--group-dir", grp,
        "--route", routes[0], "--route", routes[1],
        "--buckets", "8", "--lsn-budget", "1000",
    )
    assert r2["group_epoch"] == r1["group_epoch"] and r2["rows"] == r1["rows"]
    s1 = _run(
        "multi-stream", "--changelog", changelog_dir,
        "--group-dir", str(tmp_path / "sgrp"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--route", f"low={tmp_path}/sa::src[0-4]",
        "--route", f"high={tmp_path}/sb::src[5-9]",
        "--buckets", "8",
    )
    assert s1["rows"] == r1["rows"]
    assert s1["checkpoints"] == r1["checkpoints"]
    # group-status reads the marker without a Spark session
    gs = _run("group-status", "--group-dir", grp)
    assert gs["group_epoch"] == r1["group_epoch"]
    assert gs["checkpoints"] == {str(k): v for k, v in r1["checkpoints"].items()}
    assert set(gs["tables"]) == {"low", "high"}


def test_cli_delete_where(changelog_dir, tmp_path):
    """maintain --delete-where: predicate takedown from the CLI, own
    process; second run reports zero (idempotent outcome)."""
    table = str(tmp_path / "tdw")
    _run("replay", "--changelog", changelog_dir, "--table", table,
         "--buckets", "8", "--lsn-budget", "1000000000")
    st = _run("status", "--table", table)
    mt = _run("maintain", "--table", table, "--delete-where", "source = 'src1'")
    assert mt["deleted_rows"] > 0
    assert sum(mt["deleted_buckets"].values()) == mt["deleted_rows"]
    st2 = _run("status", "--table", table)
    assert st2["epoch"] == st["epoch"] + 1
    mt2 = _run("maintain", "--table", table, "--delete-where", "source = 'src1'")
    assert mt2["deleted_rows"] == 0 and mt2["deleted_buckets"] == {}
