"""End-to-end drive for spark-submit verification (see
.claude/skills/verify): gen | replay-some | resume | rerun | parity.
Each phase runs in its own JVM so resume is a real cold start."""

from __future__ import annotations

import sys

WORK = "/tmp/canal_verify"
LOG = f"{WORK}/log"
TABLE = f"{WORK}/table"


def get_spark():
    from canal_spark.session import get_spark as gs

    return gs(app="verify_drive", master="local[8]", shuffle_partitions=16)


def main(phase: str) -> None:
    if phase == "gen":
        import shutil

        from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

        shutil.rmtree(WORK, ignore_errors=True)
        generate_changelog(LOG, ChangelogSpec(n_events=100_000, n_partitions=8, n_keys=5000))
        print("VERIFY gen: ok")
        return

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable

    spark = get_spark()
    mor = phase.endswith("-mor")
    table_path = TABLE + ("_mor" if mor else "")
    kw = (
        {"write_mode": "mor", "auto_compact_fragments": 4} if mor else {}
    )
    phase = phase.removesuffix("-mor")
    if phase == "replay-some":
        table = SnapshotTable.create(table_path, n_buckets=16)
        eng = CdcEngine(spark, LOG, table, lsn_budget=8000, **kw)
        for _ in range(3):
            eng.run_epoch()
        print(f"VERIFY replay-some: epoch={table.current_epoch()} rows={table.read(spark).count()}")
    elif phase == "resume":
        table = SnapshotTable(table_path)  # fresh handle, cold JVM
        eng = CdcEngine(spark, LOG, table, lsn_budget=8000, **kw)
        final = eng.run_to_completion()
        print(f"VERIFY resume: final_epoch={final} rows={table.read(spark).count()}")
    elif phase == "rerun":
        table = SnapshotTable(table_path)
        eng = CdcEngine(spark, LOG, table, lsn_budget=8000, **kw)
        res = eng.run_epoch()
        assert res is None, f"re-apply must be a no-op, got {res}"
        print("VERIFY rerun: no-op ok")
    elif phase == "parity":
        sys.path.insert(0, "/root/repo")
        from tests.oracle_replay import replay

        table = SnapshotTable(table_path)
        got = (
            table.read(spark)
            .select("doc_id", "tokens", "n_tok", "source")
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = replay(LOG).sort_values("doc_id").reset_index(drop=True)
        assert len(got) == len(exp), (len(got), len(exp))
        assert list(got.doc_id) == list(exp.doc_id)
        assert list(got.n_tok) == list(exp.n_tok)
        assert list(got.source) == list(exp.source)
        bad = sum(1 for g, e in zip(got.tokens, exp.tokens) if list(g) != list(e))
        assert bad == 0, f"{bad} token-array mismatches"
        print(f"VERIFY parity: {len(got)} rows byte-exact vs pandas oracle")
    else:
        raise SystemExit(f"unknown phase {phase}")


if __name__ == "__main__":
    main(sys.argv[1])
