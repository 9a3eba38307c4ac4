"""Scaling-efficiency evidence for the north rule (BASELINE.json:14).

No real cluster exists in this sandbox, so "N vs 4N executors" is
proxied by the SAME job on the SAME input at two core counts (driver
instruction: "local[8] and local[32], or N and 4N cores"). Methodology
(see BENCH/BASELINE.md for results + analysis):

- cluster-faithful setup: shuffle partitioning (64) and bucket count
  (64) are FIXED across runs — the task graph is identical, only
  parallelism changes;
- each measurement is its own JVM via spark-submit --py-files (the
  north rule's deployment mode) with a warmup replay first (JIT,
  codegen, parquet codecs), reporting best-of-N (steady state);
- data + spark.local.dir on tmpfs (/dev/shm): this VM's virtio disk
  serializes concurrent shuffle writers and would measure the disk,
  not the engine;
- G1 + spark.cleaner.periodicGC.interval=15s: local-mode block/
  broadcast cleanup is reference-queue driven; without periodic GC the
  heap bloats and multi-second full-GC pauses dominate (measured
  11.5 s max pause);
- primary pair is local[2] vs local[8]: this VM saturates memory
  bandwidth at ~8 threads (local[32] REGRESSES vs local[8] on every
  workload tested, including a plain repartition), so 8->32 measures
  the hypervisor, not the engine. local[32] is still reported.

Usage: python scripts/scaling_bench.py [--events 64000000] [--cores 2,8,32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHM = "/dev/shm/canal"

WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, sys.argv[6])
from canal_spark.session import get_spark
from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable
from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

cores = int(sys.argv[1]); log = sys.argv[2]; n_events = int(sys.argv[3])
runs = int(sys.argv[4]); epochs = int(sys.argv[5]); shm = sys.argv[7]
spark = get_spark(app=f"scaling_{cores}", master=f"local[{cores}]", shuffle_partitions=64,
                  extra_conf={"spark.local.dir": os.path.join(shm, "spark-local")})

warm_log = os.path.join(shm, "warm_log")
if not os.path.exists(os.path.join(warm_log, "part-p0000.parquet")):
    generate_changelog(warm_log, ChangelogSpec(n_events=100_000, n_partitions=8, n_keys=5_000))
wt = os.path.join(shm, "warm_table"); shutil.rmtree(wt, ignore_errors=True)
CdcEngine(spark, warm_log, SnapshotTable.create(wt, n_buckets=16), lsn_budget=10**9).run_to_completion()

results = []
best_wall = float("inf"); since_improved = 0
for run in range(runs):
    tbl = os.path.join(shm, f"scaling_table_{cores}"); shutil.rmtree(tbl, ignore_errors=True)
    tfr = int(os.environ.get("CANAL_SCALING_TFR", "0")) or None
    table = SnapshotTable.create(tbl, n_buckets=64, target_file_rows=tfr)
    thr = int(os.environ.get("CANAL_BCAST_THRESHOLD", "4000000"))
    eng = CdcEngine(spark, log, table, lsn_budget=1, broadcast_threshold_rows=thr,
                    write_mode=os.environ.get("CANAL_SCALING_WRITE_MODE", "cow"))
    _ = eng.extents
    eng.lsn_budget = eng.budget_for_epochs(epochs)  # exactly `epochs` epochs, no stub tail
    t0 = time.monotonic(); eng.run_to_completion(); wall = time.monotonic() - t0
    lin = table.lineage_df(spark).toPandas(); applied = int(lin.n_events.sum())
    results.append({"wall_sec": round(wall, 2), "events_applied": applied,
                    "events_per_sec": round(applied / wall, 1),
                    "epochs": int(table.current_epoch() or 0)})
    # steady-state convergence, uniform across levels: run until the
    # best wall has not improved by >2% for 2 consecutive runs (JIT /
    # codegen plateau; a fixed small N under-warms some levels), with
    # a floor of 4 runs and a cap of `runs`
    if wall < best_wall * 0.98:
        best_wall = wall; since_improved = 0
    else:
        since_improved += 1
        if run >= 3 and since_improved >= 2:
            break
best = max(results, key=lambda r: r["events_per_sec"])
print("SCALING_RESULT " + json.dumps({"cores": cores, "runs": results, "best": best}), flush=True)
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=64_000_000)
    # cap must clear the 4-run convergence floor in the worker loop —
    # a cap of 3 silently disables convergence and under-reports every
    # level (measured: the one 0.68-efficiency batch was exactly this)
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--cores", default="2,8,32")
    ap.add_argument("--write-mode", choices=("cow", "mor"), default="cow",
                    help="epoch apply strategy for the measured replay")
    ap.add_argument("--out", default="scaling_result.json")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

    os.makedirs(SHM, exist_ok=True)
    # update-heavy CDC key profile: ~events/80 distinct keys, zipf-hot
    spec = ChangelogSpec(
        n_events=args.events, n_partitions=32, n_keys=max(1000, args.events // 80), seed=42
    )
    log = os.path.join(SHM, f"log_{args.events}_{spec.n_keys}")
    if not os.path.exists(os.path.join(log, "part-p0000.parquet")):
        print(f"generating {args.events} events ...", flush=True)
        generate_changelog(log, spec)

    worker = tempfile.NamedTemporaryFile("w", suffix=".py", delete=False)
    worker.write(WORKER)
    worker.close()
    zip_path = "/tmp/canal_spark_bench.zip"
    subprocess.run(["zip", "-qr", zip_path, "canal_spark"], cwd=REPO, check=True)

    os.environ["CANAL_SCALING_WRITE_MODE"] = args.write_mode
    out = {}
    for cores in [int(c) for c in args.cores.split(",")]:
        print(f"== local[{cores}] ==", flush=True)
        proc = subprocess.run(
            [
                "spark-submit",
                "--master", f"local[{cores}]",
                "--driver-memory", "32g",
                "--conf", "spark.driver.extraJavaOptions=-XX:+UseG1GC",
                "--conf", "spark.cleaner.periodicGC.interval=15s",
                "--py-files", zip_path,
                worker.name, str(cores), log, str(args.events),
                str(args.runs), str(args.epochs), REPO, SHM,
            ],
            capture_output=True, text=True, check=False,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("SCALING_RESULT ")]
        if not line:
            print(proc.stdout[-3000:], proc.stderr[-3000:])
            raise SystemExit(f"worker failed for local[{cores}]")
        out[cores] = json.loads(line[0][len("SCALING_RESULT "):])
        print(json.dumps(out[cores]["best"]), flush=True)

    report = {"n_events": args.events, "n_keys": spec.n_keys,
              "write_mode": args.write_mode,
              "levels": {c: v for c, v in out.items()}}
    if 2 in out and 8 in out:
        s = out[8]["best"]["events_per_sec"] / out[2]["best"]["events_per_sec"]
        report["speedup_2_to_8"] = round(s, 2)
        report["efficiency_N_to_4N"] = round(s / 4.0, 3)
    if 8 in out and 32 in out:
        report["speedup_8_to_32"] = round(
            out[32]["best"]["events_per_sec"] / out[8]["best"]["events_per_sec"], 2
        )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # bare names land in BENCH/; paths (relative or absolute) are
    # honored as given — `--out BENCH/x.json` must not become
    # BENCH/BENCH/x.json (and then crash the report write after an
    # 18-minute measurement)
    out_path = (
        args.out
        if os.sep in args.out or os.path.isabs(args.out)
        else os.path.join(REPO, "BENCH", args.out)
    )
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
