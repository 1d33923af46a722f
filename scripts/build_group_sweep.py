"""Sweep SSSE_BUILD_GROUPS_PER_CPU at two parallelism levels to measure
how Arrow-group bundling moves build scaling efficiency (north_rule
threads axis). One bench.py subprocess per (gpc, master) — 3 suite reps
inside it (median); wand runs with 1 query so build dominates wall.

Usage: python scripts/build_group_sweep.py [gpc,gpc,...]
Writes BENCH/build_group_sweep.jsonl and prints one summary JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = int(os.environ.get("SPARK_GRAFT_SWEEP_DOCS", 2_000_000))


def main() -> None:
    gpcs = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,4,64").split(",")]
    results = []
    for gpc in gpcs:
        pair = {}
        for master, cpus in (("local[2]", 2), ("local[8]", 8)):
            subprocess.run(["pkill", "-f", "org.apache.spark"], check=False)
            time.sleep(2)
            env = dict(
                os.environ,
                SPARK_GRAFT_MASTER=master,
                SPARK_GRAFT_CPUS=str(cpus),
                SPARK_GRAFT_BENCH_DOCS=str(DOCS),
                SPARK_GRAFT_BENCH_QUERIES="1",
                SPARK_GRAFT_BENCH_ONLY="build,wand",
                SPARK_GRAFT_BENCH_REPS="3",
                SSSE_BUILD_GROUPS_PER_CPU=str(gpc),
                SPARK_GRAFT_EXEC_MEM="6g",
            )
            out = subprocess.run(
                [sys.executable, "bench.py"], cwd=REPO, env=env,
                capture_output=True, text=True, timeout=3600,
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(f"FAILED gpc={gpc} {master}:\n{out.stdout[-1000:]}\n{out.stderr[-1000:]}")
                continue
            r = json.loads(lines[-1])
            r["gpc"], r["master"] = gpc, master
            results.append(r)
            pair[master] = r
            print(json.dumps({
                "gpc": gpc, "master": master,
                "build_med_s": r["queries"]["build_index_webtext"],
                "build_reps_s": [t["build_index_webtext"] for t in r["reps"]],
                "docs_per_sec": r["build_docs_per_sec"],
            }), flush=True)
        if len(pair) == 2:
            lo = pair["local[2]"]["build_docs_per_sec"]
            hi = pair["local[8]"]["build_docs_per_sec"]
            print(json.dumps({"gpc": gpc, "build_eff_2_to_8": round(hi / (4 * lo), 3)}), flush=True)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "build_group_sweep.jsonl"), "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
