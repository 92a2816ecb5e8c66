"""Paired regression A/B (round-4 verdict #2): did flagship_pip_tile /
g5_tile_cut_400 / w3_stateful_sessions regress between round 3 and the
current head, or was BENCH_r04's drift host noise?

Protocol (the repo's trusted one, tools/paired_scaling.py): the SAME
runner script alternates between the round-3 code (git worktree at the
r3 artifact commit) and the current head, one fresh JVM per run, within
one noise window — so host steal hits both sides equally.  Medians of 3
pairs are compared.

Usage: python tools/paired_regression_ab.py [r3_commit]  (default bd78230)
Writes BENCH/regression_ab_r5.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R3_COMMIT = sys.argv[1] if len(sys.argv) > 1 else "bd78230"
R3_DIR = "/tmp/gsr_r3_worktree"
PAIRS = 3

_CHILD = r"""
import json, os, sys, time
repo = sys.argv[1]
os.chdir(repo)
sys.path.insert(0, repo)
os.environ["GSR_BENCH"] = "1"
from geo_raster_spark.session import get_spark
from geo_raster_spark.plans.flagship import run_flagship_synthetic
spark = get_spark(app_name="regression-ab", cores=32)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as em
qs = em.queries()
spark.range(1000).count()
out = {}
run_flagship_synthetic(spark, n_images=50_000, n_zones=64,
                       partitions=32).count()
t0 = time.time()
run_flagship_synthetic(spark, n_images=1_000_000, n_zones=64, hot=False,
                       partitions=32).count()
out["flagship_pip_tile"] = round(time.time() - t0, 3)
from geo_raster_spark import synth
from geo_raster_spark.operators import footprint as fp, mosaic as mz
mz.tile_cut(fp.with_footprint(synth.images_df(spark, 50, 8)),
            nodata=0.0).count()
t0 = time.time()
mz.tile_cut(fp.with_footprint(synth.images_df(spark, 400, 32)),
            nodata=0.0).count()
out["g5_tile_cut_400"] = round(time.time() - t0, 3)
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qs["w3_stateful_sessions"](spark, sf).count()
t0 = time.time()
qs["w3_stateful_sessions"](spark, sf).count()
out["w3_stateful_sessions"] = round(time.time() - t0, 3)
print(json.dumps(out))
"""


def run_child(repo_path: str) -> dict:
    child = "/tmp/gsr_regression_child.py"
    with open(child, "w") as f:
        f.write(_CHILD)
    out = subprocess.run([sys.executable, child, repo_path],
                         capture_output=True, text=True, check=True).stdout
    return json.loads([ln for ln in out.splitlines()
                       if ln.startswith("{")][-1])


def main():
    if not os.path.exists(R3_DIR):
        subprocess.run(["git", "worktree", "add", "--detach", R3_DIR,
                        R3_COMMIT], cwd=REPO, check=True,
                       capture_output=True)
    sides = {"r3": R3_DIR, "head": REPO}
    runs = {k: [] for k in sides}
    for i in range(PAIRS):
        for name, path in sides.items():
            row = run_child(path)
            runs[name].append(row)
            print(f"pair {i} {name}: {json.dumps(row)}", file=sys.stderr)
    med = {
        side: {q: sorted(r[q] for r in rows)[len(rows) // 2]
               for q in rows[0]}
        for side, rows in runs.items()
    }
    result = {
        "r3_commit": R3_COMMIT, "pairs": PAIRS, "runs": runs,
        "medians": med,
        "head_over_r3": {q: round(med["head"][q] / med["r3"][q], 3)
                         for q in med["head"]},
    }
    out_path = os.path.join(REPO, "BENCH", "regression_ab_r5.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["medians"]))
    print(json.dumps(result["head_over_r3"]))


if __name__ == "__main__":
    main()
