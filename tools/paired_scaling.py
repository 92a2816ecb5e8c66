#!/usr/bin/env python
"""Paired-window scaling efficiency: back-to-back (local[2], local[8])
flagship runs in fresh JVMs, efficiency computed WITHIN each pair.

Why: the shared VM's host-steal profile drifts on the ~10-minute timescale
the full protocol (tools/scaling_run.py) spans between its per-level runs —
an identical trivial baseline job at local[2] swung 15% between rounds on
its own.  Pairing the two levels inside one noise window removes that
drift; the median over pairs is the round-3 claim in BENCH/BASELINE.md.

Usage: python tools/paired_scaling.py [n_pairs] [n_images]
"""
import subprocess
import sys

REPO = "/root/repo"
CHILD = '''
import sys, time
sys.path.insert(0, "%s")
from geo_raster_spark.session import get_spark
spark = get_spark(app_name="paired", cores=int(sys.argv[1]), shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
from geo_raster_spark.plans.flagship import run_flagship_synthetic
n = int(sys.argv[2])
run_flagship_synthetic(spark, n_images=200_000, n_zones=64, partitions=128).count()
best = None
for _ in range(3):
    t0 = time.time()
    run_flagship_synthetic(spark, n_images=n, n_zones=64, partitions=128).count()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print("RESULT", n / best)
''' % REPO


def run(cores: int, n: int) -> float:
    out = subprocess.run([sys.executable, "-c", CHILD, str(cores), str(n)],
                         capture_output=True, text=True, timeout=1800)
    for ln in out.stdout.splitlines()[::-1]:
        if ln.startswith("RESULT"):
            return float(ln.split()[1])
    raise RuntimeError(out.stderr[-500:])


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 192_000_000
    effs = []
    for i in range(n_pairs):
        p2 = run(2, n)
        p8 = run(8, n)
        e = p8 / (4 * p2)
        effs.append(e)
        print(f"pair {i}: local[2]={p2/1e6:.2f}M/s local[8]={p8/1e6:.2f}M/s "
              f"eff={e:.3f}", flush=True)
    effs.sort()
    print("effs:", [round(e, 3) for e in effs],
          "median:", round(effs[len(effs) // 2], 3))


if __name__ == "__main__":
    main()
