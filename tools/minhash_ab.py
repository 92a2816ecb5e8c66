#!/usr/bin/env python
"""A/B: minhash_lsh signature engine — interpreted JVM HOFs vs NumPy
mapInPandas (VERDICT r2 item 8).  Runs both back-to-back in ONE JVM at the
bench SF, 2 rounds each, prints per-run seconds + pair counts.

Usage: python tools/minhash_ab.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from geo_raster_spark.session import get_spark
    from geo_raster_spark.operators import dedup
    spark = get_spark(app_name="minhash-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    docs.count()  # warm IO
    results = {}
    for rnd in range(2):
        for eng in ("hof", "numpy"):
            t0 = time.time()
            out = dedup.minhash_lsh(docs, jaccard_threshold=0.5, engine=eng)
            n = out.count()
            dt = time.time() - t0
            out.unpersist()
            results.setdefault(eng, []).append(round(dt, 2))
            print(f"round {rnd} engine={eng:5s} pairs={n} {dt:.2f}s", flush=True)
    print({k: v for k, v in results.items()})

if __name__ == "__main__":
    main()
