#!/usr/bin/env python
"""Round-8 plan capture: dump .explain("formatted") for every declared
query (and the bench-only operator paths) to plans/r08/<name>_<tag>.txt.

Usage: python tools/dump_plans_r08.py before|after [only,names]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    os.environ["GSR_BENCH"] = "1"  # skip oracle aux dumps during capture

    import __spark_entry__ as em
    from geo_raster_spark.session import get_spark

    out_dir = os.path.join(REPO, "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="plan-dump-r08")
    spark.sparkContext.setLogLevel("ERROR")

    qs = em.queries()
    # queries whose construction RUNS jobs (streams, artifact round-trips)
    # get their plan captured anyway — the returned DataFrame is still lazy
    # enough to print; failures are recorded, not fatal.
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            df = fn(spark, SF_DIR)
            txt = plan_of(df)
        except Exception as exc:  # noqa: BLE001
            txt = f"PLAN CAPTURE FAILED: {exc!r}"
        with open(path, "w") as f:
            f.write(txt + "\n")
        print(name, "->", path)

    # bench-only operator paths (not in the registry)
    from geo_raster_spark import synth
    from geo_raster_spark.operators import footprint as fp_op, mosaic as mz
    from geo_raster_spark.plans.flagship import run_flagship_synthetic

    extras = {}
    if only is None or "flagship_pip_tile" in (only or set()):
        extras["flagship_pip_tile"] = run_flagship_synthetic(
            spark, n_images=100_000, n_zones=64, partitions=32)
    if only is None or "g5_tile_cut_400" in (only or set()):
        imgs = fp_op.with_footprint(synth.images_df(spark, 400, 32))
        extras["g5_tile_cut_400"] = mz.tile_cut(imgs, nodata=0.0)
    for name, df in extras.items():
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan_of(df) + "\n")
        print(name, "->", path)


if __name__ == "__main__":
    main()
