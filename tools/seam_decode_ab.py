"""Codec-seam decode A/B (round-4 verdict #6): quantify the native-decode
headroom behind ``codecs.register`` with the JVM ImageIO decoder
(``geo_raster_spark.fastjpeg``), through the UNCHANGED pipeline and with
the 40 dB parity gate still enforced.

Two measurements:

1. driver micro-bench — ms/Mpix for the pure-NumPy baseline JPEG decoder
   vs the seam-registered JVM decoder, same payloads, PSNR-vs-truth gate
   on both;
2. Spark pipeline A/B — ``tile_cut`` over 400 REAL-JFIF-payload images at
   local[32], one subprocess per variant (GSR_FASTJPEG unset / =1) so each
   JVM+worker pool is cold-started identically; variants alternate A/B/A/B
   for host-noise pairing.  Each run also rebuilds the same tiles from
   LOSSLESS png payloads and reports the min per-tile PSNR of the jpg-run
   tiles against them (the parity gate).

Usage:  python tools/seam_decode_ab.py            # full A/B, prints JSON
        python tools/seam_decode_ab.py --spark-run [--fast]   # one variant
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES = 256      # x 1.44 Mpix each -> ~370 Mpix of decode, the hot part
IMG_PX = 1200
PAIRS = 3


def _images_pdf(fmt: str):
    """Decode-DOMINATED fixture: 1.44 Mpix scenes, each ~one grid tile
    (cell 0.0008 deg), so the pipeline cost is the decode of the full
    source, not the paint (the output tile gathers only 101x101 samples).
    This is the real shape of a Landsat-scene tile-cut: big source scene,
    small output window."""
    import pandas as pd

    from geo_raster_spark import codecs, synth
    cache = f"/tmp/gsr_seam_ab/{fmt}_{N_IMAGES}_{IMG_PX}.parquet"
    if os.path.exists(cache):
        return pd.read_parquet(cache)
    rows = []
    cell = 0.0008
    span = IMG_PX * cell                     # ~0.96 deg, inside one tile
    for i in range(N_IMAGES):
        truth = synth.image_pixels(i, IMG_PX, IMG_PX, i * 2654435761 % 2**32)
        minx = -170.0 + (i % 64) * 5.0 + 0.02
        maxy = 60.0 - (i // 64) * 5.0 - 0.02
        rows.append({
            "image_id": f"scene{i:05d}",
            "bytes": codecs.encode(truth, fmt),
            "fmt": fmt, "w": IMG_PX, "h": IMG_PX,
            "minx": minx, "miny": maxy - span,
            "maxx": minx + span, "maxy": maxy,
            "gt": [minx, cell, 0.0, maxy, 0.0, -cell],
        })
    pdf = pd.DataFrame(rows)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    pdf.to_parquet(cache)
    return pdf


def spark_run(fast: bool):
    if fast:
        os.environ["GSR_FASTJPEG"] = "1"
    import numpy as np

    from geo_raster_spark import codecs
    from geo_raster_spark.operators import mosaic as mz
    from geo_raster_spark.session import get_spark

    spark = get_spark(app_name="seam-ab", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    jpg = spark.createDataFrame(_images_pdf("jpg"))
    png = spark.createDataFrame(_images_pdf("png"))

    # warm-up: full plan once (JIT + Arrow + worker pool + fastjpeg helpers)
    mz.tile_cut(jpg, nodata=0.0).count()

    t0 = time.time()
    tiles_jpg = {r["tile_tag"]: bytes(r["data"])
                 for r in mz.tile_cut(jpg, nodata=0.0).collect()}
    sec = time.time() - t0

    tiles_png = {r["tile_tag"]: bytes(r["data"])
                 for r in mz.tile_cut(png, nodata=0.0).collect()}
    assert set(tiles_jpg) == set(tiles_png)
    min_psnr = min(
        codecs.psnr(codecs.decode_png(tiles_png[t]).astype(float),
                    codecs.decode_png(tiles_jpg[t]).astype(float))
        for t in tiles_jpg)
    print(json.dumps({"fast": fast, "tile_cut_sec": round(sec, 3),
                      "n_tiles": len(tiles_jpg),
                      "min_tile_psnr_vs_lossless": round(min_psnr, 2)}))


def micro_bench():
    import numpy as np

    from geo_raster_spark import codecs, fastjpeg, synth
    truth = synth.image_pixels(1, 1000, 1000, 12345)
    payload = codecs.encode(truth, "jpg")

    def time_fn(fn, reps):
        fn(payload)  # warm
        t0 = time.time()
        for _ in range(reps):
            out = fn(payload)
        return (time.time() - t0) / reps, out

    t_np, out_np = time_fn(lambda d: codecs.decode(d, "jpg"), 5)
    t_jv, out_jv = time_fn(fastjpeg.decode, 20)
    res = {
        "numpy_ms_per_mpix": round(t_np * 1000, 1),
        "imageio_ms_per_mpix": round(t_jv * 1000, 1),
        "speedup": round(t_np / t_jv, 1),
        "numpy_psnr": round(codecs.psnr(truth, out_np), 2),
        "imageio_psnr": round(codecs.psnr(truth, out_jv), 2),
        "cross_psnr": round(codecs.psnr(out_np, out_jv), 2),
    }
    fastjpeg.close()
    return res


def main():
    if "--spark-run" in sys.argv:
        spark_run("--fast" in sys.argv)
        return
    micro = micro_bench()
    print("micro:", json.dumps(micro), file=sys.stderr)
    runs = {"default": [], "fast": []}
    psnrs = []
    for _ in range(PAIRS):
        for fast in (False, True):
            cmd = [sys.executable, os.path.abspath(__file__), "--spark-run"]
            if fast:
                cmd.append("--fast")
            env = {k: v for k, v in os.environ.items() if k != "GSR_FASTJPEG"}
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 env=env, check=True).stdout
            row = json.loads([ln for ln in out.splitlines()
                              if ln.startswith("{")][-1])
            runs["fast" if fast else "default"].append(row["tile_cut_sec"])
            psnrs.append(row["min_tile_psnr_vs_lossless"])
            print("run:", json.dumps(row), file=sys.stderr)
    med = {k: sorted(v)[len(v) // 2] for k, v in runs.items()}
    print(json.dumps({
        "micro": micro,
        "tile_cut_400_jfif_sec": runs,
        "tile_cut_median_default": med["default"],
        "tile_cut_median_fast": med["fast"],
        "tile_cut_speedup": round(med["default"] / med["fast"], 2),
        "min_tile_psnr_all_runs": min(psnrs),
        "parity_gate_40db": min(psnrs) >= 40.0,
    }))


if __name__ == "__main__":
    main()
