#!/usr/bin/env python
"""Codec throughput: MB/s per fmt for the image payload encode/decode paths.

The tile-cut pixel pipeline is codec-bound at the margins; this records the
per-format ceiling so BENCH numbers are attributable.  Pure driver-side
NumPy (the same code executors run inside applyInPandas).

Usage: python tools/codec_bench.py [side_px] [reps]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from geo_raster_spark import codecs

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 101
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    rng = np.random.default_rng(7)
    x = np.linspace(0, 5, side)
    img = np.clip(120 + 90 * np.sin(x)[:, None] * np.cos(x)[None, :]
                  + rng.normal(0, 12, (side, side)), 0, 255).astype(np.uint8)
    mb = img.nbytes / 1e6

    print(f"payload {side}x{side} uint8 ({img.nbytes:,} B), best of 3 x {reps} reps")
    print(f"{'fmt':6} {'enc MB/s':>9} {'dec MB/s':>9} {'ratio':>6}")
    for fmt in ("npy", "png", "jpeg", "jpg"):
        enc = codecs.encode(img, fmt)

        def best(f):
            t = []
            for _ in range(3):
                t0 = time.time()
                for _ in range(reps):
                    f()
                t.append(time.time() - t0)
            return reps * mb / min(t)

        e = best(lambda: codecs.encode(img, fmt))
        d = best(lambda: codecs.decode(enc, fmt))
        print(f"{fmt:6} {e:9.1f} {d:9.1f} {len(enc) / img.nbytes:6.2f}")


if __name__ == "__main__":
    main()
