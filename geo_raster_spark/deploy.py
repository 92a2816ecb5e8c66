"""Self-deployment: ship the package to executors (the --py-files path).

On a real cluster the engine ships via ``spark-submit --py-files gsr.zip``.
When embedded in a host-owned SparkSession (the driver harness, notebooks),
``ensure_py_files(spark)`` zips this package once and registers it with
``sc.addPyFile`` so executor Python workers can unpickle UDF closures that
reference ``geo_raster_spark``.  Idempotent per session.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_FLAG = "_geo_raster_spark_pyfiles_added"


def ensure_py_files(spark) -> None:
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(),
                         f"geo_raster_spark_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    sc.addPyFile(zpath)
    setattr(sc, _FLAG, True)
