"""Cross-cutting runtime helpers."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the batch_public_spark package to Python workers.

    Closures sent through pandas UDFs / mapInPandas reference this package
    by module name; workers resolve imports from their own PYTHONPATH, NOT
    the driver's runtime ``sys.path`` — so a driver that merely
    ``sys.path.insert``-ed the repo (as the driver harness does) would crash
    workers with ModuleNotFoundError. ``addPyFile`` distributes a zip of the
    package to every executor exactly like ``spark-submit --py-files`` on a
    real cluster. Idempotent per SparkContext.
    """
    sc = spark.sparkContext
    if getattr(sc, "_bps_pyfile_added", False):
        return
    import batch_public_spark

    pkg_dir = os.path.dirname(os.path.abspath(batch_public_spark.__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"batch_public_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    sc.addPyFile(zpath)
    sc._bps_pyfile_added = True
