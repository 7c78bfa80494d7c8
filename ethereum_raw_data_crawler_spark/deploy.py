"""Worker-side import bootstrap — the ``spark-submit --py-files`` story.

When a SparkSession is created by an external harness (the driver's
verify loop, a notebook) the executors' Python workers don't necessarily
have this repo on their import path; any pandas UDF that pickles a
reference to a package function would die with ModuleNotFoundError at
unpickle time. ``ship_package`` zips the package once per session and
registers it via ``sc.addPyFile`` — exactly what a production
``spark-submit --py-files pkg.zip`` deployment does.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG = "ethereum_raw_data_crawler_spark"
_SHIPPED_ATTR = "_erdcs_pkg_shipped"


def ship_package(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{_PKG}-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.join(_PKG, os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    setattr(sc, _SHIPPED_ATTR, True)
