"""Ship the chaos_spark package to executors (spark-submit --py-files
analogue, self-serve).

Only code paths that run Python ON executors (mapInPandas /
applyInPandas closures, which cloudpickle pickles by module reference)
need this; pure-JVM DataFrame plans do not. Call :func:`ensure_shipped`
before building such a plan — it zips the package once per process and
``addPyFile``s it once per SparkContext, making the module importable in
executor Python workers regardless of the driver's cwd/PYTHONPATH.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()
_ZIP_PATH: str | None = None


def _build_zip() -> str | None:
    global _ZIP_PATH
    if _ZIP_PATH is not None:
        return _ZIP_PATH
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):  # already running from a py-files zip
        return None
    path = os.path.join(
        tempfile.gettempdir(), f"chaos_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(path, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    _ZIP_PATH = path
    return path


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    path = _build_zip()
    if path is not None:
        sc.addPyFile(path)
    _SHIPPED.add(key)
