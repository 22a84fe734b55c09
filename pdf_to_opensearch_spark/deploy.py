"""Executor-side packaging (the ``spark-submit --py-files`` story).

On a real cluster the package ships via ``spark-submit --py-files
pdf_to_opensearch_spark.zip``. For sessions created elsewhere (driver
harnesses, notebooks, local mode with an arbitrary cwd),
:func:`ensure_py_files` makes the package importable on executors by
zipping its own sources and ``addPyFile``-ing the archive — the
programmatic equivalent.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_MARKER = "_pdf_to_opensearch_pyfiles_added"


def package_zip() -> str:
    """Zip this package's sources into a stable temp path; return it."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(),
                         f"pdf_to_opensearch_spark_{os.getpid()}.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return zpath


def ensure_py_files(spark: SparkSession) -> None:
    """Idempotently ship this package to executors via addPyFile."""
    sc = spark.sparkContext
    if getattr(sc, _MARKER, False):
        return
    sc.addPyFile(package_zip())
    setattr(sc, _MARKER, True)


if __name__ == "__main__":
    print(package_zip())
