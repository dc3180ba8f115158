"""Ship the fairy_spark package to executor Python workers.

Module-level Python functions (pandas UDFs, applyInPandas folds) are
cloudpickled BY REFERENCE — the worker must be able to `import
fairy_spark`. That holds only if the driver's cwd happens to be the
repo root; an external harness loading `__spark_entry__.py` by path
from anywhere else would crash every UDF-bearing query with
ModuleNotFoundError (observed). The standard deployment fix: zip the
package once per session and sc.addPyFile it — workers then resolve
the import from the shipped zip regardless of anyone's cwd.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

# Keyed on applicationId, which is unique per SparkContext lifetime —
# id(sc) can be REUSED by a new context after the old one is GC'd,
# silently skipping addPyFile and reintroducing the executor
# ModuleNotFoundError this module exists to fix.
_SHIPPED_APPS: set[str] = set()
_ZIP_CACHE: str | None = None


def _package_zip() -> str:
    """Build the package zip once per process and reuse it — the
    package source doesn't change mid-process, and re-zipping per
    context leaked a temp file each time."""
    global _ZIP_CACHE
    if _ZIP_CACHE is not None and os.path.exists(_ZIP_CACHE):
        return _ZIP_CACHE
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, zpath = tempfile.mkstemp(prefix="fairy_spark_ship_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "fairy_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    _ZIP_CACHE = zpath
    return zpath


def ensure_package_shipped(spark) -> None:
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED_APPS:
        return
    sc.addPyFile(_package_zip())
    _SHIPPED_APPS.add(app_id)
