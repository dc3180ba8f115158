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

_SHIPPED_SESSIONS: set[int] = set()


def ensure_package_shipped(spark) -> None:
    sc = spark.sparkContext
    if id(sc) in _SHIPPED_SESSIONS:
        return
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
    sc.addPyFile(zpath)
    _SHIPPED_SESSIONS.add(id(sc))
