"""Ship this package to executor Python workers.

Local tests run with cwd on sys.path, but a driver process launched from
any other directory (or a real cluster) needs the package distributed —
the `spark-submit --py-files` pattern.  `ensure_shipped(spark)` zips the
package once per session and registers it with addPyFile.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED_SESSIONS: set[int] = set()


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED_SESSIONS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, zpath = tempfile.mkstemp(suffix=".zip", prefix="oqt_spark_pyfiles_")
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
                    "osmquadtree_rust_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED_SESSIONS.add(key)
