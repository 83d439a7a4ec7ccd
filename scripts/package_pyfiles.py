#!/usr/bin/env python
"""Package the engine for `spark-submit --py-files` (north-rule packaging).

Produces dist/geomesa_spark.zip containing the geomesa_spark package; ship it
with:

    spark-submit --py-files dist/geomesa_spark.zip your_job.py

Pure-Python + numpy/pandas/pyarrow deps (preinstalled on executors), so one
zip is the entire deployment artifact.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "geomesa_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(ROOT, "geomesa_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build())
