"""Packaging smoke: build the --py-files zip and run a real spark-submit job
from OUTSIDE the repo (so only the zip provides the package)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def test_zip_layout(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from package_pyfiles import build

    out = build(str(tmp_path / "pkg.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "geomesa_spark/__init__.py" in names
    assert "geomesa_spark/operators/spatial_join.py" in names
    assert "geomesa_spark/sources/parquet_scan.py" in names
    assert not any("__pycache__" in n for n in names)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_with_pyfiles(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from package_pyfiles import build

    zip_path = build(str(tmp_path / "geomesa_spark.zip"))
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(ROOT, "scripts", "submit_job.py"),
            "300",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo: the zip must provide the package
        timeout=420,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("SUBMITRESULT ")]
    assert lines, f"no result line; stderr tail: {proc.stderr[-1500:]}"
    res = json.loads(lines[-1][len("SUBMITRESULT "):])
    assert res["n_images"] > 0 and res["n_tiles"] > 0


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_with_extension_jar(tmp_path):
    """Full deployment path for the Catalyst extension: spark-submit with
    --py-files (engine) + --jars (rule) + spark.sql.extensions, run from
    OUTSIDE the repo. The job reports rows AND whether the injected bbox
    conjuncts reached the parquet scan in that packaged JVM."""
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from package_pyfiles import build

    sys.path.insert(0, ROOT)
    from geomesa_spark.extensions import EXTENSION_CLASS, build_extensions_jar

    zip_path = build(str(tmp_path / "geomesa_spark.zip"))
    jar_path = build_extensions_jar()
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            "--jars", jar_path,
            "--conf", f"spark.sql.extensions={EXTENSION_CLASS}",
            os.path.join(ROOT, "scripts", "submit_ext_job.py"),
            "20000",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=420,
    )
    lines = [
        l for l in proc.stdout.splitlines() if l.startswith("SUBMITEXTRESULT ")
    ]
    assert lines, f"no result line; stderr tail: {proc.stderr[-1500:]}"
    res = json.loads(lines[-1][len("SUBMITEXTRESULT "):])
    assert res["rows"] > 0
    assert res["pushed"] is True
    assert res["extension_conf"] == EXTENSION_CLASS


def test_dist_zip_is_fresh():
    """dist/geomesa_spark.zip must contain every module of the package —
    a stale deployment artifact (round-3 caught jpeg/av/media missing) is a
    silent prod failure at spark-submit time. dist/ is NOT in version
    control (build artifacts untracked per r4 ADVICE #5), so a fresh
    checkout builds it here first — the assertion then guards the PACKAGER
    (a module the walk finds but the zip lacks = packager bug)."""
    import os
    import zipfile

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = os.path.join(root, "dist", "geomesa_spark.zip")
    if not os.path.exists(zpath):
        sys.path.insert(0, os.path.join(root, "scripts"))
        from package_pyfiles import build

        build(zpath)
    names = set(zipfile.ZipFile(zpath).namelist())
    for dirpath, _d, files in os.walk(os.path.join(root, "geomesa_spark")):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if fn.endswith(".py"):
                rel = os.path.relpath(os.path.join(dirpath, fn), root)
                assert rel.replace(os.sep, "/") in names, f"stale zip: {rel}"
