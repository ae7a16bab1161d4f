"""Cluster-launch packaging: the engine must run with the package
shipped as a zip (north_rule: spark-submit --py-files on a
multi-executor cluster; scripts/submit.sh builds exactly this zip).

Zipimport is stricter than a directory on sys.path: __file__-relative
file reads, missing package data, and non-.py resources all break only
under the zip. This test runs the real pipeline — driver AND Python
workers (the pandas-UDF signature stage) — in a subprocess whose only
source of ``deduplidog_spark`` is the zip, from a cwd outside the repo.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

DRIVER = """
import os, sys, tempfile

# the zip (argv[1]) must be the ONLY place the package can come from
zip_path = sys.argv[1]
sys.path = [p for p in sys.path if "repo" not in p]
sys.path.insert(0, zip_path)

import deduplidog_spark
assert zip_path in deduplidog_spark.__file__, deduplidog_spark.__file__

from deduplidog_spark import get_spark, DedupConfig
from deduplidog_spark import fixtures as FX
from deduplidog_spark.pipeline import dedupe

spark = get_spark("pyfiles-smoke", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
# session.py must have routed workers at the zip, not the repo
assert zip_path in os.environ.get("PYTHONPATH", ""), os.environ.get("PYTHONPATH")

tmp = tempfile.mkdtemp()
rows, truth = FX.corpus_c_rows(n_repos=2, files_per_repo=12, seed=7)
FX.to_spark_df(spark, rows).write.parquet(f"{tmp}/corpus.parquet")
files = spark.read.parquet(f"{tmp}/corpus.parquet")
# minhash mode exercises the Arrow signature UDF => workers must
# import the package from the zip too
res = dedupe(files, DedupConfig(mode="minhash", checkpoint_dir=f"{tmp}/ckpt"))
n = res.plan.count()
assert n > 0, "expected a non-empty plan on the planted corpus"
spark.stop()
print(f"PYFILES_OK rows={n}")
"""


def test_pipeline_runs_from_pyfiles_zip(tmp_path):
    zip_path = tmp_path / "deduplidog_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "deduplidog_spark").rglob("*")):
            if py.is_file() and "__pycache__" not in py.parts:
                zf.write(py, py.relative_to(REPO))

    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)

    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "4"
    # scrub any inherited path to the working tree: the zip must be
    # self-sufficient exactly as under spark-submit --py-files
    env["PYTHONPATH"] = ""
    proc = subprocess.run(
        [sys.executable, str(driver), str(zip_path)],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "PYFILES_OK" in proc.stdout, proc.stdout
