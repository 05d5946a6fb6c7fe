"""True ``spark-submit --py-files`` packaging smoke.

Everything else in the suite imports the package from the repo checkout.
A real cluster submission has neither the checkout nor PYTHONPATH — the
driver and executors see ONLY the zip shipped via ``--py-files``. This
test reproduces that contract end-to-end: build ``mob_spark.zip`` with
:func:`packaging.build_pyfiles_zip`, copy ``run_job.py`` into a bare
directory, strip ``PYTHONPATH``, and run a full quality-filter job
through the ``spark-submit`` launcher in a fresh JVM. If any job-path
module forgot an import, kept module-level Spark state, or leaked a
repo-relative path, this fails while the in-process job tests stay green.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_zip_is_reproducible_and_complete(tmp_path):
    from monotonic_optimal_binning_spark.packaging import build_pyfiles_zip

    z1 = build_pyfiles_zip(str(tmp_path / "a.zip"))
    z2 = build_pyfiles_zip(str(tmp_path / "b.zip"))
    assert open(z1, "rb").read() == open(z2, "rb").read()

    names = set(zipfile.ZipFile(z1).namelist())
    assert "monotonic_optimal_binning_spark/__init__.py" in names
    assert "monotonic_optimal_binning_spark/jobs.py" in names
    assert "monotonic_optimal_binning_spark/operators/binning.py" in names
    assert not any("__pycache__" in n for n in names)
    assert all(n.endswith(".py") for n in names)


def test_spark_submit_pyfiles_quality_filter(tmp_path):
    """spark-submit --py-files mob_spark.zip run_job.py quality-filter."""
    from monotonic_optimal_binning_spark.packaging import build_pyfiles_zip

    zip_path = build_pyfiles_zip(str(tmp_path / "mob_spark.zip"))

    # bare submit dir: run_job.py + zip only — no package on disk
    submit_dir = tmp_path / "submit"
    submit_dir.mkdir()
    shutil.copy(os.path.join(REPO, "run_job.py"), submit_dir / "run_job.py")

    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    workdir = str(tmp_path / "run1")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    cmd = [
        spark_submit,
        "--master", "local[2]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", zip_path,
        str(submit_dir / "run_job.py"),
        "quality-filter",
        "--input", os.path.join(SF_DIR, "documents.parquet"),
        "--workdir", workdir,
        "--min-quality", "0.2",
        "--min-tokens", "5",
        "--audit",
    ]
    proc = subprocess.run(
        cmd, cwd=str(submit_dir), env=env,
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, (
        f"spark-submit failed\nSTDOUT:\n{proc.stdout[-3000:]}\n"
        f"STDERR:\n{proc.stderr[-3000:]}"
    )

    stage = os.path.join(workdir, "stage_quality_filter")
    with open(os.path.join(stage, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["stage"] == "quality_filter"
    assert manifest["rows_written"] > 0
    assert manifest["extra_metrics"]["audit_total"] >= (
        manifest["extra_metrics"]["audit_kept"]
    )
    # lineage report printed by the job and written under the workdir
    with open(os.path.join(workdir, "_LINEAGE.json")) as f:
        lineage = json.load(f)
    assert lineage["n_stages"] == 1
    assert lineage["total_rows"] == manifest["rows_written"]
    # the filtered slice is readable parquet with the input schema
    assert os.path.isdir(os.path.join(stage, "data"))
