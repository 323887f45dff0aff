"""North-rule packaging drive: the whole pipeline ships via
``spark-submit --py-files dist/peri_spark.zip jobs/validate_job.py`` and
an interrupted run resumes from the ledger — exercised with the REAL
spark-submit binary in a fresh JVM, importing peri_spark ONLY from the
zip artifact (cwd outside the repo), over real testdata parquet."""

import json
import os
import shutil
import subprocess
import sys

import pytest


def _find_spark_submit():
    if shutil.which("spark-submit"):
        return "spark-submit"
    try:
        import pyspark
        cand = os.path.join(os.path.dirname(pyspark.__file__),
                            "bin", "spark-submit")
        if os.path.exists(cand):
            return cand
    except ImportError:
        pass
    return None


@pytest.mark.skipif(_find_spark_submit() is None,
                    reason="spark-submit binary not found")
def test_spark_submit_py_files_run_and_resume(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from peri_spark.packaging import build_zip

    zip_path = build_zip("dist")
    assert zipfile_has_module(zip_path, "peri_spark/suite.py")
    job = os.path.join(repo, "jobs", "validate_job.py")
    inp = "/root/testdata/sf0.001/documents.parquet"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY import source

    def submit(*extra):
        return subprocess.run(
            [_find_spark_submit(), "--master", "local[2]",
             "--py-files", zip_path,
             "--conf", "spark.ui.enabled=false",
             "--conf", "spark.sql.shuffle.partitions=4",
             job, "--input", inp,
             "--output", str(tmp_path / "out"),
             "--ledger", str(tmp_path / "ledger"),
             "--partition-col", "lang", *extra],
            capture_output=True, text=True, timeout=420,
            cwd=str(tmp_path), env=env)  # cwd OUTSIDE the repo

    p1 = submit()
    assert p1.returncode == 0, p1.stderr[-3000:]
    s1 = json.loads([l for l in p1.stdout.splitlines()
                     if l.startswith("{")][-1])
    assert s1["n_partitions"] > 0 and s1["n_rows"] > 0

    p2 = submit("--resume")
    assert p2.returncode == 0, p2.stderr[-3000:]
    s2 = json.loads([l for l in p2.stdout.splitlines()
                     if l.startswith("{")][-1])
    assert s2["n_partitions"] == 0  # everything checkpointed → no rework
    assert os.path.isdir(str(tmp_path / "out" / "violations"))


def zipfile_has_module(zip_path, name):
    import zipfile
    with zipfile.ZipFile(zip_path) as z:
        return name in z.namelist()
