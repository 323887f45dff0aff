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


@pytest.mark.skipif(_find_spark_submit() is None,
                    reason="spark-submit binary not found")
def test_spark_submit_expectations_gate(tmp_path):
    """--expectations-json: exit 0 on a passing gate, 1 on a failing
    one, verdict embedded in the summary; the run is ledger-recorded
    either way (the gate changes ship/block, never the checkpoint)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from peri_spark.packaging import build_zip

    zip_path = build_zip("dist")
    job = os.path.join(repo, "jobs", "validate_job.py")
    inp = "/root/testdata/sf0.001/documents.parquet"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)

    def submit(rules, tag):
        ej = tmp_path / f"exp_{tag}.json"
        ej.write_text(json.dumps(rules))
        return subprocess.run(
            [_find_spark_submit(), "--master", "local[2]",
             "--py-files", zip_path,
             "--conf", "spark.ui.enabled=false",
             "--conf", "spark.sql.shuffle.partitions=4",
             job, "--input", inp,
             "--output", str(tmp_path / f"out_{tag}"),
             "--ledger", str(tmp_path / f"led_{tag}"),
             "--partition-col", "lang",
             "--expectations-json", str(ej)],
            capture_output=True, text=True, timeout=420,
            cwd=str(tmp_path), env=env)

    # documents vs the flagship code_files schema: several violations
    # per row (missing repo/path/commit/content), so the passing gate
    # budgets ratio<=10; the failing gate demands 0
    p_ok = submit({"n_rows": ["gte", 100],
                   "n_violations": ["ratio_lte", 10.0]}, "ok")
    assert p_ok.returncode == 0, p_ok.stderr[-3000:]
    s_ok = json.loads([l for l in p_ok.stdout.splitlines()
                       if l.startswith("{")][-1])
    assert s_ok["expectations"]["passed"]

    p_bad = submit({"n_violations": ["ratio_lte", 0.0]}, "bad")
    assert p_bad.returncode == 1, (p_bad.returncode, p_bad.stderr[-2000:])
    s_bad = json.loads([l for l in p_bad.stdout.splitlines()
                        if l.startswith("{")][-1])
    assert not s_bad["expectations"]["passed"]
    assert s_bad["n_rows"] > 0            # work still ran + recorded

    # idempotent resume of the PASSED run: nothing pending -> the gate
    # is skipped (n_rows=0 would fail every floor), exit stays 0
    ej = tmp_path / "exp_ok.json"
    p_res = subprocess.run(
        [_find_spark_submit(), "--master", "local[2]",
         "--py-files", zip_path,
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         job, "--input", inp,
         "--output", str(tmp_path / "out_ok"),
         "--ledger", str(tmp_path / "led_ok"),
         "--partition-col", "lang", "--resume",
         "--expectations-json", str(ej)],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path), env=env)
    assert p_res.returncode == 0, p_res.stderr[-2000:]
    s_res = json.loads([l for l in p_res.stdout.splitlines()
                        if l.startswith("{")][-1])
    assert s_res["n_partitions"] == 0
    assert "skipped" in s_res["expectations"]
