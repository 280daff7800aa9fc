"""North-rule deployment shape: the REAL ``spark-submit --py-files``
job — fresh JVM, package zip as the only distribution channel, neutral
cwd — extracts a fixture corpus byte-identically and writes the
resumable sink layout."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_pyfiles_job(spark, fixture_docs, pages_parquet, goldens, tmp_path):
    from pvsyst_pdf_parser_spark.packaging import build_package_zip

    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    # the zip must be the only import channel: no repo on PYTHONPATH,
    # neutral cwd
    env.pop("PYTHONPATH", None)
    env["SPARK_GRAFT_DRIVER_MEM"] = "4g"
    cmd = [
        _spark_submit_bin(),
        "--master", "local[4]",
        "--py-files", build_package_zip(),
        os.path.join(REPO, "scripts", "submit_extract.py"),
        "--input", pages_parquet,
        "--output", out_dir,
        "--run-id", "submit-test",
    ]
    r = subprocess.run(
        cmd, capture_output=True, text=True, cwd=str(tmp_path),
        timeout=900, env=env,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["run_id"] == "submit-test"
    assert stats["n_results"] == len(fixture_docs)
    assert stats["n_errors"] == 0

    results = spark.read.parquet(f"{out_dir}/results")
    rows = {x["url"]: x["extracted_json"] for x in results.collect()}
    assert len(rows) == len(fixture_docs)
    for d in fixture_docs:
        assert rows[d.url] == goldens[d.url][0], d.url
    # manifest lineage present (resume works across submissions)
    manifest = spark.read.parquet(f"{out_dir}/manifest_buckets")
    assert manifest.filter("run_id = 'submit-test'").count() > 0
