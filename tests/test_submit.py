"""spark-submit --py-files launchability (north rule's launch path).

Builds dist/dataflow_spark.zip, then runs jobs/stream_job.py under a real
``spark-submit --master local[4]`` subprocess against a 2-file corpus and
checks the exactly-once sink output.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

from tests.test_streaming import make_rows, toks, write_file

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_stream_job(spark, tmp_path):
    corpus_dir = str(tmp_path / "c")
    out_dir = str(tmp_path / "o")
    ckpt = str(tmp_path / "k")
    write_file(
        spark,
        make_rows(
            [
                (1, toks(1, 2, 3, 4, 5, 6, 7, 8), "cc", 0),
                (2, toks(1, 2, 3, 4, 5, 6, 7, 8), "cc", 1),  # exact dup
                (3, toks(9, 10, 11, 12, 13, 14, 15, 16), "web", 2),
            ]
        ),
        corpus_dir,
    )
    zip_path = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "build_pyfiles.py")],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    assert os.path.exists(zip_path)

    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            os.path.join(ROOT, "jobs", "stream_job.py"),
            "--corpus",
            corpus_dir,
            "--out",
            out_dir,
            "--checkpoint",
            ckpt,
            "--shards",
            "4",
            "--min-tok",
            "1",
            "--once",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    got = {r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()}
    assert got == {"d000001", "d000003"}


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_multi_executor(spark, tmp_path):
    """The north rule's literal launch path: spark-submit --py-files on a
    MULTI-EXECUTOR cluster — local-cluster[2,2,2048] spawns two separate
    executor JVMs (own heap/shuffle/Python workers); the zip ships the
    engine to them, exactly like --py-files on a real cluster."""
    corpus_dir = str(tmp_path / "c")
    out_dir = str(tmp_path / "o")
    ckpt = str(tmp_path / "k")
    write_file(
        spark,
        make_rows(
            [
                (1, toks(1, 2, 3, 4, 5, 6, 7, 8), "cc", 0),
                (2, toks(1, 2, 3, 4, 5, 6, 7, 8), "cc", 1),  # exact dup
                (3, toks(9, 10, 11, 12, 13, 14, 15, 16), "web", 2),
            ]
        ),
        corpus_dir,
    )
    zip_path = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "build_pyfiles.py")],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()

    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local-cluster[2,2,2048]",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.executor.memory=1g",
            "--py-files",
            zip_path,
            os.path.join(ROOT, "jobs", "stream_job.py"),
            "--corpus",
            corpus_dir,
            "--out",
            out_dir,
            "--checkpoint",
            ckpt,
            "--shards",
            "4",
            "--min-tok",
            "1",
            "--once",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    got = {r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()}
    assert got == {"d000001", "d000003"}
