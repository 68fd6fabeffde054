"""Streaming near-dedup (banded MinHash state) + source routing tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataflow_spark.streaming.pipeline import (
    file_stream_source,
    route_by_source,
    run_near_dedup_stream,
)
from tests.test_streaming import make_rows, toks, write_file


def test_near_dedup_stream_drops_cross_batch_near_dups(spark, tmp_path):
    corpus_dir = str(tmp_path / "c")
    out_dir = str(tmp_path / "o")
    ckpt = str(tmp_path / "k")
    shared = list(range(100, 140))
    f1 = make_rows(
        [
            (1, shared, "cc", 0),
            (2, list(range(500, 530)), "web", 1),
        ]
    )
    # d11: identical token stream to d1 (all bands match) -> dup, dropped.
    # d12: fresh -> kept.
    f2 = make_rows(
        [
            (11, shared, "cc", 30),
            (12, list(range(900, 940)), "book", 31),
        ]
    )
    write_file(spark, f1, corpus_dir)
    write_file(spark, f2, corpus_dir)

    q = run_near_dedup_stream(
        spark, corpus_dir, out_dir, ckpt, bands=8, n_shards=4
    )
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()}
    assert got == {"d000001", "d000002", "d000012"}


def test_near_dedup_stream_resumes_band_state(spark, tmp_path):
    corpus_dir = str(tmp_path / "c")
    out_dir = str(tmp_path / "o")
    ckpt = str(tmp_path / "k")
    shared = list(range(200, 240))
    write_file(spark, make_rows([(1, shared, "cc", 0)]), corpus_dir)
    q = run_near_dedup_stream(spark, corpus_dir, out_dir, ckpt, bands=8, n_shards=4)
    q.processAllAvailable()
    q.stop()
    # after restart the band state must remember d1's bands
    write_file(spark, make_rows([(21, shared, "cc", 40)]), corpus_dir)
    q2 = run_near_dedup_stream(spark, corpus_dir, out_dir, ckpt, bands=8, n_shards=4)
    q2.processAllAvailable()
    q2.stop()
    got = {r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()}
    assert got == {"d000001"}


def test_route_by_source(spark, tmp_path):
    corpus_dir = str(tmp_path / "c")
    out_dir = str(tmp_path / "o")
    ckpt = str(tmp_path / "k")
    rows = make_rows(
        [
            (1, toks(1, 2, 3, 4, 5), "cc", 0),
            (2, toks(1), "cc", 1),  # fails cc's n_tok >= 3 predicate
            (3, toks(7, 8), "web", 2),
            (4, toks(9), "book", 3),  # unrouted -> _default
        ]
    )
    write_file(spark, rows, corpus_dir)
    stream = file_stream_source(spark, corpus_dir, max_files_per_trigger=10)
    q = route_by_source(
        spark,
        stream,
        routes={
            "cc": [F.col("n_tok") >= 3],
            "web": [],
        },
        out_dir=out_dir,
        checkpoint_dir=ckpt,
    )
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(out_dir)  # source=... dirs are Hive partitions
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src == {"cc": 1, "web": 1, "_default": 1}
    got_cc = out.where(F.col("source") == "cc").select("doc_id").first().doc_id
    assert got_cc == "d000001"
