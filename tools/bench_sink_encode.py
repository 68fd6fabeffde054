"""Measure the exactly-once sink's parquet encode cost for the token-array
payload under different codec/encoding settings.

Motivation: the shard-sweep breakdown (BENCH_shards.json) attributes ~6 s of
a 17 s micro-batch to the sink — parquet-encoding `tokens:array<int32>`
dominates.  Two knobs plausibly matter:

* compression codec — snappy (default) vs lz4raw vs zstd vs uncompressed;
* dictionary encoding — the int32 token elements have ~50k distinct values,
  so parquet builds a dictionary page and dict-indexes EVERY token; PLAIN
  encoding is a straight copy.

Usage: python tools/bench_sink_encode.py [replicas] [repeats]
Writes one JSON line with median seconds + output bytes per config.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    # (label, codec, dictionary_enabled)
    ("snappy_dict", "snappy", True),
    ("snappy_plain", "snappy", False),
    ("lz4raw_plain", "lz4_raw", False),
    ("zstd_dict", "zstd", True),
    ("zstd_plain", "zstd", False),
    ("none_plain", "uncompressed", False),
]


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from bench import amplified_corpus
    from dataflow_spark.session import get_spark

    spark = get_spark(app_name="sink_encode_bench", cpus=32, shuffle_partitions=32)
    src = "/tmp/sink_encode_src"
    if not os.path.exists(src):
        amplified_corpus(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), replicas).write.mode(
            "overwrite"
        ).parquet(src)
    df = spark.read.parquet(src)
    n_tok = df.agg({"n_tok": "sum"}).collect()[0][0]
    df = df.persist()
    df.count()  # cache the input so every config pays encode+write only

    out = {}
    for label, codec, dict_on in CONFIGS:
        samples = []
        dest = f"/tmp/sink_encode_out_{label}"
        for _ in range(repeats):
            shutil.rmtree(dest, ignore_errors=True)
            t0 = time.monotonic()
            (
                df.write.mode("overwrite")
                .option("compression", codec)
                .option("parquet.enable.dictionary", str(dict_on).lower())
                .parquet(dest)
            )
            samples.append(time.monotonic() - t0)
        out[label] = {
            "median_s": round(statistics.median(samples), 3),
            "samples": [round(s, 3) for s in samples],
            "bytes": dir_bytes(dest),
        }
        shutil.rmtree(dest, ignore_errors=True)
    print(json.dumps({"n_tokens": int(n_tok), "configs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
