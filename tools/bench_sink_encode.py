"""Micro-bench: parquet encode cost of the token-array sink.

The shard-sweep breakdown (BENCH_shards.json flat_point_batch_breakdown)
attributes ~6 s of the 17 s micro-batch body to the exactly-once parquet sink,
dominated by encoding `tokens:array<int32>`.  This probe times a full
corpus rewrite under candidate parquet options to pick the sink default:

  codec x dictionary x writer-version

Run:  python tools/bench_sink_encode.py [replicas]
Emits one JSON line per configuration: {conf, write_s, bytes}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 400


def main():
    os.environ.setdefault("BENCH_REPLICAS", str(REPLICAS))
    import bench
    from dataflow_spark.session import get_spark

    spark = get_spark(app_name="sink_encode_probe", cpus=32)
    corpus_dir = bench.ensure_corpus(spark)
    df = spark.read.parquet(corpus_dir)
    df.persist().count()  # isolate encode+write: input comes from cache

    confs = [
        # (label, codec, dictionary, writer_version)
        ("snappy_dict_v1", "snappy", "true", "v1"),   # current default
        ("snappy_nodict_v1", "snappy", "false", "v1"),
        ("lz4_dict_v1", "lz4", "true", "v1"),
        ("zstd_dict_v1", "zstd", "true", "v1"),
        ("none_dict_v1", "uncompressed", "true", "v1"),
        ("snappy_dict_v2", "snappy", "true", "v2"),   # v2: delta-binary-packed ints
        ("snappy_nodict_v2", "snappy", "false", "v2"),
        ("lz4_nodict_v2", "lz4", "false", "v2"),
    ]
    out_base = "/tmp/sink_encode_probe"
    results = []
    for label, codec, dic, ver in confs:
        out = os.path.join(out_base, label)
        shutil.rmtree(out, ignore_errors=True)
        samples = []
        for _ in range(3):
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            (
                df.write.mode("overwrite")
                .option("compression", codec)
                .option("parquet.enable.dictionary", dic)
                .option("parquet.writer.version", ver)
                .parquet(out)
            )
            samples.append(round(time.time() - t0, 2))
        nbytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(out)
            for f in fs
        )
        rec = {"conf": label, "write_s": sorted(samples)[1], "samples": samples,
               "gib": round(nbytes / 2**30, 3)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
        shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"all": results}))
    spark.stop()


if __name__ == "__main__":
    main()
