"""Shuffle-bytes attribution A/B for the minhash banded exchanges (VERDICT
r4 #1, the "show the wall move or not move" half): packed single-column
64-bit bucket key vs the unpacked (band_id, band_hash) pair, interleaved
fresh-JVM runs on the same corpus, each run reporting

- wall time of the edge phase (signature -> explode -> roots agg -> join ->
  distinct -> materialize), the part the key width actually touches;
- PHYSICAL shuffle bytes written, measured as the block-manager directory
  footprint under a per-run SPARK_LOCAL_DIRS (compressed bytes on disk —
  the same bytes that cross DRAM/ page cache on this single box);
- the materialized edge count (parity guard: both variants must emit the
  same candidate set).

If the wall moves ~proportionally to bytes, the banded shuffle is the
bottleneck; if bytes drop but the wall doesn't, the run is bound elsewhere
(DRAM/token-scan), which is the attribution BASELINE.md §3 argues.

Usage: python tools/bench_minhash_pack_ab.py [replicas] [cpus] [rounds]
Writes BENCH_minhash_pack_ab.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
os.environ["SPARK_GRAFT_CPUS"] = "{cpus}"
os.environ["BENCH_REPLICAS"] = "{replicas}"
import bench
from pyspark.sql import functions as F
from dataflow_spark.operators import dedup
from dataflow_spark.session import get_spark

spark = get_spark(app_name="pack_ab_{variant}", cpus={cpus})
corpus_dir = bench.ensure_corpus(spark)
corpus = spark.read.parquet(corpus_dir)
bands_expr = dedup.minhash_bands_from_tokens_udf(128, 16, 3)(F.col("tokens"))
t0 = time.time()
edges = dedup.minhash_candidate_edges(
    corpus, None, "doc_seq", 128, 16, 1,
    bands_expr=bands_expr, pack_bucket_key={packed},
)
n = edges.count()
wall = time.time() - t0
local_dirs = os.environ["SPARK_LOCAL_DIRS"].split(",")
shuffle_bytes = 0
for d in local_dirs:
    for r, _dirs, files in os.walk(d):
        shuffle_bytes += sum(os.path.getsize(os.path.join(r, f)) for f in files)
print("RESULT " + json.dumps(
    {{"variant": "{variant}", "wall_s": round(wall, 2), "edges": int(n),
      "local_dir_bytes": int(shuffle_bytes)}}
))
"""


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 3200
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    runs = []
    for i in range(rounds):
        for variant, packed in (("packed", True), ("unpacked", False)):
            with tempfile.TemporaryDirectory(prefix=f"ab_shuffle_{variant}_") as ld:
                env = dict(os.environ)
                env["SPARK_LOCAL_DIRS"] = ld
                code = CHILD.format(
                    root=ROOT, cpus=cpus, replicas=replicas,
                    variant=variant, packed=packed,
                )
                out = subprocess.run(
                    [sys.executable, "-c", code], capture_output=True,
                    text=True, env=env, cwd=ROOT, timeout=3600,
                )
                lines = [
                    l for l in out.stdout.splitlines() if l.startswith("RESULT ")
                ]
                if not lines:
                    sys.stderr.write(out.stderr[-2000:] + "\n")
                    raise RuntimeError(f"{variant} run {i} failed")
                rec = json.loads(lines[-1][len("RESULT "):])
                rec["round"] = i
                runs.append(rec)
                print(rec, flush=True)

    by = {}
    for v in ("packed", "unpacked"):
        rs = [r for r in runs if r["variant"] == v]
        by[v] = {
            "min_wall_s": min(r["wall_s"] for r in rs),
            "walls": [r["wall_s"] for r in rs],
            "min_local_dir_bytes": min(r["local_dir_bytes"] for r in rs),
            "edges": rs[0]["edges"],
        }
    assert by["packed"]["edges"] == by["unpacked"]["edges"], by
    result = {
        "replicas": replicas,
        "cpus": cpus,
        "rounds": rounds,
        "method": "interleaved fresh-JVM runs, per-run SPARK_LOCAL_DIRS, "
                  "edge-phase wall + physical block-manager bytes",
        "edge_parity": True,
        "per_variant": by,
        "bytes_reduction": round(
            1 - by["packed"]["min_local_dir_bytes"]
            / by["unpacked"]["min_local_dir_bytes"], 3
        ),
        "wall_reduction_min": round(
            1 - by["packed"]["min_wall_s"] / by["unpacked"]["min_wall_s"], 3
        ),
        "runs": runs,
    }
    path = os.path.join(ROOT, "BENCH_minhash_pack_ab.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
