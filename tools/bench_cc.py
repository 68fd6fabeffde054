"""Connected-components strategy A/B on the real r{N} minhash edge set
(VERDICT r3 task #1 evidence): contraction vs the legacy iterative
propagation loop, same materialized edges, measuring wall time, Spark JOB
COUNT (the round barrier made the legacy loop O(rounds) jobs whose
checkpoint+convergence-count fixed cost was serial), and label parity via
an order-independent checksum.

Usage:  [taskset -c 0-7] python tools/bench_cc.py [replicas] [cpus]
Env:    SCALE_OUT=path.json  (default BENCH_cc_r{replicas}.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 1600
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    os.environ["BENCH_REPLICAS"] = str(replicas)
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

    import bench
    from pyspark.sql import functions as F

    from dataflow_spark.operators import dedup
    from dataflow_spark.session import get_spark

    spark = get_spark(app_name=f"cc_ab_r{replicas}", cpus=cpus)
    sc = spark.sparkContext
    corpus_dir = bench.ensure_corpus(spark)
    corpus = spark.read.parquet(corpus_dir)

    bands_expr = dedup.minhash_bands_from_tokens_udf(128, 16, 3)(F.col("tokens"))
    t0 = time.time()
    edges = dedup.minhash_candidate_edges(
        corpus, None, "doc_seq", 128, 16, 1, bands_expr=bands_expr
    )  # materialized (eager localCheckpoint)
    n_edges = edges.count()
    edge_build_s = round(time.time() - t0, 2)
    print(f"edges: {n_edges} ({edge_build_s}s to build+materialize)", flush=True)

    def run(strategy: str) -> dict:
        jobs0 = len(sc.statusTracker().getJobIdsForGroup())
        t = time.time()
        labels = dedup.connected_components_min(
            edges, strategy=strategy, _materialized=True
        )
        chk = labels.agg(
            F.count("*").alias("n"),
            # order-independent, overflow-free label checksum (node,component
            # pairs are unique, so xor never self-cancels a duplicate)
            F.expr("bit_xor(xxhash64(node, component))").alias("h"),
            F.sum((F.col("node") != F.col("component")).cast("long")).alias(
                "losers"
            ),
        ).collect()[0]
        wall = round(time.time() - t, 2)
        jobs = len(sc.statusTracker().getJobIdsForGroup()) - jobs0
        out = {
            "strategy": strategy,
            "wall_s": wall,
            "spark_jobs": jobs,
            "nodes": chk["n"],
            "losers": chk["losers"],
            "label_checksum": int(chk["h"]),
        }
        print(json.dumps(out), flush=True)
        return out

    results = [run("contract"), run("iterative"), run("contract")]
    parity = len({r["label_checksum"] for r in results}) == 1 and len(
        {r["losers"] for r in results}
    ) == 1
    by = {}
    for r in results:
        by.setdefault(r["strategy"], []).append(r)
    summary = {
        "replicas": replicas,
        "cpus": cpus,
        "n_edges": n_edges,
        "edge_build_s": edge_build_s,
        "parity_identical_labels": parity,
        "contract": {
            "wall_s": [r["wall_s"] for r in by["contract"]],
            "spark_jobs": by["contract"][0]["spark_jobs"],
        },
        "iterative": {
            "wall_s": [r["wall_s"] for r in by["iterative"]],
            "spark_jobs": by["iterative"][0]["spark_jobs"],
        },
        "jobs_reduction": round(
            by["iterative"][0]["spark_jobs"]
            / max(1, by["contract"][0]["spark_jobs"]), 2
        ),
        "wall_reduction_best": round(
            min(r["wall_s"] for r in by["iterative"])
            / max(0.01, min(r["wall_s"] for r in by["contract"])), 2
        ),
    }
    out_path = os.environ.get(
        "SCALE_OUT", os.path.join(ROOT, f"BENCH_cc_r{replicas}.json")
    )
    with open(out_path, "w") as fh:
        json.dump({"summary": summary, "runs": results}, fh, indent=1)
    print(json.dumps(summary, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
