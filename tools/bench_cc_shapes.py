"""Adversarial-shape evidence for the contraction CC ladder (VERDICT r4
task #5): the design claim is "the residual collapses under the local
threshold in one contraction" — true for LSH star graphs (a star's edges
share `a`, so hash-partitioning on `a` colocates whole stars), but a long
CHAIN spanning partitions is the worst case: partition-local solves merge
only the runs that land together, so the residual shrinks by roughly the
inverse of the partition count per level, not by orders of magnitude.

This tool generates graph families at a configurable edge count, runs the
auto ladder with the round-5 `stats` hook, and records per-depth residual
sizes + wall + an order-independent label checksum verified against the
driver-local numpy solve of the same edges.

Families:
  star     — disjoint LSH-style stars (the shape minhash actually emits)
  chain    — one path 0-1-2-...-n (maximum diameter, worst contraction)
  expander — ~4-regular random graph (low diameter, high conductance:
             one giant component, residual stress on collect_set)
  cliquechain — 64-cliques bridged in a chain (clique-local collapse,
             chain-global diameter)

Usage:  python tools/bench_cc_shapes.py [edges] [cpus]
Env:    SCALE_OUT=path.json (default BENCH_cc_shapes.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def gen_edges(spark, family: str, n_edges: int):
    from pyspark.sql import functions as F

    r = spark.range(n_edges).select(F.col("id"))
    if family == "star":
        k = 16  # star size: one root per k edges, the LSH bucket shape
        return r.select(
            ((F.col("id") / k).cast("long") * (k + 1)).alias("a"),
            ((F.col("id") / k).cast("long") * (k + 1)
             + F.pmod(F.col("id"), F.lit(k)) + 1).alias("b"),
        )
    if family == "chain":
        return r.select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
    if family == "expander":
        n = n_edges // 2  # ~4-regular: 2 random out-edges per node
        return r.select(
            F.pmod(F.col("id"), F.lit(n)).alias("a"),
            F.pmod(F.xxhash64("id"), F.lit(n)).alias("b"),
        ).where(F.col("a") != F.col("b"))
    if family == "cliquechain":
        k = 64  # clique id c spans nodes [c*k, (c+1)*k); star within the
        # clique plus a bridge edge from each clique's max node to the next
        # clique's root — clique-local collapse, chain-global diameter
        c = (F.col("id") / k).cast("long")
        j = F.pmod(F.col("id"), F.lit(k))
        return r.select(
            F.when(j == k - 1, c * k + k - 1).otherwise(c * k).alias("a"),
            F.when(j == k - 1, (c + 1) * k).otherwise(c * k + j + 1).alias("b"),
        )
    raise ValueError(family)


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

    import numpy as np
    from pyspark.sql import functions as F

    from dataflow_spark.operators import dedup
    from dataflow_spark.session import get_spark

    spark = get_spark(app_name=f"cc_shapes_{n_edges}", cpus=cpus)
    # force the distributed ladder: the local threshold would otherwise
    # swallow every family in one driver solve and measure nothing
    threshold = max(1000, n_edges // 100)
    out = {
        "n_edges_requested": n_edges,
        "cpus": cpus,
        "local_threshold": threshold,
        "families": {},
    }
    for family in ("star", "chain", "expander", "cliquechain"):
        edges = gen_edges(spark, family, n_edges).localCheckpoint(eager=True)
        n = edges.count()
        stats: dict = {}
        t0 = time.time()
        labels = dedup.connected_components_min(
            edges, local_threshold=threshold, _materialized=True, stats=stats
        )
        row = labels.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(node, component))").alias("h"),
        ).collect()[0]
        wall = round(time.time() - t0, 2)

        # independent driver-local numpy oracle on the same edges
        pdf = edges.toPandas()
        nodes, lbl = dedup._cc_min_numpy(
            pdf["a"].to_numpy(np.int64), pdf["b"].to_numpy(np.int64)
        )
        oracle = spark.createDataFrame(
            spark.sparkContext.parallelize(
                list(zip(nodes.tolist(), lbl.tolist())), 32
            ),
            "node long, component long",
        ).agg(F.expr("bit_xor(xxhash64(node, component))")).collect()[0][0]
        rec = {
            "edges": int(n),
            "wall_s": wall,
            "label_rows": int(row["n"]),
            "checksum_match": bool(row["h"] == oracle),
            "ladder": stats.get("depths", []),
        }
        out["families"][family] = rec
        print(family, json.dumps(rec), flush=True)
        edges.unpersist()

    path = os.environ.get("SCALE_OUT", os.path.join(ROOT, "BENCH_cc_shapes.json"))
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
