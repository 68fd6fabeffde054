"""Dump physical plans of the headline operators to PLANS.md — the plan-audit
artifact: shows filter pushdown, column pruning (ReadSchema), single-shuffle
dedup, broadcast joins, and whole-stage codegen spans."""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def cap(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    from pyspark.sql import functions as F

    from dataflow_spark.corpus import tokenized_corpus
    from dataflow_spark.operators import dedup
    from dataflow_spark.operators.filters import keep_n_tok_range, keep_unique_tokens
    from dataflow_spark.session import get_spark

    spark = get_spark(app_name="explain", cpus=4, shuffle_partitions=8)
    sections = []

    corpus = tokenized_corpus(spark, SF)

    filtered = corpus.where(keep_n_tok_range(5, 100000)).where(
        keep_unique_tokens(0.1)
    ).select("doc_id", "n_tok")
    sections.append(
        (
            "Filter chain + projection over the tokenized corpus",
            "Expected: predicates and pruned ReadSchema at the parquet scan; "
            "one WholeStageCodegen span, zero shuffles.",
            cap(filtered),
        )
    )

    deduped = dedup.exact_dedup(
        corpus.withColumn("_th", dedup.token_hash()), hash_col="_th"
    )
    sections.append(
        (
            "Exact dedup (min_by strategy)",
            "Expected: ONE Exchange (hash on content hash) with partial "
            "aggregation before it (map-side combine collapses duplicates "
            "pre-shuffle).",
            cap(deduped),
        )
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    from dataflow_spark.operators.similarity import brute_force_topk

    sections.append(
        (
            "Brute-force cosine top-k",
            "Expected: BroadcastNestedLoopJoin (small query side broadcast), "
            "corpus scanned once; window only over the tiny scored set.",
            cap(brute_force_topk(emb, qs, k=5)),
        )
    )

    # minhash candidate-edge pipeline: everything up to (and including) the
    # bucket shuffles.  CC runs on the driver below the 4M-edge threshold,
    # so at bench scale THIS is the whole distributed plan.  Explained over a
    # MATERIALIZED parquet corpus: production inputs are tables, and the lazy
    # synthetic-corpus expression would smear generator CASE/transform
    # expressions (and a spurious re-evaluation) all over the audit.
    import tempfile

    mat_dir = os.path.join(tempfile.gettempdir(), "explain_corpus")
    corpus.write.mode("overwrite").parquet(mat_dir)
    mat = spark.read.parquet(mat_dir)

    edges = dedup.minhash_candidate_edges(
        mat, None, "doc_seq", 128, 16, 1,
        bands_expr=dedup.minhash_bands_from_tokens_udf(128, 16, 3, 1)(
            F.col("tokens")
        ),
        materialize=False,
    )
    sections.append(
        (
            "MinHash-LSH candidate edges (signature -> (min,count) roots agg "
            "-> join -> star edges), tokens fast path",
            "Expected: EXACTLY ONE ArrowEvalPython reading only (doc_seq, "
            "tokens) — the token n-gram hashing AND the numpy signature both "
            "run inside the Arrow batch, so 4 bytes/token cross the "
            "JVM-Python boundary and no JVM HOF materializes per-gram "
            "arrays (posexplode_outer keeps InferFiltersFromGenerate from "
            "planning the UDF a second time).  Then: one Exchange into the "
            "(min, count) per-bucket aggregation — FIXED 16-byte agg "
            "buffers, partial agg map-side, no collect_list anywhere — a "
            "join of the banded rows back against the kept roots (AQE "
            "broadcasts the root table when small; in production the "
            "signature is persisted so the UDF runs once for both "
            "consumers), and the final edge distinct.  Never B^2 pairs.  "
            "Audited with materialize=False: the production path persists "
            "the signature and eagerly checkpoints the edges, which would "
            "hide this plan behind a Scan ExistingRDD.",
            cap(edges),
        )
    )

    from dataflow_spark.operators.chunking import chunk_tokens

    chunked = chunk_tokens(mat, chunk_size=64, chunk_overlap=8)
    sections.append(
        (
            "Token-window chunking (KBCChunkGenerator shape)",
            "Expected: a single narrow stage — scan -> Project building the "
            "window slices -> Generate (posexplode) -> Project. ZERO "
            "Exchanges and zero Python: chunk rows multiply in place and "
            "flow into downstream dedup/filters without a shuffle.",
            cap(chunked),
        )
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    sections.append(
        (
            "Join + agg (TPC-H Q3 shape)",
            "Expected: BroadcastHashJoin for the customer dim (filter pushed "
            "to its scan), shuffle join for lineitem-orders, partial agg "
            "before the final exchange.",
            cap(j),
        )
    )

    out = ["# PLANS — physical-plan audit (generated by tools/explain_plans.py)", ""]
    for title, expect, plan in sections:
        out += [f"## {title}", "", expect, "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
