"""Independent numpy all-pairs oracle for embedding_near_dup (SemDeduplicateFilter).

The oracle recomputes the reference semantics from scratch — full cosine
matrix (sem_deduplicate_filter.py:47-59), union-find over pairs with
cosine >= 1-eps, min-id survivor per component — with no Spark code shared.
The engine's LSH-bucketed path (similarity.py:embedding_near_dup) must
reproduce the survivor set exactly on a corpus whose duplicate pairs are
bucket-guaranteed (scaled copies preserve every hyperplane sign; perturbed
copies stay inside the orthant at the chosen magnitudes — deterministic for
the fixed seed, asserted rather than assumed).
"""

from __future__ import annotations

import numpy as np
import pytest

EPS = 0.05
DIM = 64
N_BASE = 400
SEED = 1234


def _corpus() -> tuple[list[int], np.ndarray]:
    """Base gaussians (pairwise cosine far below 0.95 at dim=64) + planted
    scaled copies, perturbed copies, and a perturbation CHAIN a~b~c where
    a-c alone may fall below threshold (transitivity must come from CC)."""
    gen = np.random.RandomState(SEED)
    X = gen.normal(size=(N_BASE, DIM))
    ids = list(range(N_BASE))
    rows = [X[i] for i in range(N_BASE)]

    # scaled copies of ids 0..39 (cosine exactly 1)
    for i in range(40):
        ids.append(10_000 + i)
        rows.append(X[i] * 1.7)
    # perturbed copies of ids 100..139 (cosine ~0.999)
    for i in range(40):
        ids.append(20_000 + i)
        rows.append(X[100 + i] + 0.03 * gen.normal(size=DIM))
    # chain: b = a + d, c = b + d (a~b, b~c dup; a~c weaker)
    a = X[200]
    d = 0.18 * gen.normal(size=DIM)
    ids += [30_000, 30_001]
    rows += [a + d, a + 2 * d]
    return ids, np.stack(rows)


def _oracle_survivors(ids: list[int], M: np.ndarray) -> set[int]:
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    C = Mn @ Mn.T
    n = len(ids)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if C[i, j] >= 1.0 - EPS:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[rj] = ri
    comp: dict[int, int] = {}
    for i in range(n):
        r = find(i)
        comp[r] = min(comp.get(r, ids[i]), ids[i])
    return {comp[find(i)] for i in range(n)}


def test_embedding_near_dup_matches_numpy_all_pairs(spark):
    from dataflow_spark.operators.similarity import embedding_near_dup

    ids, M = _corpus()
    expected = _oracle_survivors(ids, M)

    # sanity on the planted structure itself: dups detected, chain clustered
    assert all(10_000 + i not in expected for i in range(40))
    assert 30_000 not in expected and 30_001 not in expected and 200 in expected

    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(ids, M)],
        ["vec_id", "embedding"],
    )
    got = {r.vec_id for r in embedding_near_dup(df, eps=EPS).select("vec_id").collect()}
    assert got == expected


def test_embedding_near_dup_no_false_merges(spark):
    """A corpus with NO pairs above threshold must pass through unchanged."""
    from dataflow_spark.operators.similarity import embedding_near_dup

    gen = np.random.RandomState(77)
    X = gen.normal(size=(200, DIM))
    Mn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = Mn @ Mn.T
    np.fill_diagonal(C, 0.0)
    assert C.max() < 1.0 - EPS  # corpus really is clean
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(200)], ["vec_id", "embedding"]
    )
    assert embedding_near_dup(df, eps=EPS).count() == 200
