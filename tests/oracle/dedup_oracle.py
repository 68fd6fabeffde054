"""Pandas/numpy oracle for the dedup operators.

Implements the SAME canonical cluster semantics the engine documents
(min-arrival-seq survivor per connected component of candidate pairs) with an
independent union-find — plus the reference's sequential first-seen exact
dedup (hash_deduplicate_filter.py:75-89), which for exact hashing coincides
with min-seq-per-hash.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)
_MAX32 = np.uint64((1 << 32) - 1)


def exact_dedup_first_seen(rows, key=lambda r: r[2]):
    """rows sorted by seq; returns surviving seqs (reference sequential set)."""
    seen = set()
    out = []
    for r in rows:
        h = hashlib.md5(str(key(r)).encode()).hexdigest()
        if h not in seen:
            seen.add(h)
            out.append(r[1])
    return out


class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min root wins so components are labeled by min seq
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def cluster_min_survivors(all_seqs, edges):
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    comp_min: dict = {}
    for s in all_seqs:
        root = uf.find(s)
        comp_min[root] = min(comp_min.get(root, s), s)
    return sorted(s for s in all_seqs if comp_min[uf.find(s)] == s)


def xxhash64_unavailable_stub():
    raise NotImplementedError


def minhash_band_hashes(shingle_hashes_per_doc, num_perm=128, bands=16, seed=1):
    """Same multiply-shift permutation scheme as the engine ((a*x + b) >> 32,
    a odd, uint64 wrap-around), independent numpy impl: takes the JVM shingle
    hashes (collected from Spark) as input so the oracle verifies
    banding+clustering logic independently."""
    r = num_perm // bands
    gen = np.random.RandomState(seed)
    a = gen.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = gen.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    out = []
    for hs in shingle_hashes_per_doc:
        if hs is None or len(hs) == 0:
            out.append(None)
            continue
        h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
        phv = (a[:, None] * h[None, :] + b[:, None]) >> np.uint64(32)
        sig = phv.min(axis=1)
        bandsig = sig.reshape(bands, r)
        bh = np.zeros(bands, dtype=np.uint64)
        for j in range(r):
            bh = bh * np.uint64(1000003) + bandsig[:, j]
        out.append(bh.astype(np.int64).tolist())
    return out


def minhash_cluster_survivors(seqs, shingle_hashes_per_doc, num_perm=128, bands=16, seed=1):
    """Full oracle: band hashes -> bucket edges to bucket-min -> union-find."""
    bhs = minhash_band_hashes(shingle_hashes_per_doc, num_perm, bands, seed)
    buckets: dict = {}
    for seq, bh in zip(seqs, bhs):
        if bh is None:
            continue
        for band_id, h in enumerate(bh):
            buckets.setdefault((band_id, h), []).append(seq)
    edges = []
    for members in buckets.values():
        root = min(members)
        edges.extend((m, root) for m in members if m != root)
    return cluster_min_survivors(seqs, edges)


def simhash_fingerprint(word_hashes):
    if word_hashes is None or len(word_hashes) == 0:
        return 0
    h = np.asarray(word_hashes, dtype=np.int64).astype(np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    fp = np.uint64(0)
    for j in np.nonzero(v > 0)[0]:
        fp |= np.uint64(1) << np.uint64(j)
    return int(fp.astype(np.int64))


def simhash_cluster_survivors(seqs, word_hashes_per_doc, threshold=0.9):
    max_dist = int(round((1 - threshold) * 64))
    fps = [simhash_fingerprint(h) for h in word_hashes_per_doc]
    edges = []
    for i in range(len(seqs)):
        for j in range(i + 1, len(seqs)):
            d = bin((fps[i] ^ fps[j]) & ((1 << 64) - 1)).count("1")
            if d <= max_dist:
                edges.append((seqs[i], seqs[j]))
    return cluster_min_survivors(seqs, edges)
