"""Delta-log TWS dedup processor (streaming/tws.py) — kernel tests.

The transformWithStateInPandas RUNTIME is environment-blocked here (the
Python state protocol needs google.protobuf, absent from the sandbox; the
wiring raises actionable guidance — tested below).  The processor itself is
pure pandas/numpy over the StatefulProcessor contract, so its load-bearing
logic — first-seen semantics, delta-log layout, worker-cache reconciliation
(cold / behind / rolled-back-ahead), compaction, timer bookkeeping — is
driven directly through fake ValueState/MapState/handle objects that honor
the pyspark 4.1 API shapes (tuple-keyed MapState, tuple-valued ValueState,
register/deleteTimer on the handle).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from dataflow_spark.streaming import tws
from dataflow_spark.streaming.tws import DedupDeltaLogProcessor, _SEEN_CACHE


class FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, new):
        self.v = tuple(new)

    def clear(self):
        self.v = None


class FakeMapState:
    def __init__(self):
        self.m = {}

    def exists(self):
        return bool(self.m)

    def getValue(self, key):
        return self.m.get(tuple(key))

    def updateValue(self, key, value):
        self.m[tuple(key)] = tuple(value)

    def iterator(self):
        return iter(sorted(self.m.items()))

    def clear(self):
        self.m.clear()


class FakeHandle:
    def __init__(self):
        self.value_states = {}
        self.map_states = {}
        self.timers = set()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.value_states.setdefault(name, FakeValueState())

    def getMapState(self, name, key_schema, value_schema, ttlDurationMs=None):
        return self.map_states.setdefault(name, FakeMapState())

    def registerTimer(self, ts):
        self.timers.add(ts)

    def deleteTimer(self, ts):
        self.timers.discard(ts)


class FakeTimerValues:
    def __init__(self, wm_ms=0):
        self.wm_ms = wm_ms

    def getCurrentWatermarkInMs(self):
        return self.wm_ms

    def getCurrentProcessingTimeInMs(self):
        return 0


class FakeExpiredTimerInfo:
    def __init__(self, ts):
        self.ts = ts

    def getExpiryTimeInMs(self):
        return self.ts


BASE = dt.datetime(2026, 1, 1)


def make_pdf(specs):
    """specs: list of (doc_seq, token_hash, offset_s)."""
    return pd.DataFrame(
        {
            "doc_id": [f"d{s:06d}" for s, _, _ in specs],
            "doc_seq": [s for s, _, _ in specs],
            "text": ["t"] * len(specs),
            "tokens": [[1, 2]] * len(specs),
            "n_tok": [2] * len(specs),
            "source": ["cc"] * len(specs),
            "event_time": [BASE + dt.timedelta(seconds=o) for _, _, o in specs],
            "_th": np.array([h for _, h, _ in specs], dtype=np.int64),
            "shard": np.zeros(len(specs), dtype=np.int32),
            "_ev_ms": np.array(
                [
                    int((BASE + dt.timedelta(seconds=o)).timestamp() * 1000)
                    for _, _, o in specs
                ],
                dtype=np.int64,
            ),
        }
    )


def run_batch(proc, handle, batches, wm_ms=0, key=(0,)):
    """Feed one micro-batch (list of chunk pdfs) through handleInputRows."""
    outs = list(proc.handleInputRows(key, iter(batches), FakeTimerValues(wm_ms)))
    return pd.concat(outs) if outs else pd.DataFrame(columns=["doc_id"])


def fresh(ns="t", **kw):
    proc = DedupDeltaLogProcessor(namespace=ns, **kw)
    handle = FakeHandle()
    proc.init(handle)
    _SEEN_CACHE.clear()
    return proc, handle


def first_seen_oracle(all_specs):
    seen, keep = set(), []
    for s, h, _ in sorted(all_specs):
        if h not in seen:
            seen.add(h)
            keep.append(f"d{s:06d}")
    return keep


def test_first_seen_across_batches_and_chunks():
    proc, handle = fresh()
    b1 = [(1, 10, 0), (2, 10, 1), (3, 20, 2)]
    b2a = [(11, 10, 10), (12, 30, 11)]  # two arrow chunks in one batch:
    b2b = [(13, 30, 12), (14, 40, 13)]  # dup across chunk boundary
    out1 = run_batch(proc, handle, [make_pdf(b1)])
    out2 = run_batch(proc, handle, [make_pdf(b2a), make_pdf(b2b)])
    got = list(out1["doc_id"]) + list(out2["doc_id"])
    assert got == first_seen_oracle(b1 + b2a + b2b)
    assert got == ["d000001", "d000003", "d000012", "d000014"]
    # output schema contract: decision columns dropped, _seen_total appended
    assert "_th" not in out1.columns and "_seen_total" in out1.columns
    # delta log holds one segment per survivor-bearing batch
    assert sorted(handle.map_states["deltas"].m) == [(1,), (2,)]


def test_cold_worker_full_reload():
    proc, handle = fresh()
    run_batch(proc, handle, [make_pdf([(1, 10, 0), (2, 20, 1)])])
    run_batch(proc, handle, [make_pdf([(3, 30, 2)])])
    _SEEN_CACHE.clear()  # simulate the shard landing on a brand-new worker
    out = run_batch(proc, handle, [make_pdf([(11, 10, 10), (12, 30, 11), (13, 40, 12)])])
    assert list(out["doc_id"]) == ["d000013"]


def test_behind_cache_fetches_only_missing_deltas():
    proc, handle = fresh()
    run_batch(proc, handle, [make_pdf([(1, 10, 0)])])
    snapshot = dict(_SEEN_CACHE)  # worker A's view after gen 1
    run_batch(proc, handle, [make_pdf([(2, 20, 1)])])  # gen 2 (worker B)
    _SEEN_CACHE.clear()
    _SEEN_CACHE.update(snapshot)  # shard returns to worker A: behind by 1
    fetched = []
    orig = handle.map_states["deltas"].getValue
    handle.map_states["deltas"].getValue = lambda k: (fetched.append(tuple(k)), orig(k))[1]
    out = run_batch(proc, handle, [make_pdf([(3, 20, 2), (4, 30, 3)])])
    assert list(out["doc_id"]) == ["d000004"]  # 20 known only via the fetched delta
    assert fetched == [(2,)]  # exactly the missing segment, not the history


def test_rolled_back_attempt_cache_discarded():
    proc, handle = fresh()
    run_batch(proc, handle, [make_pdf([(1, 10, 0)])])
    # simulate a failed task attempt: cache claims gen 5 and "knows" hash 99,
    # but the store rolled back to gen 1
    _SEEN_CACHE[("t", 0)] = (5, np.array([10, 99], dtype=np.int64))
    out = run_batch(proc, handle, [make_pdf([(2, 99, 1), (3, 10, 2)])])
    # 99 was never committed -> must survive; 10 is committed -> dropped
    assert list(out["doc_id"]) == ["d000002"]


def test_compaction_merges_log_and_stale_reader_rescans():
    proc, handle = fresh(compact_every=2)
    run_batch(proc, handle, [make_pdf([(1, 10, 0)])])  # gen 1
    snapshot = dict(_SEEN_CACHE)
    run_batch(proc, handle, [make_pdf([(2, 20, 1)])])  # gen 2 -> compacts
    assert sorted(handle.map_states["deltas"].m) == [(2,)]  # single segment
    merged = np.frombuffer(handle.map_states["deltas"].m[(2,)][0], np.int64)
    assert sorted(merged) == [10, 20]
    # a reader whose cached gen predates compaction must rescan correctly
    _SEEN_CACHE.clear()
    _SEEN_CACHE.update(snapshot)
    out = run_batch(proc, handle, [make_pdf([(3, 20, 2), (4, 30, 3)])])
    assert list(out["doc_id"]) == ["d000004"]


def test_timer_bookkeeping_and_expiry():
    proc, handle = fresh(ttl_ms=3600_000)
    run_batch(proc, handle, [make_pdf([(1, 10, 0)])], wm_ms=0)
    ev1 = int(BASE.timestamp() * 1000)
    assert handle.timers == {ev1 + 3600_000}
    run_batch(proc, handle, [make_pdf([(2, 20, 50)])], wm_ms=0)
    ev2 = ev1 + 50_000
    assert handle.timers == {ev2 + 3600_000}  # old deleted, new registered
    # stale firing (not the live timer) is a no-op
    list(proc.handleExpiredTimer((0,), FakeTimerValues(), FakeExpiredTimerInfo(ev1 + 3600_000)))
    assert handle.value_states["hdr"].v is not None
    # live firing clears state + cache
    list(proc.handleExpiredTimer((0,), FakeTimerValues(), FakeExpiredTimerInfo(ev2 + 3600_000)))
    assert handle.value_states["hdr"].v is None
    assert handle.map_states["deltas"].m == {}
    assert ("t", 0) not in _SEEN_CACHE


def test_randomized_parity_with_batch_oracle():
    rng = np.random.RandomState(7)
    proc, handle = fresh()
    all_specs, seq = [], 0
    for b in range(12):
        specs = []
        for _ in range(rng.randint(1, 40)):
            seq += 1
            specs.append((seq, int(rng.randint(0, 60)), seq))
        all_specs += specs
        if rng.rand() < 0.3:
            _SEEN_CACHE.clear()  # random worker migration
        out = run_batch(proc, handle, [make_pdf(specs)])
        # per-batch incremental check keeps failures localized
        assert list(out["doc_id"]) == [
            d for d in first_seen_oracle(all_specs) if d in set(out["doc_id"])
        ]
    final = first_seen_oracle(all_specs)
    # state holds exactly the distinct hashes
    total = sum(
        len(np.frombuffer(v[0], np.int64))
        for v in handle.map_states["deltas"].m.values()
    )
    assert total == len({h for _, h, _ in all_specs})
    assert len(final) == total


def test_runtime_gate_raises_actionable_guidance(spark, tmp_path):
    try:
        import google.protobuf  # noqa: F401

        pytest.skip("protobuf present; runtime path available")
    except ImportError:
        pass
    from dataflow_spark.corpus import synthetic_corpus
    from dataflow_spark.streaming.pipeline import file_stream_source
    from dataflow_spark.streaming.tws import streaming_exact_dedup_tws

    corpus_dir = str(tmp_path / "corpus")
    synthetic_corpus(spark, 8).write.parquet(corpus_dir)
    stream = file_stream_source(spark, corpus_dir)
    with pytest.raises(NotImplementedError, match="protobuf"):
        streaming_exact_dedup_tws(stream)
