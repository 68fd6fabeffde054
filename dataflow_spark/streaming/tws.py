"""transformWithState streaming dedup: generation-tagged delta-log state.

Why this exists next to ``streaming_exact_dedup`` (streaming/pipeline.py):
``applyInPandasWithState`` exposes ONE value per group key, so every
micro-batch must read the whole accumulated seen-set and write the whole
seen-set back — per-batch state IO is O(history) per shard.  At the
10^12-sequence design point the watermark horizon holds billions of hashes
and that O(history) rewrite per micro-batch is the term that caps sustained
throughput.  This operator keeps per-batch state IO at O(batch) using the
Spark 4 ``transformWithStateInPandas`` API (SPARK-49564):

- **State layout**: a ``MapState`` delta log — segment ``g`` holds the sorted
  int64 hash buffer first seen at generation ``g`` — plus a ``ValueState``
  header ``(gen, max_ev_ms, timer_ms)``.  A batch that finds new hashes
  appends ONE segment and bumps the header; nothing is rewritten.
- **Worker-local cache** (module-level, keyed by per-query namespace +
  shard): membership tests run against a cached sorted numpy array.  The
  1-RPC header read validates the cache; if the shard last ran on a
  different worker the cache is behind by ``gen - cached_gen`` segments and
  exactly those deltas are fetched — O(new since last visit).  A cold worker
  does one full map scan.  Correctness never rests on the cache: group-by
  guarantees one task per shard per batch, the header is read and bumped
  inside that task, and any mismatch falls back to the authoritative store.
  A cache AHEAD of the store (failed task attempt whose state write rolled
  back) is discarded and reloaded.
- **Compaction**: every ``compact_every`` generations the log is rewritten
  as one merged segment (amortized O(state)/compact_every per batch), so a
  cold reload is one segment + a short tail, not ten thousand RPCs.
- **TTL**: an event-time timer 1 h past the newest row the shard has seen
  (same horizon contract as ``streaming_exact_dedup`` and
  ``dropDuplicatesWithinWatermark``); expiry clears both states and cache.

Reference semantics mirrored: first-seen exact dedup by token-array hash —
identical survivors to the batch ``dedup.exact_dedup`` and the
``applyInPandasWithState`` operator (reference analogue
``dataflow/operators/filter/GeneralText/hash_deduplicate_filter.py``).

Requires the RocksDB state-store provider (a hard transformWithState
requirement); ``streaming_exact_dedup_tws`` checks the session conf and
raises actionable guidance instead of Spark's planner error.

Round 4: the protobuf runtime gate was re-verified (no runtime, wheel or
conda package anywhere on the image; pip index unreachable), so the SAME
delta-log/generation design now also ships on an API that runs today —
``streaming/indexed.py`` manages the segments as batch-versioned parquet
in foreachBatch (O(new) writes, pruned bounded reads, offline compaction
+ expiry), with stream==batch parity and kill/resume pytest-driven.  This
module remains the in-engine ideal once protobuf is available: state
lives in the checkpoint-consistent store, not an app-managed table.
"""

from __future__ import annotations

import uuid
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from dataflow_spark.streaming.pipeline import (
    N_SHARDS_DEFAULT,
    _DEDUP_OUT_SCHEMA,
    _sorted_member,
)

_EMPTY = np.empty(0, np.int64)

# (namespace, shard) -> (generation, sorted int64 seen-hash array).  Lives in
# the Python worker process across micro-batches (spark.python.worker.reuse);
# purely a performance memo — every entry is validated against the
# authoritative header before use and rebuilt from MapState on any mismatch.
_SEEN_CACHE: dict[tuple[str, int], tuple[int, np.ndarray]] = {}

_HDR_SCHEMA = "gen BIGINT, max_ev_ms BIGINT, timer_ms BIGINT"
_DELTA_KEY_SCHEMA = "gen BIGINT"
_DELTA_VAL_SCHEMA = "buf BINARY"


class DedupDeltaLogProcessor(StatefulProcessor):
    """First-seen exact dedup with O(batch) per-micro-batch state IO."""

    def __init__(
        self,
        namespace: str,
        ttl_ms: int = 3600 * 1000,
        compact_every: int = 64,
    ):
        self._ns = namespace
        self._ttl_ms = ttl_ms
        self._compact_every = compact_every

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._hdr = handle.getValueState("hdr", _HDR_SCHEMA)
        self._deltas = handle.getMapState(
            "deltas", _DELTA_KEY_SCHEMA, _DELTA_VAL_SCHEMA
        )

    # -- cache/state reconciliation ------------------------------------
    def _load_seen(self, shard: int, gen: int) -> np.ndarray:
        """Return the seen-set at generation ``gen``, fetching only the
        segments the worker-local cache is missing."""
        ck = (self._ns, shard)
        cgen, seen = _SEEN_CACHE.get(ck, (0, _EMPTY))
        if cgen > gen:
            # cache from a rolled-back task attempt (or a prior query in a
            # recycled worker) — the store is authoritative, start over
            cgen, seen = 0, _EMPTY
        if cgen == gen:
            return seen
        parts: list[np.ndarray] = []
        for g in range(cgen + 1, gen + 1):
            v = self._deltas.getValue((g,))
            if v is None:
                # segment compacted away since this worker last looked —
                # rescan the (post-compaction, short) log
                parts = [
                    np.frombuffer(val[0], np.int64)
                    for _k, val in self._deltas.iterator()
                ]
                seen = _EMPTY
                break
            parts.append(np.frombuffer(v[0], np.int64))
        if parts:
            seen = np.unique(np.concatenate([seen, *parts]))
        return seen

    # -- per-batch hook -------------------------------------------------
    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        shard = int(key[0])
        hdr = self._hdr.get()
        gen, max_ev, timer_ms = (int(hdr[0]), int(hdr[1]), int(hdr[2])) if hdr else (0, 0, 0)
        seen = self._load_seen(shard, gen)
        pending = _EMPTY
        for pdf in rows:
            pdf = pdf.sort_values("doc_seq")
            if len(pdf):
                max_ev = max(max_ev, int(pdf["_ev_ms"].max()))
            th = pdf["_th"].to_numpy(dtype=np.int64)
            keep = (
                ~_sorted_member(seen, th)
                & ~_sorted_member(pending, th)
                & ~pd.Series(th).duplicated(keep="first").to_numpy()
            )
            pending = np.union1d(pending, th[keep])
            out = pdf[keep].drop(columns=["_th", "_ev_ms"])
            if len(out):
                yield out.assign(_seen_total=len(seen) + len(pending))
        if len(pending):
            gen += 1
            seen = np.union1d(seen, pending)
            if gen % self._compact_every == 0:
                # rewrite the log as one merged segment at the current gen;
                # readers holding an older cgen hit getValue -> None and
                # rescan the now-single-segment log
                self._deltas.clear()
                self._deltas.updateValue((gen,), (seen.tobytes(),))
            else:
                self._deltas.updateValue((gen,), (pending.tobytes(),))
        _SEEN_CACHE[(self._ns, shard)] = (gen, seen)
        # TTL: event time, 1 h past the newest row this shard has seen (not
        # the watermark — on the first batch the watermark is still epoch-0)
        new_timer = max(timerValues.getCurrentWatermarkInMs(), max_ev) + self._ttl_ms
        if new_timer != timer_ms:
            if timer_ms:
                self._handle.deleteTimer(timer_ms)
            self._handle.registerTimer(new_timer)
            timer_ms = new_timer
        self._hdr.update((gen, max_ev, timer_ms))

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        hdr = self._hdr.get()
        # only the live timer clears state (deleteTimer makes stale firings
        # rare; this check makes them harmless)
        if hdr and int(hdr[2]) == expiredTimerInfo.getExpiryTimeInMs():
            self._hdr.clear()
            self._deltas.clear()
            _SEEN_CACHE.pop((self._ns, int(key[0])), None)
        return iter([])

    def close(self) -> None:
        pass


def streaming_exact_dedup_tws(
    stream: DataFrame,
    watermark_delay: str = "10 minutes",
    n_shards: int = N_SHARDS_DEFAULT,
    ttl_ms: int = 3600 * 1000,
    compact_every: int = 64,
) -> DataFrame:
    """Exact first-seen dedup with delta-log state (see module docstring).

    Same contract and output schema as ``streaming_exact_dedup``; swap-in
    replacement wherever per-shard seen-sets are large relative to a
    micro-batch.  Raise ``n_shards`` until a shard's horizon seen-set fits
    executor memory (8 bytes/hash): per-batch state IO stays O(batch)
    regardless of history size."""
    try:
        # the TWS Python state protocol is protobuf-framed; without the
        # runtime the JVM-side "driver worker" crashes opaquely at plan time
        import google.protobuf  # noqa: F401
    except ImportError as e:  # pragma: no cover - protobuf absent in sandbox
        raise NotImplementedError(
            "transformWithStateInPandas needs the google.protobuf runtime "
            "(pip install protobuf), absent from this environment. The "
            "delta-log processor itself is pure pandas/numpy and unit-tested "
            "without Spark (tests/test_streaming_tws.py); use "
            "dedup_mode='custom' (applyInPandasWithState) meanwhile."
        ) from e
    conf = stream.sparkSession.conf
    provider = conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    if "RocksDB" not in provider:
        raise ValueError(
            "transformWithState requires the RocksDB state store: set "
            "spark.sql.streaming.stateStore.providerClass="
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider (session conf, before the query starts)"
        )
    tagged = (
        stream.withColumn("_th", F.xxhash64(F.col("tokens")))
        .withColumn("shard", F.pmod(F.col("_th"), F.lit(n_shards)).cast("int"))
        .withColumn("_ev_ms", F.unix_millis(F.col("event_time")))
    )
    return (
        tagged.withWatermark("event_time", watermark_delay)
        .groupBy("shard")
        .transformWithStateInPandas(
            statefulProcessor=DedupDeltaLogProcessor(
                namespace=uuid.uuid4().hex,
                ttl_ms=ttl_ms,
                compact_every=compact_every,
            ),
            outputStructType=_DEDUP_OUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
