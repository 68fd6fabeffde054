"""Streaming shard scale-out evidence at REAL executor topology (VERDICT r3
task #2): the 10^12-sequence story claims state shards place onto different
executors — this sweep MEASURES it instead of asserting it.

Legs (same shapes as tools/bench_executors.py):

    N  = local-cluster[2,4,6144]   2 executor JVMs x 4 cores
    4N = local-cluster[8,4,6144]   8 executor JVMs x 4 cores

per leg, the full custom-state streaming pipeline (file source -> watermark
-> sharded applyInPandasWithState exact dedup -> filters -> exactly-once
sink) runs with the RocksDB state-store provider and ``n_shards`` FIXED at
64, and three evidence channels are captured:

1. **Per-executor state-task placement**: the state function is wrapped to
   record ``(shard, executor_jvm_pid)`` per invocation — each Python worker
   is a child of exactly one executor JVM, so ``os.getppid()`` identifies
   the executor without any Spark-internal API.  The report counts distinct
   executors hosting state tasks and the shard->executor spread per leg.
2. **StreamingQueryProgress decomposition**: per-batch ``durationMs``
   (addBatch / getBatch / commitOffsets / triggerExecution) and the state
   operator's ``allUpdatesTimeMs`` / ``commitTimeMs`` / rows metrics — the
   state-stage-isolated numbers the single-box wall time can mask.
3. **Throughput**: tokens/sec over the processAllAvailable wall per leg,
   pooled across alternating fresh-JVM sessions (low leg pinned with
   taskset, the bench_scaling.py method).

Writes BENCH_stream_executors.json and appends/refreshes the BASELINE.md
'### 3b-streams' table.

Usage: python tools/bench_stream_executors.py [replicas] [sessions_per_leg]
       python tools/bench_stream_executors.py --leg <cores>   (internal)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEGS = {
    8: ("local-cluster[2,4,6144]", 2),
    32: ("local-cluster[8,4,6144]", 8),
}
N_SHARDS = 64


def _progress_dict(p):
    try:
        return json.loads(p.json)
    except Exception:
        return json.loads(str(p))


def run_leg():
    """Child-process entry: one Spark session, warmup + timed stream run."""
    cores = int(os.environ["LEG_CORES"])
    master, _n_exec = LEGS[cores]
    os.environ["SPARK_GRAFT_MASTER"] = master
    os.environ.setdefault("BENCH_QUERIES", "")
    sys.path.insert(0, ROOT)
    import bench  # reads SPARK_GRAFT_SF_DIR / BENCH_REPLICAS from env

    from dataflow_spark.session import get_spark
    import dataflow_spark.streaming.pipeline as P

    spark = get_spark(
        app_name=f"stream_exec_{cores}",
        cpus=cores,
        extra_conf={
            "spark.sql.streaming.stateStore.providerClass":
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
        },
    )
    corpus_dir = bench.ensure_corpus(spark)
    total_tokens = (
        spark.read.parquet(corpus_dir).agg({"n_tok": "sum"}).collect()[0][0]
    )

    placement_file = os.environ["PLACEMENT_FILE"]
    orig_fn = P._dedup_fn

    def traced_dedup_fn(key, pdf_iter, state):
        import os as _os

        with open(placement_file, "a") as fh:
            fh.write(f"{key[0]},{_os.getppid()}\n")
        yield from orig_fn(key, pdf_iter, state)

    P._dedup_fn = traced_dedup_fn

    def one_run(collect_progress: bool):
        with tempfile.TemporaryDirectory() as tmp:
            t0 = time.time()
            q = P.run_dedup_filter_stream(
                spark,
                corpus_dir,
                os.path.join(tmp, "out"),
                os.path.join(tmp, "ckpt"),
                max_files_per_trigger=64,
                n_shards=N_SHARDS,
                dedup_mode="custom",
            )
            q.processAllAvailable()
            wall = time.time() - t0
            progress = (
                [_progress_dict(p) for p in q.recentProgress]
                if collect_progress else []
            )
            q.stop()
            return wall, progress

    one_run(False)  # warmup: codegen, worker fork, RocksDB open
    wall, progress = one_run(True)

    batches = []
    for p in progress:
        d = p.get("durationMs", {})
        so = (p.get("stateOperators") or [{}])[0]
        batches.append({
            "batchId": p.get("batchId"),
            "numInputRows": p.get("numInputRows"),
            "addBatch_ms": d.get("addBatch"),
            "getBatch_ms": d.get("getBatch"),
            "commitOffsets_ms": d.get("commitOffsets"),
            "triggerExecution_ms": d.get("triggerExecution"),
            "state_allUpdatesTimeMs": so.get("allUpdatesTimeMs"),
            "state_commitTimeMs": so.get("commitTimeMs"),
            "state_numRowsTotal": so.get("numRowsTotal"),
            "state_numRowsUpdated": so.get("numRowsUpdated"),
            "state_memoryUsedBytes": so.get("memoryUsedBytes"),
        })
    print("LEGRESULT " + json.dumps({
        "cores": cores,
        "wall_s": round(wall, 3),
        "tokens": float(total_tokens),
        "tokens_per_sec": round(float(total_tokens) / wall, 1),
        "batches": batches,
    }), flush=True)
    spark.stop()


def spawn_leg(cores: int, replicas: int, placement_file: str) -> dict:
    env = dict(os.environ)
    env["LEG_CORES"] = str(cores)
    env["BENCH_REPLICAS"] = str(replicas)
    env["PLACEMENT_FILE"] = placement_file
    cmd = [sys.executable, os.path.abspath(__file__), "--leg", str(cores)]
    if cores < (os.cpu_count() or 32):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=ROOT, timeout=3600
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("LEGRESULT ")]
    if not lines:
        raise RuntimeError(
            f"leg {cores} produced no result: {out.stderr[-3000:]}"
        )
    return json.loads(lines[-1][len("LEGRESULT "):])


def placement_summary(placement_file: str) -> dict:
    shard_to_exec: dict[int, set] = {}
    exec_tasks: dict[str, int] = {}
    if os.path.exists(placement_file):
        with open(placement_file) as fh:
            for line in fh:
                try:
                    shard, pid = line.strip().split(",")
                except ValueError:
                    continue
                shard_to_exec.setdefault(int(shard), set()).add(pid)
                exec_tasks[pid] = exec_tasks.get(pid, 0) + 1
    n_exec = len(exec_tasks)
    tasks = sorted(exec_tasks.values())
    return {
        "distinct_executors_hosting_state": n_exec,
        "state_invocations_per_executor": exec_tasks,
        "shards_seen": len(shard_to_exec),
        "executor_task_balance_max_over_min":
            round(tasks[-1] / tasks[0], 2) if tasks and tasks[0] else None,
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        run_leg()
        return
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 1600
    sessions = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    pools: dict[int, list[dict]] = {8: [], 32: []}
    placements: dict[int, str] = {}
    for cores in (8, 32):
        placements[cores] = tempfile.mktemp(prefix=f"stream_place_{cores}_")
    for s in range(sessions):
        for cores in (8, 32):
            pools[cores].append(spawn_leg(cores, replicas, placements[cores]))
            print(f"session {s} cores {cores}: "
                  f"{pools[cores][-1]['tokens_per_sec']} tok/s", flush=True)

    def agg(cores):
        runs = pools[cores]
        walls = [r["wall_s"] for r in runs]
        state_update = [
            sum(b["state_allUpdatesTimeMs"] or 0 for b in r["batches"])
            for r in runs
        ]
        state_commit = [
            sum(b["state_commitTimeMs"] or 0 for b in r["batches"])
            for r in runs
        ]
        add_batch = [
            sum(b["addBatch_ms"] or 0 for b in r["batches"]) for r in runs
        ]
        return {
            "wall_s_median": round(statistics.median(walls), 3),
            "wall_s_min": round(min(walls), 3),
            "tokens_per_sec_median": round(
                statistics.median(r["tokens_per_sec"] for r in runs), 1
            ),
            "tokens_per_sec_best": round(
                max(r["tokens_per_sec"] for r in runs), 1
            ),
            # task-time sums across the state stage (NOT wall: summed over
            # parallel tasks) — the state-stage-isolated signal
            "state_allUpdates_taskms_median": statistics.median(state_update),
            "state_commit_taskms_median": statistics.median(state_commit),
            "addBatch_wallms_median": statistics.median(add_batch),
            "batches_per_run": len(runs[0]["batches"]),
            "placement": placement_summary(placements[cores]),
            "example_batches": runs[-1]["batches"][:4],
        }

    low, high = agg(8), agg(32)
    eff_min = round(
        (low["wall_s_min"] / high["wall_s_min"]) / 4, 3
    ) if high["wall_s_min"] else None
    eff_med = round(
        (low["wall_s_median"] / high["wall_s_median"]) / 4, 3
    ) if high["wall_s_median"] else None
    result = {
        "topology_low": LEGS[8][0],
        "topology_high": LEGS[32][0],
        "n_shards": N_SHARDS,
        "state_store": "RocksDB",
        "replicas": replicas,
        "sessions_per_leg": sessions,
        "input_tokens": pools[8][0]["tokens"],
        "method": (
            "separate executor JVMs, RocksDB state store, n_shards=64, "
            "pinned low leg, alternating fresh sessions; placement via "
            "executor-JVM ppid recorded inside the state function"
        ),
        "efficiency_median": eff_med,
        "efficiency_min": eff_min,
        "low": low,
        "high": high,
    }
    out_path = os.environ.get(
        "SCALE_OUT", os.path.join(ROOT, "BENCH_stream_executors.json")
    )
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("low", "high")}, indent=1))
    print("low:", json.dumps({k: v for k, v in low.items()
                              if k != "example_batches"}, indent=1))
    print("high:", json.dumps({k: v for k, v in high.items()
                               if k != "example_batches"}, indent=1))


if __name__ == "__main__":
    main()
