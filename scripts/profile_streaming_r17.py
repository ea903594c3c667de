"""r17 streaming micro-batch profiling: where do the 2-6.5 s per bounded
availableNow replay actually go?

Phase-times one drain by hand (file_stream / start / awaitTermination /
localCheckpoint) and dumps the engine's own per-batch durationMs
breakdown (q.recentProgress: triggerExecution, queryPlanning, getBatch,
addBatch, walCommit, commitOffsets, stateStore metrics) for each of the
streaming registry entries, so the r17 optimization targets the measured
component instead of the guessed one.

Usage: python scripts/profile_streaming_r17.py [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from w4h_integrated_toolkit_spark.plans import QUERIES
from w4h_integrated_toolkit_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

STREAMING = [
    "stream_stream_join",
    "streaming_debounce",
    "stream_url_frontier",
    "streaming_anomaly",
    "streaming_ewma",
    "stream_heavy_hitters",
    "stream_window_dedup",
    "streaming_sessions",
    "stream_alerts",
    "stream_window_kpis",
    "stream_distinct_users",
    "streaming_neardup",
]


def _drain_progress(spark) -> list[dict]:
    """Pull recentProgress from every stream that ran on any session of
    this context (the registry drains stop their queries, so grab from
    the listener-less side via the active/last progress is not possible
    after stop; instead we patch drain_memory_sink below)."""
    return []


def main() -> None:
    names = sys.argv[1:] or STREAMING
    spark = get_spark(
        "w4h-stream-profile", cpus=CPUS, shuffle_partitions=CPUS,
        driver_memory="24g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # warm the JVM + python workers like bench.py does
    from w4h_integrated_toolkit_spark.catalog import read_parquet

    for t in ("events", "documents"):
        read_parquet(spark, f"{SF_DIR}/{t}.parquet").write.format(
            "noop"
        ).mode("overwrite").save()
    warm = spark.range(CPUS * 4).repartition(CPUS)
    warm.groupBy("id").applyInPandas(lambda p: p, "id long").count()

    # monkeypatch drain_memory_sink to capture per-batch progress and
    # phase times without changing library code
    from w4h_integrated_toolkit_spark.streaming import replay as R

    captured: list[dict] = []
    orig_drain = R.drain_memory_sink

    def instrumented_drain(out, output_mode, name_prefix="w4h_sink_",
                           stage_dir=None, state_partitions=R._PIN_DEFAULT):
        import contextlib
        import shutil
        import uuid

        spark_l = out.sparkSession
        name = name_prefix + uuid.uuid4().hex[:8]
        conf_key = "spark.sql.shuffle.partitions"
        marker = spark_l.conf.get(R._CLONE_MARKER, None)
        pin_baked = marker is not None and marker != "none"
        if pin_baked:
            state_partitions = None
        elif state_partitions is R._PIN_DEFAULT:
            state_partitions = R.BOUNDED_REPLAY_STATE_PARTITIONS
        rec: dict = {"sink": name_prefix}
        try:
            with R._PIN_LOCK if not pin_baked else contextlib.nullcontext():
                saved = (
                    spark_l.conf.get(conf_key)
                    if state_partitions is not None else None
                )
                try:
                    if state_partitions is not None:
                        spark_l.conf.set(conf_key, str(state_partitions))
                    t0 = time.time()
                    q = (
                        out.writeStream.outputMode(output_mode)
                        .format("memory")
                        .queryName(name)
                        .trigger(availableNow=True)
                        .start()
                    )
                    rec["start_sec"] = time.time() - t0
                finally:
                    if saved is not None:
                        spark_l.conf.set(conf_key, saved)
            t0 = time.time()
            q.awaitTermination()
            rec["await_sec"] = time.time() - t0
            rec["progress"] = [json.loads(p.json) for p in q.recentProgress]
            t0 = time.time()
            result = spark_l.table(name).localCheckpoint(eager=True)
            rec["localckpt_sec"] = time.time() - t0
        finally:
            captured.append(rec)
            try:
                spark_l.catalog.dropTempView(name)
            except Exception:
                pass
            if stage_dir is not None:
                shutil.rmtree(stage_dir, ignore_errors=True)
        return result

    R.drain_memory_sink = instrumented_drain
    # queries import drain via `from ..streaming.replay import ...` at call
    # time inside the builder, so the module attribute patch is enough.

    report = {}
    for nm in names:
        if nm not in QUERIES:
            print(f"# skip unknown {nm}", file=sys.stderr)
            continue
        fn, _ = QUERIES[nm]
        for attempt in range(2):  # second run = warm
            captured.clear()
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t_build = time.time() - t0
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.time() - t0
            runrec = {
                "build_sec": round(t_build, 3),
                "exec_sec": round(t_exec, 3),
                "drains": [],
            }
            for rec in captured:
                batches = []
                for p in rec.get("progress", []):
                    batches.append({
                        "batchId": p.get("batchId"),
                        "numInputRows": p.get("numInputRows"),
                        "durationMs": p.get("durationMs"),
                        "stateOperators": [
                            {
                                k: so.get(k)
                                for k in (
                                    "operatorName",
                                    "commitTimeMs",
                                    "numStateStoreInstances",
                                    "numRowsTotal",
                                )
                            }
                            for so in p.get("stateOperators", [])
                        ],
                    })
                runrec["drains"].append({
                    "sink": rec.get("sink"),
                    "start_sec": round(rec.get("start_sec", -1), 3),
                    "await_sec": round(rec.get("await_sec", -1), 3),
                    "localckpt_sec": round(rec.get("localckpt_sec", -1), 3),
                    "batches": batches,
                })
            report.setdefault(nm, []).append(runrec)
            print(f"# {nm} run{attempt}: build {t_build:.2f}s exec "
                  f"{t_exec:.2f}s drains "
                  f"{[round(r.get('start_sec',-1)+r.get('await_sec',-1),2) for r in captured]}",
                  file=sys.stderr)
    out_path = "/tmp/stream_profile_r17.json"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# wrote {out_path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
