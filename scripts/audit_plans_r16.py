#!/usr/bin/env python
"""r16 optimization-round plan audit: capture .explain("formatted") for
every registry query and summarize plan shape (Exchange count, join
strategies, Python-eval nodes, scans without pushed filters).

Writes plans/r16/<name>_before.txt (or _after.txt with --after) for the
queries named on the command line (default: the bench headline set +
median-tier extras), and a one-line-per-query TSV summary to stdout for
the whole registry.

Usage:
    python scripts/audit_plans_r16.py [--after] [--all-files] [name ...]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from w4h_integrated_toolkit_spark.plans import QUERIES
from w4h_integrated_toolkit_spark.session import get_spark

import bench

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
)


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange\b", plan)),
        "bcast_exchanges": len(re.findall(r"\(\d+\) BroadcastExchange\b", plan)),
        "smj": plan.count("SortMergeJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "batch_eval_py": plan.count("BatchEvalPython"),
        "arrow_eval_py": plan.count("ArrowEvalPython"),
        "map_in_py": plan.count("MapInPandas") + plan.count("PythonMapInArrow")
        + plan.count("MapInArrow"),
        "flatmap_groups": plan.count("FlatMapGroupsInPandas")
        + plan.count("FlatMapGroupsInArrow"),
        "window": len(re.findall(r"\(\d+\) Window\b", plan)),
        "sorts": len(re.findall(r"\(\d+\) Sort\b", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "rowtocol": plan.count("RowToColumnar") + plan.count("ColumnarToRow"),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    suffix = "_after" if "--after" in sys.argv else "_before"
    all_files = "--all-files" in sys.argv
    file_set = set(args) if args else set(
        bench.BENCH_QUERIES + sorted(bench.MEDIAN_EXTRA_QUERIES)
    )
    os.makedirs(OUT_DIR, exist_ok=True)

    spark = get_spark(
        "r16-plan-audit", driver_memory="24g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    names = args if (args and not all_files) else list(QUERIES)
    print("name\tbuild_s\texch\tbcast\tsmj\tbhj\tshj\tbnlj\tcart\tbatchpy"
          "\tarrowpy\tmapin\tfmgroups\twin\tsort\tscans")
    for name in names:
        fn, _ = QUERIES[name]
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}\tERROR\t{type(e).__name__}: {e}", flush=True)
            continue
        build_s = time.time() - t0
        s = plan_stats(plan)
        print(
            f"{name}\t{build_s:.2f}\t{s['exchanges']}\t{s['bcast_exchanges']}"
            f"\t{s['smj']}\t{s['bhj']}\t{s['shj']}\t{s['bnlj']}\t{s['cartesian']}"
            f"\t{s['batch_eval_py']}\t{s['arrow_eval_py']}\t{s['map_in_py']}"
            f"\t{s['flatmap_groups']}\t{s['window']}\t{s['sorts']}\t{s['scans']}",
            flush=True,
        )
        if name in file_set or all_files:
            with open(os.path.join(OUT_DIR, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)
    spark.stop()


if __name__ == "__main__":
    main()
