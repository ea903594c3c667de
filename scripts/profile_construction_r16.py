"""Per-query construction-vs-execution profile for the headline bench set.

The bench's timed region is ``fn(spark, sf_dir)`` (Python/py4j plan
construction, plus any in-builder actions like bloom's bitmap job) followed
by the noop-sink write (plan analysis + execution).  Optimization-guide §1
says measure first: this script splits the two per query so the r16
construction-cost pass targets the right builders.

Usage: python scripts/profile_construction_r16.py [n_warm] [n_runs]
Writes a TSV to stdout: name, construct_med, exec_med, total_med (seconds,
median over n_runs after n_warm warm-ups).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES
from w4h_integrated_toolkit_spark.plans import QUERIES
from w4h_integrated_toolkit_spark.session import get_spark


def main() -> None:
    n_warm = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "construction-profile",
        cpus=cpus,
        shuffle_partitions=cpus,
        driver_memory="24g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    from w4h_integrated_toolkit_spark.catalog import read_parquet

    for t in (
        "lineitem", "orders", "customer", "supplier", "nation",
        "region", "events", "documents", "embeddings",
    ):
        read_parquet(spark, f"{sf_dir}/{t}.parquet").write.format(
            "noop"
        ).mode("overwrite").save()

    print("name\tconstruct\texec\ttotal")
    for name in BENCH_QUERIES:
        fn, _ = QUERIES[name]
        for _ in range(n_warm):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cons, execs = [], []
        for _ in range(n_runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
        cm = statistics.median(cons)
        em = statistics.median(execs)
        print(f"{name}\t{cm:.3f}\t{em:.3f}\t{cm + em:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
