"""SURVEY §3.2 + north-star — the streaming journey, engine-side.

Four standing queries over a replayed document/event stream:

1. the reference's real-time KPI flow (windowed aggregates with a
   watermark, stream-batch unified),
2. the training-data ingest gate: streaming near-dup dedup of arriving
   docs against a stored corpus LSH index,
3. burst suppression: the stateful debounce (O(1) state per key —
   exactly the batch lag rule), and
4. live smoothing: the stateful dyadic EWMA (bit-exact with the batch
   operator).

Run: python examples/streaming_ingest.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datetime as dt
import os
import tempfile

from pyspark.sql import functions as F

from w4h_integrated_toolkit_spark.operators.dedup import (
    load_corpus_index,
    persist_corpus_index,
)
from w4h_integrated_toolkit_spark.session import get_spark
from w4h_integrated_toolkit_spark.streaming.dedup_stream import (
    streaming_neardup_matches,
)
from w4h_integrated_toolkit_spark.streaming.replay import windowed_kpis_stream


def main() -> None:
    spark = get_spark("example-stream", cpus=4, shuffle_partitions=4)
    t0 = dt.datetime(2016, 8, 1, 12, 0, 0)

    # --- 1. windowed KPIs over a replayed event stream -------------------
    events = [
        ("u1", t0 + dt.timedelta(seconds=15 * i), 70.0 + i % 9) for i in range(240)
    ]
    src = tempfile.mkdtemp(prefix="w4h_ex_events_")
    spark.createDataFrame(
        events, "user_id string, ts timestamp, value double"
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    kpis = windowed_kpis_stream(
        stream, ts="ts", value="value", window="10 minutes", watermark="30 minutes"
    )
    q = (
        kpis.writeStream.outputMode("complete").format("memory")
        .queryName("ex_kpis").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    print("windowed KPIs:")
    for r in spark.table("ex_kpis").orderBy("w").collect():
        print(" ", r.w.start.time(), f"n={r.n} avg={float(r.avg_value):.3f}")

    # --- 2. streaming ingest dedup against a stored corpus index ---------
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    corpus = spark.createDataFrame(
        [(1, base), (2, "an unrelated corpus document about spark plans")],
        "doc_id long, text string",
    )
    # What the batch layer persists once per corpus snapshot: BUCKETED
    # band/set tables ((band, key) / doc_id), so every micro-batch's
    # candidate + verification joins are exchange-free on the corpus side.
    # Refresh contract: the index is FROZEN at build time — docs appended
    # to the corpus later are invisible to the gate until the snapshot is
    # rebuilt (re-run persist_corpus_index, e.g. nightly); load_corpus_index
    # validates the (n, num_perm, bands) hash-family params so a stale or
    # mismatched index fails loudly instead of silently matching nothing.
    # idempotent re-run: drop any previous snapshot's tables AND their
    # warehouse locations (an in-memory catalog forgets the tables between
    # runs, but the managed locations persist and collide)
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in ("ex_corpus_idx_bands", "ex_corpus_idx_sets",
              "ex_corpus_idx_params"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    persist_corpus_index(corpus, "ex_corpus_idx", n=3, num_perm=8, bands=4)
    stored_bands, sets = load_corpus_index(
        spark, "ex_corpus_idx", n=3, num_perm=8, bands=4
    )

    doc_src = tempfile.mkdtemp(prefix="w4h_ex_docs_")
    spark.createDataFrame(
        [
            (10, base, t0),                                   # near-dup -> flag
            (11, "fresh novel words entirely its own", t0),   # keeper
        ],
        "doc_id long, text string, ingest_ts timestamp",
    ).write.mode("overwrite").parquet(doc_src)
    doc_stream = spark.readStream.schema(
        spark.read.parquet(doc_src).schema
    ).parquet(doc_src)
    matches = streaming_neardup_matches(
        doc_stream, stored_bands, sets, n=3, num_perm=8, bands=4, threshold=0.5,
        ts="ingest_ts", watermark="1 hour",
    )
    q2 = (
        matches.writeStream.outputMode("append").format("memory")
        .queryName("ex_dedup").trigger(availableNow=True).start()
    )
    q2.awaitTermination()
    flagged = spark.table("ex_dedup").collect()
    print("near-dup matches (drop these from the ingest):")
    for r in flagged:
        print(f"  new doc {r.new_id} ~ corpus doc {r.corpus_id} (jaccard {r.jaccard:.2f})")

    # 3 + 4: stateful debounce and EWMA over the replayed event table —
    # both emit exactly what their batch twins would (equality laws are
    # test-pinned), so the dashboards they feed agree with any backfill
    from w4h_integrated_toolkit_spark.streaming.replay import (
        run_debounce_batchmode,
        run_streaming_ewma_batchmode,
    )

    events_path = os.path.join(
        os.environ.get("W4H_EXAMPLE_SF_DIR", "/root/testdata/sf0.001"),
        "events.parquet",
    )
    kept = run_debounce_batchmode(spark, events_path, cooldown_seconds=300)
    total = spark.read.parquet(events_path).count()
    n_kept = kept.count()
    print(f"debounce: {total} events -> {n_kept} kept "
          f"({total - n_kept} suppressed within 300s bursts)")
    sm = run_streaming_ewma_batchmode(spark, events_path)
    r = sm.orderBy("user_id", "ts_us").limit(3).collect()
    print("streaming EWMA (first rows):")
    for x in r:
        print(f"  user {x.user_id} t={x.ts_us} value={x.value:.3f} "
              f"ewma={x.ewma:.3f}")

    # 5: streaming URL-frontier dedup — the standing query a crawl puts
    # in front of its fetch queue: canonicalize each arriving URL (pure
    # JVM Columns) and suppress re-fetches of a page already admitted
    # within the watermark horizon (state bounded at rate x horizon).
    # The key set equals the batch url_dedup_groups rollup's (law is
    # test-pinned); the corpus_curation example runs the batch twin.
    from w4h_integrated_toolkit_spark.streaming.dedup_stream import (
        run_streaming_url_frontier_batchmode,
    )

    docs_path = os.path.join(
        os.environ.get("W4H_EXAMPLE_SF_DIR", "/root/testdata/sf0.001"),
        "documents.parquet",
    )
    noisy_url = F.concat(
        F.lit("http://www."),
        F.col("source"),
        F.lit(".com/doc/"),
        (F.col("doc_id") % 200).cast("string"),
        # half the fetches arrive under a tracking-param variant
        F.when(F.col("doc_id") % 2 == 0, F.lit("?utm_source=feed#top"))
        .otherwise(F.lit("")),
    )
    frontier = run_streaming_url_frontier_batchmode(
        spark, docs_path, noisy_url
    )
    n_docs = spark.read.parquet(docs_path).count()
    print(f"URL frontier: {n_docs} streamed fetches -> "
          f"{frontier.count()} canonical pages admitted")
    spark.stop()


if __name__ == "__main__":
    main()
