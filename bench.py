#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {headline name: sec, ...}, "sf": ..., "loaded_box": ...}.
"value" totals only the headline set. The FULL per-query detail —
extra_queries, calibration probes, loadavg — is written to
BENCH_DETAIL.json in the repo root instead of the stdout line: round 6's
line grew past 4 KB (74 queries) and overflowed the driver's output
capture, so BENCH_r06.json recorded "parsed": null — a compact line the
driver can always parse beats a complete one it can't.

ROUND-7 BASELINE RESET (see BASELINE.md): the headline set is the frozen
round-5 thirty PLUS the five heaviest wave-2/3 graduates (bm25_topk,
semantic_dedup, streaming_sessions, bloom_decontaminate,
quantized_knn_recall) = 35 queries. Round-over-round totals compare
against the r7 baseline row in BASELINE.md from this round forward;
r5/r6 totals (30-query basis) are NOT comparable to r7+ totals.

Each query runs THREE times after a shared session warm-up and reports
the MEDIAN ("runs": 3, "stat": "median" in the JSON). Round 3 reported a
2.3x dedup_clusters "regression" that an A/B at sf0.1 showed to be pure
first-run noise (cold run 4.7s, warm runs 2.4s, identical code) — median
of 3 makes round-over-round comparison a property of the engine, not of
which run a cold-codegen or hypervisor CPU-steal window landed in. When
the three runs disagree sharply (spread > 2x — the steal signature;
engine noise between warm runs is far smaller), the query is re-run up
to 2 more times and the 3 fastest are kept, so a steal window can't
misreport a 3s plan as 30s (observed in round 2).

Round-5 adjudication for the record: a bench run started right after the
pytest suite showed minhash_lsh_pairs at 3.09s vs 2.25s prior (+38%,
unchanged code); a solo 6x re-measure gave warm ~2.2s, and a bench on the
fully idle box gave 1.82s (total 22.0s — the best same-stat total yet).
Lesson: even *recently finished* heavy processes inflate timings here —
bench only on an idle box, and re-measure before chasing any single-bench
delta.

Round-6 load guards (so the above adjudication never has to be repeated
by hand): (1) pre-flight — if 1-min loadavg says the box is busy, wait up
to PREFLIGHT_MAX_WAIT for it to drain before starting, and stamp the JSON
with the loadavg actually seen; (2) fixed-work CALIBRATION probes (each
min-of-3) INTERLEAVED through the timed loop — if ANY probe runs slow
against the deep-warm idle floor (max-of-probes > 1.35x, tightened at
r15 after the r14 contaminated capture slipped the old median-vs-1.6x
rule), some external process shared the cores during the measurement
window and the JSON says so ("loaded_box": true). Readers should trust
per-query deltas only when loaded_box is false and the calibration_sec
probes sit near the clean floor.

Round-6 adjudication for the record: user_similarity_topk measured 5.4s
in-suite on an IDLE box (loadavg 1.48, calibration probes at the warm
floor) vs 2.3-2.6s in r4/r5, with `git diff` showing zero changes on its
path since r4. Repeated solo warm re-measures put the true distribution
at 1.9-4.9s for the identical plan — the widest variance band in the
registry, driven by Python-worker scheduling jitter across the 36
applyInPandas Gram blocks (tiny per-block matrices at sf0.1 → fixed
Arrow/worker overhead dominates; at real scale the BLAS work amortizes
it). The warm FLOOR (1.9s, n_chunks=8) is below both prior rounds, so a
4-5s median here is a sampling artifact of that band, not a regression;
adjudicate this query by its floor across several runs, never one median.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from w4h_integrated_toolkit_spark.plans import QUERIES
from w4h_integrated_toolkit_spark.session import get_spark

# Headline set: the relational spine + the heavy training-data ops.
# r7 reset: the last five entries graduated from extras (the heaviest
# wave-2/3 operators — ranked retrieval, semantic dedup, native
# streaming sessionization, Bloom decontamination, int8 ANN); the first
# thirty are the frozen r5 set, unchanged.
BENCH_QUERIES = [
    "pricing_summary",
    "range_scan",
    "cohort_kpi",
    "shipping_priority",
    "local_supplier_volume",
    "mets_broadcast_lookup",
    "calibration",
    "breach_histogram",
    "stream_alerts",
    "resample_1min",
    "sliding_window",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "simhash",
    "knn_cosine_topk",
    "embedding_neardup_pairs",
    "byte_histogram",
    "text_stats",
    "language_id",
    "asof_latest_purchase",
    "incident_interval_join",
    "knn_ivf_topk",
    "rollup_cascade",
    "user_similarity_topk",
    "dedup_clusters",
    "session_windows",
    "retention_matrix",
    "big_orders",
    # --- r7 graduates (documented baseline reset, BASELINE.md) ---
    "bm25_topk",
    "semantic_dedup",
    "streaming_sessions",
    "bloom_decontaminate",
    "quantized_knn_recall",
]

# Measured and written to BENCH_DETAIL.json under "extra_queries" but
# EXCLUDED from the headline total so round-over-round totals stay
# comparable (headline frozen as of the r7 reset). New heavy operators
# land here first and graduate into BENCH_QUERIES only at a documented
# reset of the baseline in BASELINE.md.
EXTRA_BENCH_QUERIES = [
    "tfidf_top_terms",
    "dedup_keep_best",
    "embedding_centroids",
    "quality_filter_per_lang",
    "corpus_drift",
    "gap_fill",
    "forecast_revenue",
    "funnel_conversion",
    "event_transitions",
    "rfm_segments",
    "time_weighted_avg",
    "rolling_zscore",
    "unigram_nll",
    "source_overlap",
    "shipping_latency",
    "daily_value_bands",
    "streaming_anomaly",
    "knn_lsh_topk",
    "fk_integrity",
    "table_profile",
    "cube_totals",
    "heavy_hitters_sketch",
    "interval_coverage",
    "cusum_changepoint",
    "doc_chunks",
    "spearman_trend",
    "dow_hour_heatmap",
    "stream_stream_join",
    "containment_pairs",
    "zorder_layout",
    "max_concurrency",
    "mad_outliers",
    "stream_heavy_hitters",
    "ratio_to_report",
    "benford_audit",
    "key_skew_report",
    "seasonal_anomalies",
    "chi2_independence",
    # --- r7 wave 4 ---
    "token_entropy",
    "weighted_sample",
    "debounce_events",
    "streaming_debounce",
    "name_match_pairs",
    "ewma_smooth",
    "event_type_pagerank",
    "grid_density",
    "conversion_lag_daily",
    # --- r7 wave 5 ---
    "table_diff",
    "scd2_intervals",
    "golden_record",
    "value_percentile_rank",
    "pmi_pairs",
    "kmeans_iteration",
    # --- r7 wave 6 ---
    "salted_hot_key_agg",
    "event_paths",
    "windowed_funnel",
    "brand_top_parts",
    "streaming_ewma",
    # --- r8 wave 7 ---
    "salted_join_equiv",
    "embedding_gram",
    "embedding_dim_stats",
    "feature_hash_histogram",
    "bigram_nll",
    "vocab_oov_rate",
    "rolling_median",
    "equi_depth_bins",
    "class_balance",
    "stream_window_dedup",
    # --- r8 wave 8 ---
    "acf_lags",
    "kfold_report",
    "quality_top_p",
    "dataset_card",
    # --- r8 wave 9 ---
    "basket_affinity",
    "shrunk_group_means",
    "incremental_agg",
    # --- r8 wave 10 ---
    "langid_confusion",
    "classification_metrics",
    "ewma_backtest",
    "k_anonymity_audit",
    # --- r8 wave 11 ---
    "scd2_lookup",
    "ols_trend_slope",
    # --- r9 wave 12/13 ---
    "scd2_apply",
    "kmeans_fit",
    "domain_extract",
    "domain_cap_sample",
    "bpe_merges",
    "bpe_encode",
    # --- r10 wave 14 ---
    "bpe_segment",
    "knn_ivf_fitted",
    "registrable_domain_psl",
    "wav_decode_stats",
    "audio_frame_energy",
    "video_frame_stats",
    "html_extract",
    # r11 additions
    "knn_ivf_persisted",
    "replay_wraparound",
    "url_canonicalize",
    "idna_hosts",
    # r12 additions
    "ranking_model_scores",
    "stream_url_frontier",
    "warc_extract",
    # r13 addition
    "robots_filter",
    # r15 registrations (promoted from the candidates file; every
    # registered entry gets a bench row so driver deltas have a local
    # reference level)
    "duplicated_spans",
    "gopher_flags",
    # r16 registrations (same rule)
    "dsir_resample",
    "audio_fingerprint_pairs",
]

# The heaviest extras get MEDIAN-OF-3 like the headline (r8 verdict
# order #3): single-run numbers on multi-second streaming jobs read
# cold-JIT noise as regressions. Membership = the top extras by
# BENCH_DETAIL cost; revisit when the cost ranking shifts. Re-ranked
# late r9 after the bounded-replay optimization reshuffled the order
# (stream_heavy_hitters 1.46 s and stream_window_dedup 0.97 s dropped
# out of the top tier but KEEP median-of-3 — they are streaming jobs
# whose single-run numbers carry the most cold-JIT spread; kmeans_fit,
# classification_metrics, salted_join_equiv, bpe_merges promoted in).
MEDIAN_EXTRA_QUERIES = {
    "streaming_debounce",        # 3.50 s late-r9
    "stream_stream_join",        # 2.38
    "pmi_pairs",                 # 2.30
    "dedup_keep_best",           # 2.10
    "bpe_merges",                # 1.90
    "classification_metrics",    # 1.85
    "streaming_anomaly",         # 1.84
    "kmeans_fit",                # 1.75
    "streaming_ewma",            # 1.69
    "bigram_nll",                # 1.66
    "salted_join_equiv",         # 1.62
    "event_type_pagerank",       # 1.49
    "stream_heavy_hitters",      # 1.46 (streaming: keep)
    "stream_window_dedup",       # 0.97 (streaming: keep)
    # r9 verdict order #7: the r9 additions' FIRST round-over-round
    # comparison lands at r10 — median-of-3 both so that comparison
    # isn't single-run noise (kmeans_fit / bpe_merges already above).
    "scd2_apply",                # 1.61 late-r9
    "bpe_encode",                # 1.31 late-r9
    # r10 verdict order #2: same pattern for the heavy r10 additions —
    # their first round-over-round comparison lands at r11; bpe_segment
    # in particular showed a reproducible 3.3 s cold-first-run vs
    # 1.1-1.5 s warm, exactly the artifact median-of-3 absorbs.
    "bpe_segment",               # warm 1.1-1.5 s (3.33 cold, r10 driver)
    "knn_ivf_fitted",            # 2.6-3.0 s (two Lloyd iterations by design)
    "registrable_domain_psl",    # 1.3-1.6 s
    # r11 verdict order #3: the heaviest 1-run extra; its first
    # round-over-round comparison lands at r12 — median-of-3 so the
    # 3.0-3.6 s band is confirmed (or adjudicated) on medians.
    "knn_ivf_persisted",         # 3.0-3.6 s (fit + O(k·d) store hop)
    # r12 verdict watch item: the two heaviest 1-run r12 extras; their
    # first round-over-round comparison lands at r13 — median-of-3 so
    # the first bands (~2.4-3.4 s and ~1.8-2.9 s) are confirmed on
    # medians, the same pattern as the r9-r12 promotions.
    "stream_url_frontier",       # 2.4-3.4 s (real availableNow stream job)
    "ranking_model_scores",      # 1.1-1.6 s median (1-run levels were cold-plan)
    # r13 verdict order #3: robots_filter's r13 1-run levels spanned
    # 1.3-2.3 s warm with a 13 s fresh-session cold tier — exactly the
    # profile median-of-3 absorbs; its first round-over-round
    # comparison lands at r15 on medians.
    "robots_filter",             # 1.3-2.3 s warm (13 s fresh-session cold)
    # r14 verdict order #5, executed with a correction: the order named
    # tfidf_top_terms (2.48, genuinely 1-run) and dedup_keep_best (2.33)
    # — but dedup_keep_best has been median-of-3 since late-r9 (line
    # above), so its 2.33 WAS already a median and that half of the
    # order was a no-op (review r15 pass 3). The actual heaviest
    # remaining 1-run extra on the clean r15 capture is basket_affinity
    # (2.05 s) — promoted in its place; first clean median landed the
    # same round: 1.254 s (band 1.1-1.6, BASELINE.md).
    "tfidf_top_terms",           # 1.2-1.8 s median (1-run 2.5 was cold-plan)
    "basket_affinity",           # 1.1-1.6 s median (1-run ~2.0 was cold-plan)
    # r15 verdict order #5: the r15 registrations' first round-over-round
    # comparison lands at r16 — median-of-3 so their first bands are set
    # on medians, the same pattern as every registration since r9
    # (duplicated_spans 1.682 and gopher_flags 0.859 were 1-run levels
    # on the clean r15 capture).
    "duplicated_spans",          # 1.68 s 1-run r15 (heavier extras tier)
    "gopher_flags",              # 0.86 s 1-run r15
    # r16 registrations: first bench rows this round — median-of-3 from
    # the start so the r17 comparison never reads cold-plan noise
    # (dsir_resample runs a full fit + Gumbel-top-k chain; the audio
    # gate synthesizes WAV tracks through the FFT kernel).
    "dsir_resample",
    "audio_fingerprint_pairs",
}


# 1-min loadavg above this → somebody else is using the 32-core box; the
# idle floor observed across rounds is 0.0-1.5 (pytest drives it to 10-30).
# r14 POST-MORTEM: the official r14 capture started at loadavg 2.99 —
# under the old 4.0 gate — and ended at 14.17 with every query inflated
# a median 1.67x (pure scans included); the artifact of record read
# 2.05x baseline for code independently re-measured at 0.95x. 1.5 sits
# above the true idle floor but below any real co-tenant.
PREFLIGHT_LOAD_MAX = 1.5
PREFLIGHT_MAX_WAIT = 300.0  # sec; bounded so the driver's timeout is safe
# fixed-work calibration: JVM-side sum over a 2^29 range, 32 threads.
# Probes INTERLEAVE with the timed loop (one per quarter of the query
# list) so they sample contention during the actual measurement window —
# a start/end-only pair misses load that arrives mid-run and reads JVM
# warm-up drift as load. Every probe runs min-of-3 (persistent contention
# slows all three attempts; a one-off GC/steal transient only one), and
# all probes sit in the deep-warm JVM regime whose idle floor is stable:
# 0.095-0.118 s observed across the r7-r14 clean captures (a FRESH JVM
# reads 0.25-0.40 for the same work — that drift is why the old
# before/after absolute threshold false-positived on clean runs).
# Threshold: ANY probe (max-of-probes) > 1.35x the clean floor → some
# external process shared the cores somewhere in the timed window. The
# r14 contaminated run's probes read 0.115/0.167/0.219/0.229 — the old
# median-vs-1.6x-of-0.16 rule (flag at 0.256) passed it; this rule
# (flag at 0.159) trips on three of the four while a clean run's
# 0.095-0.13 band clears it with margin.
CALIBRATION_CLEAN_FLOOR_SEC = 0.118
CALIBRATION_LOADED_FACTOR = 1.35
# Clean-retry wall budget: a flagged first pass that took longer than
# this forfeits the headline retry rather than risking the driver's
# timeout (a flagged capture beats a lost one); clean passes finish in
# ~8-10 min, the r14 contaminated official run (~1.67x inflation)
# still returned rc=0, so 720 s start + settle + retry stays inside
# what the driver demonstrably tolerates.
RETRY_MAX_START_SEC = 720.0
# r15 POST-MORTEM: the single 90 s settle was not enough — ambient
# steal bursts on this box run minutes long (the r15 retry's own window
# was still contended and adopted nothing, so the contaminated first
# pass stood as the artifact of record for the second round running).
# r16 policy: up to RETRY_MAX_ATTEMPTS retries, each after a >=300 s
# settle (longer than any steal burst observed in the r14/r15
# captures), first clean-qualifying retry adopted; a further attempt is
# only started while total elapsed stays under RETRY_WALL_BUDGET_SEC
# (settle time is cheap for the driver — it is idle sleep, not load).
RETRY_SETTLE_SEC = 300.0
RETRY_MAX_ATTEMPTS = 2
RETRY_WALL_BUDGET_SEC = 2400.0


def _loadavg() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError):
        return -1.0


# Hypervisor CPU steal is the contention mode the r14 post-mortem
# actually found (10% steal measured live on this box while a "solo"
# bench ran 1.5-2x slow): another TENANT ON THE HOST eats cycles the
# guest never schedules, loadavg can't see it directly (it only shows
# the runnable-queue backup it causes), and the calibration probes are
# its only in-band witness. /proc/stat's steal counter measures it
# exactly — sample at start/end and flag when the stolen share of the
# measurement window exceeds STEAL_PCT_MAX (clean windows on this box
# read < 1%).
STEAL_PCT_MAX = 3.0


def _cpu_stat() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat, (-1, -1) if
    unreadable (non-Linux); fields per proc(5): user nice system idle
    iowait irq softirq steal guest guest_nice."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        return vals[7] if len(vals) > 7 else 0, sum(vals[:8])
    except (OSError, ValueError, IndexError):
        return -1, -1


def _steal_pct(
    before: tuple[int, int], after: tuple[int, int]
) -> float | None:
    """Stolen share of the window, or None when it could not be measured
    (unreadable /proc/stat or a degenerate window). r15 ADVICE: the old
    -1.0 sentinel compared as CLEAN everywhere (-1.0 > STEAL_PCT_MAX is
    False), silently disabling the detector the r14 post-mortem
    motivated — unknown must stay unknown, not clean."""
    if before[0] < 0 or after[0] < 0 or after[1] <= before[1]:
        return None
    return 100.0 * (after[0] - before[0]) / (after[1] - before[1])


def _steal_exceeds(steal: float | None) -> bool:
    return steal is not None and steal > STEAL_PCT_MAX


def _round_or_none(x: float | None, nd: int = 2) -> float | None:
    return None if x is None else round(x, nd)


def _calibration_sec(spark, runs: int = 3) -> float:
    """Fixed-work reference time, MIN of ``runs`` back-to-back attempts.

    The min isolates what calibration is for — persistent box contention
    (another process slows every attempt) — from one-off JVM transients:
    the after-the-bench reading follows 40+ queries whose GC/codegen
    residue inflates a single attempt ~1.3-1.8x for a second or two
    (observed 0.44 s single-shot vs 0.26 s min-of-3 on an idle box),
    which tripped the 1.4x loaded-box flag on clean runs."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        spark.range(1 << 29).selectExpr("sum(id * 2 + 1) AS s").collect()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # pre-flight: don't start timing on a box that is visibly mid-load
    # (round-5 lost its regression signal to a bench started right after
    # pytest) or mid-steal (a host co-tenant can eat 10%+ of the guest's
    # cycles with loadavg still under 2 — the r14 contamination mode);
    # loadavg decays slowly and steal arrives in bursts, so cap the wait
    # and record reality
    def _steal_now(window: float = 5.0) -> float | None:
        a = _cpu_stat()
        time.sleep(window)
        return _steal_pct(a, _cpu_stat())

    load = _loadavg()
    steal = _steal_now()
    if steal is None:
        print(
            "# WARNING: steal could not be measured (/proc/stat "
            "unreadable) — contention flagging falls back to the "
            "calibration probes only",
            file=sys.stderr,
        )
    waited = 5.0
    while (
        load > PREFLIGHT_LOAD_MAX or _steal_exceeds(steal)
    ) and waited < PREFLIGHT_MAX_WAIT:
        print(
            f"# pre-flight: loadavg {load:.2f} (max {PREFLIGHT_LOAD_MAX}) "
            f"steal {-1.0 if steal is None else steal:.1f}% "
            f"(max {STEAL_PCT_MAX}) — waiting for the "
            f"box to drain ({waited:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(15.0)
        waited += 20.0
        load = _loadavg()
        steal = _steal_now()
    loadavg_start = load
    cpu_start = _cpu_stat()
    bench_t0 = time.time()

    # no console progress bars: the driver parses the tail of combined
    # output, and \r-progress spam is what squeezed the r6 JSON line out
    # of its capture window
    spark = get_spark("w4h-bench", cpus=cpus, shuffle_partitions=cpus,
                      driver_memory="24g",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})

    # warm-up: JVM/codegen, parquet data + footer page cache for every bench
    # table, and the Python/Arrow worker pool (we measure the engine, not
    # JVM startup or cold storage — count() alone reads only footers)
    from w4h_integrated_toolkit_spark.catalog import read_parquet

    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region", "events", "documents", "embeddings"):
        read_parquet(spark, f"{sf_dir}/{t}.parquet").write.format(
            "noop"
        ).mode("overwrite").save()
    warm = spark.range(cpus * 4).repartition(cpus)
    warm.groupBy("id").applyInPandas(lambda p: p, "id long").count()

    # calibration before the timed loop (first run doubles as its warm-up;
    # recorded for context only — the fresh-JVM floor is too drifty for a
    # threshold, the interleaved warm probes below carry the flag)
    _calibration_sec(spark, runs=1)
    cal_before = _calibration_sec(spark)
    print(f"# calibration (before): {cal_before:.3f}s", file=sys.stderr)

    # per-query contention evidence (r16 verdict order #2): the ROUND
    # flag says "somewhere in this capture a burst happened", which
    # forfeits every per-query delta; a per-query steal window lets a
    # contended capture still be read row-by-row (a query whose own
    # window was clean is trustworthy even when the capture is flagged).
    # Written to BENCH_DETAIL under "query_steal" — the compact stdout
    # line is unchanged. Sub-1%-steal rows are trustworthy; rows at >3%
    # (or with run spread > 2x) carry the burst and should be
    # adjudicated against their BASELINE.md band, not read as deltas.
    query_steal: dict[str, dict] = {}

    def timed_median(name: str, n_runs: int = 3) -> float:
        fn, _ = QUERIES[name]
        q_cpu0 = _cpu_stat()
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            # noop sink: forces full computation of every output column
            # (count() would let Catalyst prune projections on map-only
            # queries)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        if n_runs == 1:
            med = round(runs[0], 3)
            query_steal[name] = {
                "steal_pct": _round_or_none(_steal_pct(q_cpu0, _cpu_stat())),
                "runs": [round(r, 3) for r in runs],
            }
            print(f"# {name}: {med:.3f}s (1 run)", file=sys.stderr)
            return med
        # steal-window guard: warm same-plan runs agree within ~2x on a
        # quiet box; a larger spread means at least one run ate hypervisor
        # CPU-steal (or a one-off cold-codegen hit) — re-run up to 2 more
        # times and keep the 3 fastest so one bad window can't skew the
        # median
        retries = 0
        while max(runs) > 2.0 * min(runs) and retries < 2:
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            runs = sorted(runs)[:3]
            retries += 1
        med = round(sorted(runs)[len(runs) // 2], 3)
        query_steal[name] = {
            "steal_pct": _round_or_none(_steal_pct(q_cpu0, _cpu_stat())),
            "runs": [round(r, 3) for r in sorted(runs)],
            "spread": round(max(runs) / max(min(runs), 1e-9), 2),
            "rerun_retries": retries,
        }
        print(f"# {name}: {med:.3f}s", file=sys.stderr)
        return med

    all_names = list(BENCH_QUERIES) + list(EXTRA_BENCH_QUERIES)
    # probe after each quarter of the run so contention anywhere in the
    # timed window shows up in some probe
    probe_at = {
        all_names[min(len(all_names) - 1, (len(all_names) * k) // 4)]
        for k in (1, 2, 3)
    }
    probes: list[float] = []
    results: dict[str, float] = {}
    for name in all_names:
        # extras are informational (not the comparable headline total) and
        # the list keeps growing — a single timed run each keeps the whole
        # bench comfortably inside the driver's timeout; headline queries
        # and the heaviest extras (MEDIAN_EXTRA_QUERIES) keep median-of-3
        # (their numbers are compared round-over-round)
        results[name] = timed_median(
            name,
            n_runs=3
            if (name in BENCH_QUERIES or name in MEDIAN_EXTRA_QUERIES)
            else 1,
        )
        if name in probe_at:
            probes.append(round(_calibration_sec(spark), 3))
            print(f"# calibration probe after {name}: {probes[-1]:.3f}s",
                  file=sys.stderr)
    probes.append(round(_calibration_sec(spark), 3))
    print(f"# calibration (after): {probes[-1]:.3f}s", file=sys.stderr)
    timings = {n: results[n] for n in BENCH_QUERIES}
    extra = {n: results[n] for n in EXTRA_BENCH_QUERIES}

    steal_pct = _steal_pct(cpu_start, _cpu_stat())
    probe_flag_at = CALIBRATION_LOADED_FACTOR * CALIBRATION_CLEAN_FLOOR_SEC
    loaded_box = (
        max(probes) > probe_flag_at
        or loadavg_start > PREFLIGHT_LOAD_MAX
        or _steal_exceeds(steal_pct)
    )
    retry_attempts: list[dict] = []
    first_pass = None
    retry_adopted = False
    if loaded_box:
        print(
            "# WARNING: bench ran on a contended box — treat per-query "
            "deltas vs prior rounds as noise and re-measure solo",
            file=sys.stderr,
        )
    # Clean-retry of the HEADLINE set (r15, widened r16): the flag is
    # honest but the artifact of record still carries inflated numbers —
    # r14's official capture misread 0.95x code as 2.05x, and r15's
    # single 90 s settle landed inside the same steal burst and adopted
    # nothing. Ambient contention here arrives in bursts measured in
    # MINUTES, so: up to RETRY_MAX_ATTEMPTS retries, each after a
    # RETRY_SETTLE_SEC (>=300 s) settle, re-measuring the 35 headline
    # queries only; the first retry whose own dense probes (before +
    # every 9 queries + after) and own steal window are clean is
    # adopted. loadavg is deliberately NOT re-checked here: minutes
    # after a full pass the 1-min loadavg is dominated by the bench's
    # OWN residual, while the probes measure directly what loadavg
    # proxies. When adopted, ALL first-pass contention metadata (probes,
    # steal, loadavg, calibration-before, and the contended headline
    # timings) moves into the "first_pass" block so no consumer can
    # mistake it for the adopted window's; extras are NOT re-measured
    # and are marked contended.
    if loaded_box and (time.time() - bench_t0) > RETRY_MAX_START_SEC:
        retry_attempts.append({
            "timings": None, "probes": None, "steal_pct": None,
            "adopted": False, "skipped": "wall budget exceeded",
        })
        print("# retry skipped: first pass exceeded the wall budget",
              file=sys.stderr)
    elif loaded_box:
        for attempt in range(1, RETRY_MAX_ATTEMPTS + 1):
            if (time.time() - bench_t0) > RETRY_WALL_BUDGET_SEC:
                retry_attempts.append({
                    "timings": None, "probes": None, "steal_pct": None,
                    "adopted": False, "skipped": "wall budget exceeded",
                })
                print(
                    f"# retry {attempt} skipped: total wall budget "
                    "exceeded — flagged first pass stands",
                    file=sys.stderr,
                )
                break
            print(
                f"# retry {attempt}/{RETRY_MAX_ATTEMPTS}: settling "
                f"{RETRY_SETTLE_SEC:.0f}s for a clean headline window",
                file=sys.stderr,
            )
            time.sleep(RETRY_SETTLE_SEC)
            r_cpu0 = _cpu_stat()
            r_probes = [round(_calibration_sec(spark), 3)]
            print(f"# retry probe (before): {r_probes[0]:.3f}s",
                  file=sys.stderr)
            if r_probes[0] > probe_flag_at:
                retry_attempts.append({
                    "timings": None, "probes": r_probes, "steal_pct": None,
                    "adopted": False,
                })
                print(
                    f"# retry {attempt} window still contended before any "
                    "measurement — not spending the headline re-run",
                    file=sys.stderr,
                )
                continue
            # the retry's timed_median calls overwrite query_steal rows;
            # keep the contended first pass's per-query evidence so an
            # adopted capture still explains WHY the first pass read high
            fp_query_steal = {
                n: query_steal.get(n) for n in BENCH_QUERIES
            }
            r_timings: dict[str, float] = {}
            for i, name in enumerate(BENCH_QUERIES):
                r_timings[name] = timed_median(name, n_runs=3)
                if (i + 1) % 9 == 0 and (i + 1) < len(BENCH_QUERIES):
                    r_probes.append(round(_calibration_sec(spark), 3))
                    print(f"# retry probe (mid): {r_probes[-1]:.3f}s",
                          file=sys.stderr)
            r_probes.append(round(_calibration_sec(spark), 3))
            print(f"# retry probe (after): {r_probes[-1]:.3f}s",
                  file=sys.stderr)
            r_steal = _steal_pct(r_cpu0, _cpu_stat())
            # unknown steal falls back to probes-only qualification (and
            # was warned about up front); a MEASURED excess disqualifies
            retry_adopted = (
                max(r_probes) <= probe_flag_at
                and not _steal_exceeds(r_steal)
            )
            retry_attempts.append({
                "timings": r_timings,
                "probes": r_probes,
                "steal_pct": _round_or_none(r_steal),
                "adopted": retry_adopted,
            })
            if retry_adopted:
                print(
                    "# retry window was clean — headline timings adopted "
                    "from the retry; extras keep first-pass levels "
                    "(marked contended)",
                    file=sys.stderr,
                )
                first_pass = {
                    "flagged": True,
                    "headline_timings": timings,
                    "probes": probes,
                    "steal_pct": _round_or_none(steal_pct),
                    "loadavg_start": round(loadavg_start, 2),
                    "calibration_before": round(cal_before, 3),
                    "query_steal": fp_query_steal,
                }
                timings = r_timings
                probes = r_probes
                steal_pct = r_steal
                loaded_box = False
                break
            print(
                f"# retry {attempt} window still contended — "
                + ("trying again" if attempt < RETRY_MAX_ATTEMPTS
                   else "first pass stands"),
                file=sys.stderr,
            )

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # full detail goes to a FILE (unbounded size, judge-readable);
    # stdout gets one compact line the driver's capture can't truncate
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extra_queries": extra,
        "sf": float(sf),
        "runs": 3,
        "stat": "median",
        "extra_runs": {
            "default": 1,
            "median_of_3": sorted(MEDIAN_EXTRA_QUERIES),
        },
        # after an adopted retry the first pass's loadavg/calibration
        # readings belong to the CONTENDED window — they live in
        # first_pass, and the top level reads null so no consumer can
        # re-derive loaded_box from stale fields (r15 ADVICE)
        "loadavg_start": None if retry_adopted else round(loadavg_start, 2),
        "loadavg_end": round(_loadavg(), 2),
        # null = steal could not be measured (NOT clean): fall back to
        # the calibration probes when reading this capture
        "steal_pct": _round_or_none(steal_pct),
        "steal_flag_at": STEAL_PCT_MAX,
        "calibration_sec": {
            "before": None if retry_adopted else round(cal_before, 3),
            "probes": probes,
            "clean_floor": CALIBRATION_CLEAN_FLOOR_SEC,
            "flag_at": round(
                CALIBRATION_LOADED_FACTOR * CALIBRATION_CLEAN_FLOOR_SEC, 3
            ),
        },
        "loaded_box": loaded_box,
        # per-query steal window + sorted run times (and, for median-of-3
        # rows, max/min spread): read a contended capture row-by-row —
        # rows whose own window is sub-1% steal are trustworthy even when
        # the capture-level flag is up. After an adopted retry the
        # headline rows carry the ADOPTED window's evidence; the
        # contended first pass's rows live in first_pass.query_steal.
        "query_steal": query_steal,
        "retry": {
            "settle_sec": RETRY_SETTLE_SEC,
            "max_attempts": RETRY_MAX_ATTEMPTS,
            "attempts": retry_attempts,
        } if retry_attempts else None,
        # when a retry was adopted, the extras were NOT re-measured:
        # they carry first-pass (contended-window) levels — do not
        # adjudicate extra-query bands from this capture
        "extra_queries_contended": retry_adopted,
        "first_pass": first_pass,
        "baseline": "r7 reset: 35 headline queries (BASELINE.md)",
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
        "w",
    ) as f:
        json.dump(detail, f, indent=1)
    # stop BEFORE printing so no late executor/JVM stderr lands after the
    # JSON line in the driver's combined-output tail
    spark.stop()
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf),
            "runs": 3,
            "stat": "median",
            "loaded_box": loaded_box,
            # after an adopted retry this is the ADOPTED window's steal
            # (the first pass's reading lives in detail.first_pass), so
            # the steal_pct>3 reading rule and loaded_box never
            # contradict each other on the compact line; null = not
            # measured (read the probes instead)
            "steal_pct": _round_or_none(steal_pct),
            "retry_adopted": retry_adopted,
        },
        separators=(",", ":"),
    )
    assert len(line) < 2048, f"bench JSON line grew to {len(line)}B — trim it"
    print(line)


if __name__ == "__main__":
    main()
