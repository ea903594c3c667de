#!/usr/bin/env python
"""Scaling-linearity harness: replicate the sf0.1 documents table 1x/2x/4x
with every token prefixed by the replica id (so shingles are replica-local
and no cross-replica near-dup pairs exist — exact copies would create
quadratically many TRUE pairs and pollute the measurement), then time the
dedup operators in isolation. Near-linear (or sublinear, overhead-
amortizing) growth is the empirical check that the single-exchange plan
shapes hold as data grows.

Run: python scripts/measure_scaling.py   (prints one JSON line)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from scale_common import replicate_salted

from w4h_integrated_toolkit_spark.catalog import ensure_min_partitions, read_parquet
from w4h_integrated_toolkit_spark.operators import dedup as D
from w4h_integrated_toolkit_spark.session import get_spark

SF_DIR = os.environ.get("W4H_SCALE_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 2, 4)


def replicate(df, factor):
    # THE letters-only-salt rule lives in scripts/scale_common.py (digit
    # salts survive whitespace tokenizers but are split off by
    # letter-run extractors like bpe_vocab's [a-z]+, silently collapsing
    # every replica's words to one vocabulary — caught by review; the
    # bpe_learn scaling row's premise depends on it)
    out = replicate_salted(df, factor)
    return out


def main() -> None:
    s = get_spark("scaling", cpus=32, shuffle_partitions=32, driver_memory="16g")
    docs = ensure_min_partitions(read_parquet(s, f"{SF_DIR}/documents.parquet"))
    frames = {f: replicate(docs, f).localCheckpoint(eager=True) for f in FACTORS}
    from w4h_integrated_toolkit_spark.operators import bpe as BPE
    from w4h_integrated_toolkit_spark.operators import ranking as RK
    from w4h_integrated_toolkit_spark.operators import text as TX
    from w4h_integrated_toolkit_spark.operators import web as WEB
    from w4h_integrated_toolkit_spark.operators.etl import (
        weighted_priority_sample,
    )

    ops = {
        "minhash_lsh": lambda d: D.minhash_lsh_pairs(d).count(),
        "ngram_jaccard": lambda d: D.ngram_jaccard_pairs(d, n=5, threshold=0.2).count(),
        "simhash": lambda d: D.simhash32(d).count(),
        "exact_dedup": lambda d: D.exact_dedup(d).count(),
        # r7 wave-4/5 text/curation ops (same replicated frames)
        "token_entropy": lambda d: TX.token_entropy(d).count(),
        "pmi_pairs": lambda d: RK.pmi_pairs(d, vocab_size=32, min_cooc=5).count(),
        "golden_record": lambda d: D.golden_record(d).count(),
        "weighted_sample": lambda d: weighted_priority_sample(
            d.withColumn("n_chars", F.length("text")), "n_chars", 100
        ).count(),
        # r8 wave-7 text/LM ops (same replicated frames)
        "feature_hashing": lambda d: TX.feature_hashing(d, 256).count(),
        "bigram_nll": lambda d: RK.bigram_nll(d).count(),
        "vocab_oov_rate": lambda d: RK.vocab_oov_rate(
            d.withColumn("source", (F.col("doc_id") % 20).cast("string"))
        ).count(),
        # r9 wave-13: per-domain cap over a synthetic 997-domain URL
        # column (domain count fixed as docs grow — the realistic shape:
        # cap work per domain rises, the domain exchange does not)
        "domain_cap_sample": lambda d: WEB.domain_cap_sample(
            d.withColumn(
                "url",
                F.concat(
                    F.lit("http://www.dom"),
                    F.pmod(F.col("doc_id"), F.lit(997)).cast("string"),
                    F.lit(".com/p"),
                ),
            ),
            url_col="url",
            quality_col="n_chars",
            cap=3,
            salt_buckets=4,
        ).count(),
        # r9 wave-13: BPE fit — the replica token prefixes multiply the
        # VOCABULARY by the factor (each word becomes factor distinct
        # prefixed words), which is the dimension that actually grows
        # with corpus breadth; per-merge work is vocabulary-bound
        "bpe_learn": lambda d: BPE.bpe_learn(d, n_merges=4).count(),
        # r10: fixed-table inference — the kernel runs on the DISTINCT
        # WORD dictionary, which the salt prefixes multiply by the
        # factor (the honest growth dimension for segmentation)
        "bpe_segment": lambda d: BPE.bpe_segment(
            d, [("e", "r"), ("i", "n"), ("er", "in")]
        ).count(),
        # r10: HTML->text — map-side JVM regexp pipeline over pages
        # synthesized from the replicated docs
        "html_extract": lambda d: WEB.html_extract(
            d.withColumn(
                "html",
                F.concat(
                    F.lit("<html><head><title>T</title></head><body><p>"),
                    F.col("text"),
                    F.lit('</p><script>x("<p>");</script><a href="#">l</a></body></html>'),
                ),
            )
        ).count(),
        # r11: URL canonicalization + dedup rollup over noisy synthetic
        # URLs (same 997-domain key space as domain_cap_sample — keys
        # fixed as docs grow, the realistic frontier shape)
        "url_canonicalize": lambda d: WEB.url_dedup_groups(
            d.withColumn(
                "url",
                F.concat(
                    F.lit("HTTP://www.Dom"),
                    F.pmod(F.col("doc_id"), F.lit(997)).cast("string"),
                    F.lit(".com:80//p/?utm_source=f&b=2&a=1#x"),
                ),
            )
        ).count(),
        # r10: broadcast-PSL eTLD+1 over a synthetic multi-suffix host mix
        "registrable_domain_psl": lambda d: WEB.registrable_domain_psl(
            d.withColumn(
                "host",
                F.concat(
                    F.lit("w"),
                    F.pmod(F.col("doc_id"), F.lit(9973)).cast("string"),
                    F.element_at(
                        F.array(
                            F.lit(".example.co.uk"),
                            F.lit(".sample.com.au"),
                            F.lit(".plain.org"),
                        ),
                        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
                    ),
                ),
            )
        ).count(),
    }
    # r12: persisted-ranking scoring — snapshot-slice unigram fit, model
    # store round-trip, ingest-slice scoring (the registry entry's exact
    # chain; the store hop is vocab-sized and ~constant, growth comes
    # from the tf aggregate over the ingest slice)
    def _ranking_scores(d):
        import tempfile

        from w4h_integrated_toolkit_spark.sources.models import (
            load_model,
            save_model,
        )

        counts = (
            d.filter(F.col("doc_id") % 3 == 0)
            .select(
                F.explode(
                    F.split(F.lower(F.trim("text")), r"\s+")
                ).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        params = {"kind": "unigram_counts"}
        with tempfile.TemporaryDirectory(
            prefix="w4h_scale_rank_", ignore_cleanup_errors=True
        ) as store:
            save_model(s, store, counts, params)
            loaded, _ = load_model(s, store, expect_params=params)
            frozen = loaded.localCheckpoint(eager=True)
        return RK.unigram_nll(
            d.filter(F.col("doc_id") % 3 != 0), term_counts=frozen
        ).count()

    ops["ranking_model_scores"] = _ranking_scores

    # r12: WARC record extraction — the synth+parse round trip the gate
    # runs; per-blob work is id-formula-sized, so growth tracks the doc
    # count (the file is the parallel unit, exactly the 100 TB shape)
    def _warc(d):
        from w4h_integrated_toolkit_spark.plans.queries import (
            _attach_warc_payload,
        )
        from w4h_integrated_toolkit_spark.sources.warc import warc_records

        return warc_records(_attach_warc_payload(d.select("doc_id"))).count()

    ops["warc_extract"] = _warc

    results = {
        f: {
            "docs_rows": frames[f].count(),
            "pairs": D.minhash_lsh_pairs(frames[f]).count(),
        }
        for f in FACTORS
    }
    for op, fn in ops.items():
        for f in FACTORS:
            fn(frames[f])  # warm
            ts = []
            for _ in range(2):
                t0 = time.time()
                fn(frames[f])
                ts.append(time.time() - t0)
            results[f][op] = round(min(ts), 2)

    # r12: streaming URL-frontier dedup — a REAL availableNow streaming
    # job per trial, so it needs a parquet path per factor (same fixed
    # 997-key noisy-URL space as url_canonicalize: the frontier state is
    # key-bounded while the scanned rows grow)
    import shutil
    import tempfile as _tf

    from w4h_integrated_toolkit_spark.streaming.dedup_stream import (
        run_streaming_url_frontier_batchmode,
    )

    frontier_url = F.concat(
        F.lit("HTTP://www.Dom"),
        F.pmod(F.col("doc_id"), F.lit(997)).cast("string"),
        F.lit(".com:80//p/?utm_source=f&b=2&a=1#x"),
    )
    for f in FACTORS:
        d_dir = _tf.mkdtemp(prefix=f"w4h_scale_frontier_{f}x_")
        try:
            frames[f].write.mode("overwrite").parquet(d_dir)
            run_streaming_url_frontier_batchmode(s, d_dir, frontier_url).count()
            ts = []
            for _ in range(2):
                t0 = time.time()
                run_streaming_url_frontier_batchmode(
                    s, d_dir, frontier_url
                ).count()
                ts.append(time.time() - t0)
            results[f]["stream_url_frontier"] = round(min(ts), 2)
        finally:
            shutil.rmtree(d_dir, ignore_errors=True)

    # wave-7 non-document ops: embeddings (Gram) and events (rolling
    # median) replicate by id offset — values may repeat, neither op's
    # cost depends on content collisions
    from w4h_integrated_toolkit_spark.operators.linalg import embedding_gram
    from w4h_integrated_toolkit_spark.operators.timeseries import (
        rolling_median,
    )

    emb = read_parquet(s, f"{SF_DIR}/embeddings.parquet")
    ev = read_parquet(s, f"{SF_DIR}/events.parquet")
    for f in FACTORS:
        e_f = ensure_min_partitions(
            emb.withColumn(
                "_rep", F.explode(F.array(*[F.lit(i) for i in range(f)]))
            ).withColumn(
                "vec_id", F.col("vec_id") + F.col("_rep") * 10_000_000
            ).drop("_rep")
        ).localCheckpoint(eager=True)
        v_f = ev.withColumn(
            "_rep", F.explode(F.array(*[F.lit(i) for i in range(f)]))
        ).withColumn(
            "user_id", F.col("user_id") + F.col("_rep") * 10_000_000
        ).drop("_rep").localCheckpoint(eager=True)
        from w4h_integrated_toolkit_spark.operators.timeseries import (
            autocorrelation,
        )

        def _acf():
            m = v_f.groupBy(
                "event_type",
                F.floor(F.col("ts").cast("double") / 60).cast("long").alias("m"),
            ).agg(
                F.expr(
                    "CAST(sum(CAST(round(value * 1e3) AS BIGINT)) "
                    "DIV count(*) AS BIGINT)"
                ).alias("x")
            )
            return autocorrelation(m).count()

        from w4h_integrated_toolkit_spark.operators.etl import (
            scd2_apply,
            scd2_intervals,
        )
        from w4h_integrated_toolkit_spark.operators.similarity import (
            kmeans_fit,
        )

        def _scd2_fold():
            cut = F.expr("timestamp'2024-01-20 00:00:00'")
            dim = scd2_intervals(
                v_f.filter(F.col("ts") < cut), "user_id", "event_type"
            )
            return scd2_apply(
                dim, v_f.filter(F.col("ts") >= cut), "user_id", "event_type"
            ).count()

        def _ivf_persisted():
            # r11: fit -> model store -> probe. The store hop is O(k·d)
            # and corpus-invariant; growth comes from the fit scans and
            # the probe — same shape as knn_ivf_fitted plus a constant
            import tempfile

            from w4h_integrated_toolkit_spark.operators.similarity import (
                centroid_arrays,
                ivf_topk,
            )
            from w4h_integrated_toolkit_spark.sources.models import (
                load_model,
                save_model,
            )

            params = {"k": 8, "iterations": 2, "scale": 10**6}
            cells = kmeans_fit(e_f, k=8, iterations=2)
            with tempfile.TemporaryDirectory(
                prefix="w4h_scale_model_", ignore_cleanup_errors=True
            ) as store:
                save_model(s, store, cells, params)
                loaded, _ = load_model(s, store, expect_params=params)
                return ivf_topk(
                    e_f,
                    e_f.filter(F.col("vec_id") < 8),
                    k=5,
                    nprobe=2,
                    centroids=centroid_arrays(loaded),
                ).count()

        def _replay_wrap():
            # r11: the O7 loop drive — the day index stays 30 stamps at
            # every factor (events replicate WITHIN the same span), so
            # growth is per-batch filter/agg work only
            from w4h_integrated_toolkit_spark.streaming.replay import (
                ReplaySource,
            )

            evd = v_f.withColumn("_day", F.col("ts").cast("date"))
            src = ReplaySource(evd, ts_col="_day", batch_size=7, loop=True)
            cycle = -(-len(src) // 7)
            n = 0
            for b in src.batches(limit=cycle + 3):
                n += b.agg(F.count(F.lit(1))).collect()[0][0]
            return n

        for op, fn in {
            "embedding_gram": lambda: embedding_gram(e_f).count(),
            "rolling_median": lambda: rolling_median(v_f, k=5).count(),
            "acf_lags": _acf,
            # r9: full two-iteration fit (timing includes the loop's own
            # checkpoint actions — the honest cost of the operator)
            "kmeans_fit": lambda: kmeans_fit(e_f, k=8, iterations=2).count(),
            "scd2_apply": _scd2_fold,
            "knn_ivf_persisted": _ivf_persisted,
            "replay_wraparound": _replay_wrap,
        }.items():
            fn()  # warm
            ts = []
            for _ in range(2):
                t0 = time.time()
                fn()
                ts.append(time.time() - t0)
            results[f][op] = round(min(ts), 2)
        e_f.unpersist()
        v_f.unpersist()
    print(json.dumps({f"{k}x": v for k, v in results.items()}))
    s.stop()


if __name__ == "__main__":
    main()
