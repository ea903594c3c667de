"""The fit-job / apply-job split — fitted models published through the
versioned model store and consumed by a DIFFERENT session.

No reference analogue (the reference ships no learned artifacts); this
is the production shape of every 100 TB pipeline that learns anything:
the nightly FIT job trains over the corpus and publishes, and many
APPLY jobs (other sessions, other machines) consume the frozen model
without refitting. Three passes over one corpus:

  1. fit job    — kmeans_fit learns k=8 centroids over the embeddings
                  (integer Lloyd, bit-exact on any partitioning) and
                  bpe_learn fits a merge table over the documents; both
                  are PUBLISHED via sources/models.save_model — one
                  atomic versioned snapshot each, params stamped
  2. apply job  — a FRESH session loads each model back with
                  load_model(expect_params=...) (a stale-hyperparameter
                  model raises instead of applying silently wrong),
                  probes the corpus with the persisted IVF quantizer
                  (centroid_arrays → ivf_topk — the corpus never
                  shuffles) and tokenizes documents under the stored
                  merge table (bpe_segment — the Arrow kernel runs on
                  the distinct-word dictionary only)
  3. refit      — a second save fully REPLACES the model (no stale
                  centroid rows survive a smaller k), while the first
                  fit stays pinned and loadable by version — rollback
                  is a version number, not a re-train

Run: python examples/model_registry.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from w4h_integrated_toolkit_spark.catalog import read_parquet
from w4h_integrated_toolkit_spark.operators.bpe import bpe_learn, bpe_segment
from w4h_integrated_toolkit_spark.operators.similarity import (
    centroid_arrays,
    ivf_topk,
    kmeans_fit,
)
from w4h_integrated_toolkit_spark.session import get_spark
from w4h_integrated_toolkit_spark.sources.models import load_model, save_model

SF_DIR = os.environ.get("W4H_EXAMPLE_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("model-registry", cpus=4, shuffle_partitions=4)
    emb = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    docs = read_parquet(spark, f"{SF_DIR}/documents.parquet")

    # ---- 1. fit job: train and PUBLISH ----
    cent_store = tempfile.mkdtemp(prefix="w4h_ex_centroids_")
    bpe_store = tempfile.mkdtemp(prefix="w4h_ex_bpe_")
    cent_params = {"k": 8, "iterations": 2, "scale": 10**6}
    v_c = save_model(
        spark, cent_store, kmeans_fit(emb, k=8, iterations=2), cent_params
    )
    v_b = save_model(spark, bpe_store, bpe_learn(docs, n_merges=4), {"n_merges": 4})
    print(f"published centroids v{v_c} -> {cent_store}")
    print(f"published merge table v{v_b} -> {bpe_store}")

    # ---- 2. apply job: a FRESH session consumes the frozen models ----
    apply_session = spark.newSession()
    cells, _ = load_model(apply_session, cent_store, expect_params=cent_params)
    hits = ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 4),
        k=3,
        nprobe=2,
        centroids=centroid_arrays(cells),
    )
    print("persisted-quantizer ANN probe:")
    hits.orderBy("query_id", "rank").show(6, truncate=False)

    merges_df, _ = load_model(apply_session, bpe_store, expect_params={"n_merges": 4})
    table = [
        (r["left_sym"], r["right_sym"])
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    toks = bpe_segment(docs, table)
    print("tokenized under the stored merge table:")
    toks.select("doc_id", F.slice("tokens", 1, 6).alias("head")).show(
        4, truncate=False
    )

    # ---- 3. refit: replace, with the old fit pinned by version ----
    save_model(
        spark,
        cent_store,
        kmeans_fit(emb, k=5, iterations=2),
        {"k": 5, "iterations": 2, "scale": 10**6},
    )
    new, new_p = load_model(spark, cent_store)
    old, old_p = load_model(spark, cent_store, version=v_c)
    print(
        f"refit replaced the snapshot: latest k={new_p['k']} "
        f"({new.select('centroid_id').distinct().count()} centroids); "
        f"v{v_c} still loads k={old_p['k']} "
        f"({old.select('centroid_id').distinct().count()} centroids)"
    )
    import shutil

    shutil.rmtree(cent_store, ignore_errors=True)
    shutil.rmtree(bpe_store, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
