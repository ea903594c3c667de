"""The embedding-corpus journey — the engine's dense-vector layer,
end-to-end on one table.

No reference analogue (the reference has no embedding surface); this is
the pass a training pipeline runs over a fresh embedding dump before
committing it to retrieval / clustering / dedup duty:

  1. normalization audit — per-dimension quantized min/max/mean
                           (embedding_dim_stats): catches dead dims and
                           un-normalized exports before anything trusts
                           cosine geometry
  2. second moments      — integer Gram matrix XᵀX (embedding_gram);
                           with the step-1 means this yields the exact
                           covariance Cov ∝ G/n − μμᵀ, the PCA/whitening
                           seed — derived driver-side on the d×d result,
                           never on the corpus
  3. clustering          — two deterministic integer Lloyd steps
                           (kmeans_iteration) from id-seeded centroids
  4. semantic dedup      — SemDeDup-style near-duplicate pairs within
                           sign-LSH buckets (neardup_pairs)
  5. retrieval check     — IVF ANN top-k for a probe vector against the
                           corpus (ivf_topk), the index the pipeline
                           ships if steps 1-4 pass

Every step is a registry-gated operator; this script just chains them.
Run: python examples/embedding_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from w4h_integrated_toolkit_spark.catalog import read_parquet
from w4h_integrated_toolkit_spark.operators.linalg import (
    embedding_dim_stats,
    embedding_gram,
)
from w4h_integrated_toolkit_spark.operators.similarity import kmeans_iteration
from w4h_integrated_toolkit_spark.session import get_spark

SF_DIR = os.environ.get("W4H_EXAMPLE_SF_DIR", "/root/testdata/sf0.001")
SCALE = 10**6


def main() -> None:
    spark = get_spark("embedding_pipeline", cpus=8, shuffle_partitions=8)
    emb = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    d = len(emb.select("embedding").first()["embedding"])
    print(f"corpus: {n} vectors x {d} dims")

    # 1. normalization audit: dead dims (min == max) and gross mean drift
    stats = embedding_dim_stats(emb).collect()
    dead = [r["dim"] for r in stats if r["min_q"] == r["max_q"]]
    worst = max(stats, key=lambda r: abs(r["mean_q"]))
    print(
        f"dim stats: {len(dead)} dead dims; largest |mean| at dim "
        f"{worst['dim']} = {worst['mean_q'] / SCALE:+.6f}"
    )

    # 2. exact second moments -> covariance diagonal, derived driver-side
    # from the d x d integer Gram (the corpus is never re-read for it)
    gram = {(r["i"], r["j"]): r["g"] for r in embedding_gram(emb).collect()}
    mean = {r["dim"]: r["mean_q"] for r in stats}
    var = [
        (gram[(i, i)] / n - mean[i] ** 2) / SCALE**2 for i in range(d)
    ]
    top_var = sorted(range(d), key=lambda i: -var[i])[:3]
    print(
        "highest-variance dims (PCA candidates): "
        + ", ".join(f"{i} ({var[i]:.6f})" for i in top_var)
    )

    # 3. two deterministic Lloyd steps from id-seeded centroids (k=4)
    cents = emb.filter(F.col("vec_id") % (max(n // 4, 1)) == 0).limit(4)
    assigned = None
    for step in range(2):
        out = kmeans_iteration(emb, cents)
        # fold the per-dim rows back into centroid vectors for the next step
        cents = (
            out.groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "q_value"))
                ).alias("_dq")
            )
            .select(
                F.col("centroid_id").alias("vec_id"),
                F.transform(
                    "_dq", lambda s: s["q_value"].cast("double") / F.lit(float(SCALE))
                ).alias("embedding"),
            )
        )
        sizes = {
            r["centroid_id"]: r["n_members"]
            for r in out.filter(F.col("dim") == 0).collect()
        }
        print(f"lloyd step {step + 1}: cluster sizes {sizes}")
        assigned = sizes

    # 4. near-duplicate pairs within sign-LSH buckets (the SemDeDup-style
    # gate; same operator the registry entries build on)
    from w4h_integrated_toolkit_spark.operators.similarity import neardup_pairs

    pairs = neardup_pairs(emb, threshold=0.95).count()
    print(f"semantic near-dup pairs (cos >= 0.95): {pairs}")

    # 5. retrieval smoke: IVF top-5 for the corpus' first vector
    from w4h_integrated_toolkit_spark.operators.similarity import ivf_topk

    probe = emb.orderBy("vec_id").limit(1)
    hits = ivf_topk(emb, probe, k=5, centroid_stride=50, nprobe=3)
    print("IVF top-5 for the probe vector:")
    for r in hits.collect():
        print(f"  {r['neighbor_id']}  cos={r['cos']:.4f}")

    if assigned is not None and sum(assigned.values()) != n:
        raise SystemExit("cluster sizes do not cover the corpus")
    spark.stop()


if __name__ == "__main__":
    main()
