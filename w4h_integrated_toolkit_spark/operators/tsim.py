"""Z-normalized time-series similarity + top-k (SURVEY §7 phase 5).

Which users' signals move together? The classic z-normalized similarity
(cf. the matrix-profile / UCR-suite literature in PAPERS.md) over
whole-series alignment: Pearson correlation of two series IS the cosine of
their z-normalized vectors, so the built-in ``corr`` aggregate computes it
in one pass — no explicit normalization stage, no UDF.

Plan shape (designed for the 100 TB case):
1. resample each user onto a shared time grid — ONE hash aggregate; this
   is also the dimensionality bound (b buckets), decoupling pair cost from
   raw series length;
2. self-join on bucket index — the only quadratic step, and it is
   bucket-local: each grid cell joins only users active in that cell;
3. ``corr`` per user pair over common buckets — partial-aggregatable,
   map-side combined;
4. per-user top-k by correlation via row_number (no global sort).

For cohort-scale user counts the bucket self-join is fine; for millions of
users, pass ``block_planes=`` to :func:`user_similarity_topk` — the
sign-LSH blocking arm (:func:`user_block_keys`) restricts the B(B+1)/2
block Gram decomposition to users sharing an LSH key, the same
Rademacher sign-hash family ``similarity.neardup_pairs`` blocks with.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample_grid", "user_block_keys", "user_similarity_topk"]


def resample_grid(
    df: DataFrame,
    ts: str = "ts",
    value: str = "value",
    key: str = "user_id",
    bucket_seconds: int = 21600,
) -> DataFrame:
    """(key, bucket, mean value) on a fixed epoch-aligned grid.

    Bucket means use the order-independent scaled-integer mean so the grid
    — and everything correlated from it — is bit-identical at any
    partition count (plain avg(double) is not)."""
    from .timeseries import stable_mean

    bucket = (F.floor(F.col(ts).cast("double") / bucket_seconds)).cast("long")
    return df.groupBy(F.col(key).alias("k"), bucket.alias("bucket")).agg(
        stable_mean(value).alias("v")
    )


def _rademacher_sign(j: int, bucket: Column, seed: int) -> Column:
    """±1.0 from xxhash64(seed, j, bucket) parity — the dimension-keyed
    Rademacher sign-LSH family ``similarity._sign_hash_bit`` uses, with
    the grid-bucket VALUE as the dimension key (the grid is unbounded,
    so no literal plane array can exist)."""
    return F.when(
        F.pmod(F.xxhash64(F.lit(seed), F.lit(j), bucket), F.lit(2)) == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))


def user_block_keys(
    g: DataFrame, block_planes: int, seed: int = 42
) -> DataFrame:
    """One sign-LSH key per user from its grid vector: (k, lsh string of
    ``block_planes`` bits). Bit j is the sign of the dot product between
    the user's MEAN-CENTERED grid values and a Rademacher ±1 vector
    keyed by (seed, j, bucket). Centering matters: Pearson correlation
    is the cosine of the centered vectors, so two positively-correlated
    users have nearly parallel centered vectors and agree on every bit
    w.h.p. (per-user std scaling is skipped — a positive scale never
    flips a dot's sign). Computed as ONE extra hash aggregate over the
    grid — no vector is ever materialized, so the grid's bucket span is
    unbounded.

    Bits are PARTITION-COUNT-INVARIANT: the centered dot's sign is
    taken on the integer identity n·Σv₆s − (Σv₆)(Σs) over 1e-6-scaled
    grid values (v₆ = round(v·1e6), s = ±1), summed in DECIMAL(38,0) —
    exact whole-number arithmetic in any order, the ``stable_mean``
    discipline. A float-summed dot near zero could flip a bit with the
    shuffle layout and silently move a user between buckets across
    runs.

    This is a recall trade exactly like ``similarity.neardup_pairs``
    blocking: a pair is scored only if no plane separates it
    (P ≈ (1 − θ/π)^planes). Anti-correlated pairs (r < 0) get FLIPPED
    centered vectors and land in complementary buckets — use blocking
    only when the query is "most positively similar", which is what
    top-k by r DESC asks.
    """
    dec = "decimal(38,0)"
    v6 = F.round(F.col("v") * 1_000_000).cast(dec)
    aggs = [F.sum(v6).alias("_b"), F.count(F.lit(1)).cast(dec).alias("_n")]
    for j in range(block_planes):
        s = _rademacher_sign(j, F.col("bucket"), seed).cast(dec)
        aggs.append(F.sum(v6 * s).alias(f"_a{j}"))
        aggs.append(F.sum(s).alias(f"_c{j}"))
    per_user = g.groupBy("k").agg(*aggs)
    bits = [
        # sign(Σ(v−mean)·s) == sign(n·Σv₆s − Σv₆·Σs), n > 0
        F.when(
            F.col("_n") * F.col(f"_a{j}") - F.col("_b") * F.col(f"_c{j}")
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for j in range(block_planes)
    ]
    return per_user.select("k", F.concat(*bits).alias("lsh"))


def user_similarity_topk(
    df: DataFrame,
    k: int = 3,
    ts: str = "ts",
    value: str = "value",
    key: str = "user_id",
    bucket_seconds: int = 21600,
    min_common: int = 8,
    n_chunks: int | None = 8,
    block_planes: int | None = None,
    block_seed: int = 42,
) -> DataFrame:
    """Top-``k`` most-similar keys per key by z-normalized similarity
    (Pearson r over common grid buckets); pairs with fewer than
    ``min_common`` common buckets are dropped (correlation of a handful of
    points is noise). Ties break by neighbor id (deterministic).

    Every per-pair Pearson statistic over the COMMON buckets is an inner
    product of per-user masked grid vectors — n = m_a·m_b, Σa = vm_a·m_b,
    Σab = vm_a·vm_b, etc. — so all pair stats for a block of users are a
    handful of BLAS Gram multiplies. The earlier bucket self-join +
    corr-aggregate plan pushed |users|²·|buckets| joined rows through a
    hash aggregate (~270M at sf0.1, 35s); the Gram form does the identical
    arithmetic as dense matrix products (~15x faster here). Distribution is
    a 2D block decomposition: users hash into ``n_chunks`` chunks, each
    cell row is replicated to the chunk-pairs it participates in, and one
    applyInPandas kernel per (chunk_a, chunk_b) emits that block's pair
    stats — B(B+1)/2 independent tasks whose inputs are O(cells·B/B²) each,
    the standard scalable all-pairs shape (raise ``n_chunks`` with the
    cluster). Chunking only partitions work — results are
    chunk-count-invariant.

    At millions of users even the block decomposition is all-pairs WORK
    (B(B+1)/2 blocks of O((n/B)²) pairs each): pass ``block_planes``
    to insert :func:`user_block_keys` sign-LSH blocking first — users
    are bucketed by the sign pattern of their mean-centered grid
    vector, and only same-bucket pairs are scored, cutting pair work
    ~4^planes for well-spread data at the usual sign-LSH recall trade
    (a correlated pair is missed iff some plane separates it;
    anti-correlated neighbors are excluded by construction — see
    :func:`user_block_keys`). Pair statistics that ARE computed are
    bit-identical to the unblocked arm's: blocking only filters
    candidates, never changes arithmetic.
    """
    import numpy as np
    import pandas as pd

    from ..functions import portable_hash32

    g = resample_grid(df, ts, value, key, bucket_seconds)
    if n_chunks is None:
        # auto-pick per shape (r16 verdict order #7, measured r17): the
        # optimum chunk count flips with the user count because two
        # costs pull opposite ways — every grid cell is replicated
        # n_chunks times through the block exchange (small user counts
        # want FEW chunks: 1,500 users measured nc4 1.4-1.7 s vs nc8
        # 2.1-2.5 s at both 8 and 32 cores), while the per-block Gram
        # work grows with (users/chunks)² (large counts want MANY:
        # 6,000 users measured nc4 ~15 s vs nc8 6.6 / nc12 5.4 s).
        # ~400 users per chunk lands both measured shapes at their
        # optimum; the checkpoint makes the sizing count cheap and is
        # grid-sized (users x active buckets), never event-sized.
        # Web-scale callers keep passing an explicit n_chunks sized to
        # the cluster (the docstring's standing contract); the clamp
        # bounds the auto pick, it is not a parallelism ceiling.
        g = g.localCheckpoint(eager=True)
        n_users = g.select("k").distinct().count()
        n_chunks = max(2, min(64, -(-n_users // 400)))
    cells = g.select(
        (portable_hash32(F.col("k").cast("string")) % n_chunks).alias("chunk"),
        "k",
        F.col("bucket").alias("b"),
        "v",
    )
    group_cols = ["block_id"]
    if block_planes is not None:
        if block_planes < 1:
            raise ValueError(
                f"block_planes must be >= 1, got {block_planes}"
            )
        # one extra hash aggregate on k (the grid's own key) + one hash
        # join back; the kernel grouping gains the lsh key, so only
        # same-bucket pairs ever meet a Gram product
        keys = user_block_keys(g, block_planes, block_seed)
        cells = cells.join(keys, "k")
        group_cols = ["lsh", "block_id"]
    others = df.sparkSession.range(n_chunks).select(F.col("id").alias("other"))
    ca = F.least("chunk", "other")
    cb = F.greatest("chunk", "other")
    # dense block index in [0, B(B+1)/2) for ca<=cb: lower-triangle row-major
    tagged = cells.crossJoin(F.broadcast(others)).select(
        *(["lsh"] if block_planes is not None else []),
        (cb * (cb + 1) / 2 + ca).cast("long").alias("block_id"),
        ca.alias("ca"),
        cb.alias("cb"),
        "chunk",
        "k",
        "b",
        "v",
    )

    def block(key_, pdf):
        if not len(pdf):
            return pd.DataFrame(
                {"user_a": [], "user_b": [], "r": [], "n_common": []}
            )
        ca, cb = int(pdf["ca"].iat[0]), int(pdf["cb"].iat[0])
        empty = pd.DataFrame({"user_a": [], "user_b": [], "r": [], "n_common": []})
        # densify the BLOCK's bucket set, not the global [min,max] span: a
        # bucket absent from this block is an all-zero column in every
        # operand, contributing nothing to any Gram product — so no global
        # bounds pass is needed (the earlier min/max driver fetch executed
        # the whole resample shuffle a second time), and matrix width is
        # bounded by the block's own activity, not the corpus time span
        _, colidx = np.unique(pdf["b"].to_numpy(), return_inverse=True)
        w = int(colidx.max()) + 1 if len(colidx) else 0
        pdf = pdf.assign(_c=colidx)

        def build(sub):
            users = np.sort(sub["k"].unique())
            uidx = {u: i for i, u in enumerate(users)}
            M = np.zeros((len(users), w))
            V = np.zeros((len(users), w))
            rows = sub["k"].map(uidx).to_numpy()
            cols = sub["_c"].to_numpy()
            M[rows, cols] = 1.0
            V[rows, cols] = sub["v"].to_numpy()
            return users, M, V

        if ca == cb:
            ua, Ma, Va = build(pdf)
            ub, Mb, Vb = ua, Ma, Va
        else:
            sa, sb = pdf[pdf["chunk"] == ca], pdf[pdf["chunk"] == cb]
            if not len(sa) or not len(sb):
                return empty
            ua, Ma, Va = build(sa)
            ub, Mb, Vb = build(sb)
        N = Ma @ Mb.T
        Sa = Va @ Mb.T
        Sb = Ma @ Vb.T
        Sab = Va @ Vb.T
        Saa = (Va * Va) @ Mb.T
        Sbb = Ma @ (Vb * Vb).T
        with np.errstate(divide="ignore", invalid="ignore"):
            r = (N * Sab - Sa * Sb) / np.sqrt(
                (N * Saa - Sa * Sa) * (N * Sbb - Sb * Sb)
            )
        keep = (N >= min_common) & np.isfinite(r)
        if ca == cb:
            np.fill_diagonal(keep, False)
        ia, ib = np.nonzero(keep)
        out = pd.DataFrame(
            {
                "user_a": ua[ia],
                "user_b": ub[ib],
                "r": r[ia, ib],
                "n_common": N[ia, ib].astype(np.int64),
            }
        )
        if ca != cb:  # emit the reverse direction too (r is symmetric)
            rev = out.rename(columns={"user_a": "user_b", "user_b": "user_a"})
            out = pd.concat([out, rev[out.columns]], ignore_index=True)
        return out

    # pin the kernel stage's parallelism to one task per block: AQE's
    # byte-based partition coalescing sees small shuffle blocks and would
    # serialize several BLAS kernels into one task — bytes are the wrong
    # cost model for CPU-dense Python stages. An explicit fixed-count
    # repartition is exempt from AQE coalescing; RANGE partitioning on the
    # dense block_id (not hash — hashing B(B+1)/2 keys into as many
    # partitions leaves ~1/e of them empty to birthday collisions) puts
    # each block in its own partition, and RangePartitioning satisfies the
    # groupBy's clustered distribution so no second exchange is added.
    # Boundary sampling could still co-locate two blocks; that only costs
    # parallelism, never correctness.
    n_blocks = n_chunks * (n_chunks + 1) // 2
    # under blocking the range partitioning covers (lsh, block_id) — the
    # partition count stays n_blocks (blocked kernels are ~4^planes
    # smaller, so several sharing a task is the right trade), and
    # RangePartitioning on the grouping cols still satisfies the
    # groupBy's clustered distribution with no second exchange
    pairs = (
        tagged.repartitionByRange(n_blocks, *group_cols)
        .groupBy(*group_cols)
        .applyInPandas(block, "user_a long, user_b long, r double, n_common long")
    )
    w = Window.partitionBy("user_a").orderBy(F.col("r").desc(), F.col("user_b"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("user_a", "user_b", "rank", "r", "n_common")
    )
