"""Deduplication operators for training-data pipelines (north-star ops).

Scale design notes (the point of each variant):

- **exact_dedup** — one hash aggregate on an MD5 key: a single shuffle of
  (key, id) pairs, never of document bodies. At 100 TB, project the key+id
  first (column pruning keeps bodies out of the shuffle).
- **ngram_jaccard_pairs** — inverted-index self-join on *word n-gram*
  shingles: rare shingles keep the join sparse; a document-frequency cap
  drops degenerate hot shingles (stopword runs) before the join, which is
  the classic skew-killer for similarity self-joins.
- **minhash_signatures / minhash_lsh_pairs** — MinHash+LSH: candidate
  generation cost drops from O(n²) to O(n·bands) via banding; only
  candidates are verified with exact Jaccard. Hash functions are the
  portable rolling-hash family so the DuckDB oracle can reproduce the exact
  signatures (Spark's builtin hash is engine-specific).
- **simhash64** — 32-bit SimHash from word hashes; near-dups differ in few
  bits. Hamming-ball lookup via band keys comes with the LSH machinery.

All are pure built-in expressions (split/transform/aggregate/explode) —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import ROLLING_HASH_MOD, rolling_hash, word_shingles

__all__ = [
    "exact_dedup",
    "shingle_index",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash32",
]


def exact_dedup(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash: keeper = min id per group.

    Returns (keep_id, n_dups) per distinct content, n_dups >= 1.
    """
    return (
        df.select(F.md5(F.col(text)).alias("content_key"), F.col(id_col))
        .groupBy("content_key")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def shingle_index(
    df: DataFrame,
    n: int = 5,
    text: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Inverted index (shingle -> doc) over word n-grams, with an optional
    document-frequency cap that drops hot shingles before any join (skew
    control; changes candidate recall only for shingles shared by more than
    ``max_doc_freq`` docs, which contribute O(df²) join rows)."""
    idx = (
        df.select(F.col(id_col), F.explode(word_shingles(F.col(text), n)).alias("shingle"))
        .distinct()
    )
    if max_doc_freq is not None:
        hot = (
            idx.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        idx = idx.join(F.broadcast(hot), "shingle", "left_anti")
    return idx


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    text: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact Jaccard over word n-gram shingle sets.

    inverted-index self-join -> common-shingle counts -> |A|,|B| sizes ->
    jaccard = common / (|A| + |B| - common). Output (id_a < id_b, jaccard).
    """
    idx = shingle_index(df, n, text, id_col, max_doc_freq)
    sizes = idx.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a = idx.select(F.col(id_col).alias("id_a"), "shingle")
    b = idx.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        common.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# Fixed (a, b) parameters for the universal-hash family
# h_i(x) = (a_i * x + b_i) mod (2^31 - 1); seeded deterministically so the
# oracle can embed the same constants.
def _perm_params(num_perm: int) -> list[tuple[int, int]]:
    params = []
    a, b = 1103515245, 12345  # LCG-style constants, iterated deterministically
    x = 42
    for _ in range(num_perm):
        x = (a * x + b) % ROLLING_HASH_MOD
        pa = x | 1  # odd, nonzero
        x = (a * x + b) % ROLLING_HASH_MOD
        pb = x
        params.append((pa, pb))
    return params


def minhash_signatures(
    df: DataFrame,
    n: int = 3,
    num_perm: int = 8,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature per document: for each of ``num_perm`` permutations,
    min over shingles of (a*rolling_hash(shingle)+b) mod p.

    Whole computation is array expressions inside one projection — no
    explode, no shuffle; cost is O(total shingles · num_perm) map-side.
    Empty shingle sets (short docs) get signature value p (= missing).
    """
    shingles = word_shingles(F.col(text), n)
    hashed = F.transform(shingles, lambda s: rolling_hash_col(s))
    cols = [F.col(id_col)]
    for i, (pa, pb) in enumerate(_perm_params(num_perm)):
        mh = F.array_min(
            F.transform(hashed, lambda h: (F.lit(pa) * h + F.lit(pb)) % F.lit(ROLLING_HASH_MOD))
        )
        cols.append(F.coalesce(mh, F.lit(ROLLING_HASH_MOD)).alias(f"mh_{i}"))
    return df.select(*cols)


def rolling_hash_col(c: Column) -> Column:
    """rolling_hash lifted for use inside transform lambdas."""
    return rolling_hash(c)


def minhash_lsh_pairs(
    df: DataFrame,
    n: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH near-dup candidates, verified with exact Jaccard.

    Band key = the tuple of rows in the band (concatenated); docs sharing any
    band key become candidates (one shuffle on band keys, each band a narrow
    (key, id) relation), then exact Jaccard over shingle sets filters to
    ``>= threshold``. This is the 100 TB-shaped plan: candidates ~ O(n·near
    dups), never O(n²)."""
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, n, num_perm, text, id_col)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("_", *parts).alias("key"))
        )
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = buckets.select(F.col(id_col).alias("id_a"), "band", "key")
    b_ = buckets.select(F.col(id_col).alias("id_b"), "band", "key")
    cand = (
        a.join(b_, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # exact verification on candidates only
    exact = ngram_jaccard_pairs(df, n, 0.0, text, id_col).select(
        "id_a", "id_b", "jaccard"
    )
    return cand.join(exact, ["id_a", "id_b"]).filter(F.col("jaccard") >= threshold)


def simhash32(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash over word rolling-hashes: bit b of the fingerprint is 1
    iff sum over words of sign((h>>b)&1) is positive. Near-duplicate docs
    differ in few bits (compare via Hamming distance downstream).

    Implemented as one aggregate over a per-word bit-contribution array —
    map-side only, no shuffle.
    """
    words = F.split(F.trim(F.col(text)), r"\s+")
    hashes = F.transform(words, lambda w: rolling_hash(w))
    # per-bit vote: +1 if bit set, -1 otherwise, summed over words
    # (bit positions are Python-loop literals — shift amounts must be ints)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 32),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1)
                    .otherwise(-1)
                    .cast("long")
                    for b in range(32)
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    fp = df.select(F.col(id_col), votes.alias("votes"))
    bit_terms = [
        F.when(F.col("votes")[b] > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(32)
    ]
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return fp.select(F.col(id_col), total.alias("simhash"))
