"""Byte-pair-encoding merge learning at corpus scale.

The tokenizer-training op every LLM data pipeline runs before training:
learn the top-N BPE merges (Sennrich et al. 2016, public algorithm) from a
document corpus. Extends the curation surface the reference's analytics
never had (reference analog: none — this is part of the training-data
layer, like `text.py` / `ranking.py`); the fitted merges pair with
`ranking.vocab_oov_rate` (audit) and `text.subword_count` (estimate).

Scale design — the classic corpus→vocabulary compression, distributed:

1. ``bpe_vocab``: corpus → word-frequency vocabulary. ONE corpus-sized
   shuffle (groupBy word); everything after is vocabulary-sized (at 100 TB
   a web corpus has ~1e7-1e8 distinct words vs ~1e13 tokens, so per-merge
   work drops ~5 orders of magnitude). Words are ``[a-z]+`` runs of the
   lowercased text — ASCII-only on purpose: identical semantics in any
   engine/locale, and the oracle re-derives it independently.
2. ``bpe_pair_counts``: adjacent-symbol pairs weighted by word count —
   a map-side ``zip_with`` of the two shifted slices (no posexplode, no
   window) into one (left,right)-keyed partial aggregate.
3. The best merge (max count, ties by lexicographic pair — deterministic,
   what lets a SQL oracle replay the fit) is a ``LIMIT 1`` TakeOrdered:
   O(1) rows to the driver per step.
4. ``bpe_apply_merge``: greedy left-to-right non-overlapping replacement,
   expressed as a sequential FOLD over each word's symbol array
   (``F.aggregate`` with a (out, pending) struct accumulator) — JVM-side,
   zero exchanges, O(word_len) state. Overlap only matters when
   left == right ("aaaa" + (a,a) → ["aa","aa"], never ["a","aa","a"]);
   the fold's pending-reset encodes exactly that. The DuckDB oracle uses
   a genuinely different closed form (gaps-and-islands over match
   streaks: a streak of consecutive matches only arises when
   left == right, and greedy keeps the odd offsets), so the two sides
   don't share the sequential formulation.
5. ``bpe_learn``: the driver convergence loop, same unrolled-iterations +
   eager ``localCheckpoint`` lineage-truncation discipline as
   ``similarity.kmeans_fit`` / ``graph.pagerank_fixed_point``. Per-step
   driver traffic is the single argmax row; the vocabulary never leaves
   the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "bpe_vocab",
    "bpe_pair_counts",
    "bpe_apply_merge",
    "bpe_learn",
    "bpe_encode",
    "bpe_segment",
]

_WORD_PATTERN = "[a-z]+"

MERGES_SCHEMA = StructType(
    [
        StructField("merge_rank", LongType(), False),
        StructField("left_sym", StringType(), False),
        StructField("right_sym", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def bpe_vocab(df: DataFrame, text: str = "text") -> DataFrame:
    """Word-frequency vocabulary with character-level symbol sequences:
    (word, cnt, syms). The one corpus-sized stage of the whole fit."""
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text)), F.lit(_WORD_PATTERN), 0)
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("word", "cnt", F.split("word", "").alias("syms"))
    )


def bpe_pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the vocabulary, weighted by word
    frequency → (left_sym, right_sym, pair_count). Counts every adjacent
    occurrence (overlaps included: "aaaa" contributes 3× (a,a)) — the
    standard BPE counting convention; greedy application is where
    non-overlap enters. Map-side zip of shifted slices + one aggregate."""
    n = F.size("syms")
    heads = F.slice("syms", 1, n - 1)
    tails = F.slice("syms", 2, n - 1)
    pair = F.explode(
        F.zip_with(heads, tails, lambda a, b: F.struct(a.alias("l"), b.alias("r")))
    ).alias("p")
    return (
        vocab.select(F.col("cnt"), pair)
        .groupBy(
            F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
        )
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
    )


def _fold_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right single-merge application as a fold.

    Accumulator (out: array<string>, pend: string): `pend` holds the one
    symbol that may still start a merge. On each x: if pend is the merge's
    left and x its right, emit the merged symbol and CLEAR pend (so the
    merged token cannot chain into the next occurrence — the non-overlap
    rule); otherwise flush pend and hold x. O(len) per word, no shuffle.
    """
    merged = F.lit(left + right)
    nul = F.lit(None).cast("string")

    def step(acc: Column, x: Column) -> Column:
        return (
            F.when(
                acc["pend"].isNull(),
                F.struct(acc["out"].alias("out"), x.alias("pend")),
            )
            .when(
                (acc["pend"] == F.lit(left)) & (x == F.lit(right)),
                F.struct(
                    F.concat(acc["out"], F.array(merged)).alias("out"),
                    nul.alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    x.alias("pend"),
                )
            )
        )

    init = F.struct(
        F.array().cast("array<string>").alias("out"), nul.alias("pend")
    )
    return F.aggregate(
        syms,
        init,
        step,
        lambda acc: F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"]))),
    )


def bpe_apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every word's symbol sequence with one merge applied
    greedily left-to-right (non-overlapping). Pure narrow map stage."""
    return vocab.withColumn("syms", _fold_merge(F.col("syms"), left, right))


def _fit(
    df: DataFrame, text: str, n_merges: int, apply_last: bool
) -> tuple[DataFrame, list[tuple[int, str, str, int]]]:
    """The shared fit loop behind :func:`bpe_learn` and
    :func:`bpe_encode`: fit up to ``n_merges`` merges (deterministic
    argmax — count DESC, then lexicographic pair), rewriting the
    vocabulary after each, with an eager ``localCheckpoint`` per step so
    N steps never stack N fold expressions into one plan. Returns
    (rewritten vocabulary, merges in learning order); stops early on
    pair exhaustion (all words reduced to one symbol). ``apply_last``
    False skips the final rewrite — the fit's merge table doesn't need
    it (encode does). Per-step driver traffic is the single argmax row."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    vocab = bpe_vocab(df, text).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            bpe_pair_counts(vocab)
            .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        merges.append(
            (rank, row["left_sym"], row["right_sym"], row["pair_count"])
        )
        if apply_last or rank < n_merges:
            vocab = bpe_apply_merge(
                vocab, row["left_sym"], row["right_sym"]
            ).localCheckpoint(eager=True)
    return vocab, merges


def bpe_learn(
    df: DataFrame,
    text: str = "text",
    n_merges: int = 3,
) -> DataFrame:
    """Learn the top-``n_merges`` BPE merges from a corpus.

    Returns (merge_rank, left_sym, right_sym, pair_count) in learning
    order — the merge table a tokenizer ships. Deterministic: ties on
    pair_count break by (left_sym, right_sym), so the fit is replayable
    by the unrolled SQL oracle. Stops early if the vocabulary runs out
    of pairs (all words reduced to single symbols).

    Plan/scale: one corpus shuffle total (the vocab build); each merge
    step re-aggregates vocabulary-sized pair partials and collects ONE
    argmax row (see :func:`_fit`).
    """
    spark = df.sparkSession
    _, merges = _fit(df, text, n_merges, apply_last=False)
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_encode(
    df: DataFrame,
    text: str = "text",
    n_merges: int = 4,
    k: int | None = 50,
) -> DataFrame:
    """Tokenize the corpus with its own fitted BPE merges and return the
    subword token-frequency table (token, n) — the "encode" half of the
    tokenizer: fit ``n_merges`` (same loop as :func:`bpe_learn`,
    INCLUDING applying the final merge), then explode the rewritten
    vocabulary's symbol sequences weighted by word frequency. ``k``
    bounds the output to the top-k tokens by (n DESC, token) —
    deterministic through count ties, so a SQL oracle replays it; pass
    ``None`` for the full table.

    Invariant (pinned by test): every merge application preserves the
    per-word character stream, so Σ n·len(token) == Σ cnt·len(word) —
    tokens re-segment the corpus, never alter it.

    Scale: identical profile to :func:`bpe_learn` — one corpus-sized
    shuffle (the vocab), per-merge vocabulary-sized aggregates, then one
    final vocabulary-sized token aggregate; the corpus is never
    re-scanned per merge.
    """
    vocab, _ = _fit(df, text, n_merges, apply_last=True)
    counts = (
        vocab.select(F.explode("syms").alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("n"))
    )
    if k is None:
        return counts
    return counts.orderBy(F.desc("n"), "token").limit(k)


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment each document's word stream into subword tokens under a
    FIXED merge table — the apply-at-inference half of the tokenizer
    (:func:`bpe_learn` ships the table, this consumes it). Returns
    (``id_col``, tokens: array<string>) with tokens in reading order;
    documents with no extractable ``[a-z]+`` word are ABSENT from the
    output (inner semantics, pinned by test) — left-join the source if
    empty-token rows are needed.

    Semantics: per word, each merge applies greedily left-to-right
    non-overlapping, in table order — exactly :func:`bpe_apply_merge`
    chained, which is what makes the law "segment under the fit's own
    merges, then count == :func:`bpe_encode`" hold (pinned by test).

    Scale shape — the merge loop runs on the DISTINCT-WORD dictionary,
    never the corpus: words explode map-side with their positions, the
    vocabulary-sized dictionary is segmented ONCE by an Arrow-batched
    kernel (a production merge table has ~30k entries — chaining 30k
    fold expressions into one Catalyst plan is infeasible, so this is
    the documented pandas escape hatch, over vocabulary-sized input
    only), the planner joins it back (broadcast for small vocabularies,
    shuffle join at web scale), and one ``id_col`` exchange restores
    token order. Corpus bytes cross the shuffle once.
    """
    import pandas as pd

    words = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text)), F.lit(_WORD_PATTERN), 0)
        ).alias("_pos", "_word"),
    )
    dictionary = words.select(F.col("_word")).distinct()
    table = list(merges)

    def segment(batches):
        for pdf in batches:
            toks = []
            for w in pdf["_word"]:
                syms = list(w)
                for left, right in table:
                    out, pend = [], None
                    for x in syms:
                        if pend is None:
                            pend = x
                        elif pend == left and x == right:
                            out.append(left + right)
                            pend = None
                        else:
                            out.append(pend)
                            pend = x
                    if pend is not None:
                        out.append(pend)
                    syms = out
                toks.append(syms)
            yield pd.DataFrame({"_word": pdf["_word"], "_toks": toks})

    seg = dictionary.mapInPandas(
        segment, "_word string, _toks array<string>"
    )
    return (
        words.join(seg, "_word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_toks"))
                    ),
                    lambda s: s["_toks"],
                )
            ).alias("tokens")
        )
    )
