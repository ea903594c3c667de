"""Unigram-LM (SentencePiece-style) tokenizer: EM fit + Viterbi segment.

The verification family the r15 verdict ordered (missing-item #5 /
next-round #6): hand-model EM step, brute-force segmentation law,
partition invariance, model-store round trip with the version stamp,
and the bpe_segment-shaped plan pin.
"""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from w4h_integrated_toolkit_spark.operators.unigram import (
    UNIGRAM_MODEL_VERSION,
    UNK_LOGP_1E9,
    _COUNT_SCALE,
    unigram_em_counts,
    unigram_fit,
    unigram_seed_vocab,
    unigram_segment,
)


def _corpus(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


# ---------------------------------------------------------------------------
# literal sequential models (no shared code with the operators)
# ---------------------------------------------------------------------------

def _all_segmentations(word, pieces, max_len):
    """Every segmentation of word into known pieces (no UNK — fit-side
    models always cover their corpus chars)."""
    n = len(word)
    outs = []

    def rec(i, acc):
        if i == n:
            outs.append(list(acc))
            return
        for ln in range(1, min(max_len, n - i) + 1):
            p = word[i : i + ln]
            if p in pieces:
                acc.append(p)
                rec(i + ln, acc)
                acc.pop()

    rec(0, [])
    return outs


def _hand_expected_counts(word, cnt, logp, max_len):
    """Expected piece counts by LITERAL enumeration over all
    segmentations: E[#piece] = Σ_seg P(seg)·count_in_seg / Σ_seg P(seg),
    P(seg) ∝ exp(Σ logp)."""
    segs = _all_segmentations(word, set(logp), max_len)
    if not segs:
        return {}
    ws = [math.exp(sum(logp[p] for p in s)) for s in segs]
    z = sum(ws)
    out = {}
    for s, w in zip(segs, ws):
        for p in s:
            out[p] = out.get(p, 0.0) + w / z
    return {p: round(e * _COUNT_SCALE) * cnt for p, e in out.items()}


def _brute_best_segmentation(word, lp, max_len):
    """argmax over ALL segmentations (UNK chars allowed) under the
    operator's exact objective: integer score DESC, fewer tokens,
    lexicographically smallest token list."""
    n = len(word)
    best = None

    def score(tok):
        return lp[tok] if tok in lp else UNK_LOGP_1E9

    def rec(i, acc):
        nonlocal best
        if i == n:
            cand = (sum(score(t) for t in acc), len(acc), list(acc))
            if (
                best is None
                or cand[0] > best[0]
                or (cand[0] == best[0] and cand[1] < best[1])
                or (cand[0] == best[0] and cand[1] == best[1] and cand[2] < best[2])
            ):
                best = cand
            return
        for ln in range(1, min(max_len, n - i) + 1):
            p = word[i : i + ln]
            if ln == 1 or p in lp:
                acc.append(p)
                rec(i + ln, acc)
                acc.pop()

    rec(0, [])
    return best[2]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_unigram_seed_vocab_counts_and_coverage(spark):
    """Substring counts are corpus-occurrence-weighted, the top-N is
    deterministic through ties, and single chars are ALWAYS kept even
    when seed_size would exclude them."""
    df = _corpus(spark, ["aba ab", "aba"])
    seed = {
        r["piece"]: r["n"]
        for r in unigram_seed_vocab(
            df, max_piece_len=3, seed_size=2
        ).collect()
    }
    # words: aba(x2), ab(x1). substrings of aba: a,ab,aba,b,ba,a (a twice
    # per aba); of ab: a,ab,b (a once)
    assert seed["a"] == 2 * 2 + 1 * 1
    assert seed["b"] == 2 + 1
    # top-2 multi-char pieces by (count, lex): ab=3, ba=2 > aba=2? tie →
    # lexicographic: "aba" < "ba", so aba wins the second slot
    assert set(p for p in seed if len(p) > 1) == {"ab", "aba"}
    assert seed["ab"] == 3 and seed["aba"] == 2
    with pytest.raises(ValueError, match="max_piece_len"):
        unigram_seed_vocab(df, max_piece_len=0)


def test_unigram_em_counts_match_enumeration_hand_model(spark):
    """The forward-backward E-step equals literal enumeration over every
    segmentation (float paths differ, so allow ±2 integer grid units)."""
    vocab_rows = [("abab", 3), ("ab", 5), ("ba", 2)]
    vocab = spark.createDataFrame(
        [Row(word=w, cnt=c) for w, c in vocab_rows], "word string, cnt long"
    )
    logp = {
        "a": math.log(0.3),
        "b": math.log(0.25),
        "ab": math.log(0.35),
        "ba": math.log(0.1),
    }
    got = {
        r["piece"]: r["count_1e6"]
        for r in unigram_em_counts(vocab, list(logp.items()), 2).collect()
    }
    want: dict[str, int] = {}
    for w, c in vocab_rows:
        for p, v in _hand_expected_counts(w, c, logp, 2).items():
            want[p] = want.get(p, 0) + v
    assert set(got) == set(want)
    for p in want:
        assert abs(got[p] - want[p]) <= 2 * 8, (p, got[p], want[p])


def test_unigram_fit_partition_invariance_and_determinism(spark):
    """The fitted model (pieces, integer log-probs, counts) is
    bit-identical whatever the input partitioning — the integer-scaled
    E-step is what buys this."""
    texts = ["the cat sat on the mat", "the bat and the cat", "mat cat"]
    df = _corpus(spark, texts)
    m1 = sorted(
        tuple(r) for r in unigram_fit(df.repartition(1), vocab_size=12).collect()
    )
    m7 = sorted(
        tuple(r) for r in unigram_fit(df.repartition(7), vocab_size=12).collect()
    )
    assert m1 == m7 and len(m1) >= 12
    pieces = {t[0] for t in m1}
    # coverage: every corpus char survives pruning
    assert {c for t in texts for c in t if c.isalpha()} <= pieces
    # log-probs normalize (within grid rounding of the model size)
    tot = sum(math.exp(t[1] / 1e9) for t in m1)
    assert abs(tot - 1.0) < 1e-6
    with pytest.raises(ValueError, match="vocab_size"):
        unigram_fit(df, vocab_size=0)
    with pytest.raises(ValueError, match="no \\[a-z\\]\\+ words"):
        unigram_fit(_corpus(spark, ["123 456"]))


def test_unigram_segment_matches_bruteforce_objective(spark):
    """Viterbi equals the argmax over ALL segmentations under the exact
    (integer score, fewer tokens, lex) objective, including UNK
    single-char fallbacks — randomized words against a fixed model."""
    import random

    rng = random.Random(11)
    pieces = {
        "a": -1_200_000_000,
        "b": -1_500_000_000,
        "c": -1_500_000_000,
        "ab": -1_900_000_000,
        "ba": -2_000_000_000,
        "abc": -2_500_000_000,
        "bb": -2_400_000_000,
    }
    words = [
        "".join(rng.choice("abcx") for _ in range(rng.randint(1, 10)))
        for _ in range(60)
    ]
    df = _corpus(spark, [" ".join(words)])
    out = unigram_segment(df, list(pieces.items()))
    toks = out.collect()[0]["tokens"]
    want = [
        t
        for w in words
        for t in _brute_best_segmentation(w, pieces, 3)
    ]
    assert toks == want
    # char-stream law: tokens re-segment the text, never alter it
    assert "".join(toks) == "".join(words)
    with pytest.raises(ValueError, match="non-empty"):
        unigram_segment(df, [])


def test_unigram_fit_then_segment_round_trip(spark):
    """End to end: a model fitted on its own corpus segments that corpus
    with no UNK involvement and preserves the char stream; common
    bigrams become multi-char pieces."""
    texts = ["ababab abab", "ababab", "cd cd ababab"]
    df = _corpus(spark, texts)
    model = unigram_fit(df, vocab_size=8, max_piece_len=3)
    pieces = [(r["piece"], r["logp_1e9"]) for r in model.collect()]
    out = {
        r["doc_id"]: r["tokens"]
        for r in unigram_segment(df, pieces).collect()
    }
    for i, t in enumerate(texts):
        assert "".join(out[i]) == t.replace(" ", "")
    # the dominant repeated bigram is worth a multi-char piece, and the
    # segmenter uses it (fewer tokens at higher total prob)
    assert any(len(p) > 1 and "ab" in p for p, _ in pieces)
    assert any(len(t) > 1 for t in out[0])


def test_unigram_model_store_round_trip_and_version_guard(spark, tmp_path):
    """The model table persists via sources.models with the
    UNIGRAM_MODEL_VERSION stamp; loading under a different format
    version fails loud (the FEATURE_HASH_VERSION discipline)."""
    from w4h_integrated_toolkit_spark.sources.models import (
        load_model,
        save_model,
    )

    df = _corpus(spark, ["the cat sat", "the bat"])
    model = unigram_fit(df, vocab_size=10)
    params = {
        "kind": "unigram_lm",
        "vocab_size": 10,
        "max_piece_len": 4,
        "unigram_model_version": UNIGRAM_MODEL_VERSION,
    }
    store = str(tmp_path / "unigram_lm")
    save_model(spark, store, model, params)
    loaded, stored = load_model(spark, store, expect_params=params)
    assert stored["unigram_model_version"] == UNIGRAM_MODEL_VERSION
    direct = sorted(tuple(r) for r in model.collect())
    assert sorted(tuple(r) for r in loaded.collect()) == direct
    # segment via the store == segment direct
    pieces = [(r["piece"], r["logp_1e9"]) for r in loaded.collect()]
    a = unigram_segment(df, pieces).collect()
    b = unigram_segment(
        df, [(r["piece"], r["logp_1e9"]) for r in model.collect()]
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError, match="unigram_model_version"):
        load_model(
            spark,
            store,
            expect_params={
                **params,
                "unigram_model_version": UNIGRAM_MODEL_VERSION + 1,
            },
        )


def test_unigram_segment_plan_shape(spark):
    """The bpe_segment plan contract: one Arrow kernel over the DISTINCT
    dictionary, broadcast join back (small vocab), one id exchange; the
    raw text column never reaches an Exchange."""
    df = _corpus(spark, ["abc abd", "abc"])
    out = unigram_segment(df, [("a", -10), ("b", -12), ("c", -15), ("d", -15)])
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    # docs with no extractable word are absent (inner semantics)
    empty = _corpus(spark, ["...", "abc"])
    got = unigram_segment(empty, [("a", -10), ("b", -10), ("c", -10)])
    assert [r["doc_id"] for r in got.collect()] == [1]
