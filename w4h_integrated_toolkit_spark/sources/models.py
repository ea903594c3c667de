"""Fitted-model persistence on the versioned parquet sink.

At 100 TB, FIT and APPLY are different jobs: a nightly fit job learns
k-means centroids or a BPE merge table over the corpus, and many
inference jobs (IVF probes, tokenize-on-read) consume the frozen model
across sessions and machines. The reference keeps its derived artifacts
in DB tables (w4h_db_utils.py:192-200 import flow); here the store is
the repo's own snapshot-versioned parquet sink (sources/versioned.py),
which gives the three properties a model registry needs for free:

- **Atomic publish**: a save is one new immutable version behind an
  atomically-replaced pointer — an inference job sees the old complete
  model or the new complete model, never a mix.
- **Full-replace semantics**: every save REPLACES the previous model
  rows (a refit with fewer centroids must not leak stale ones — the
  same failure mode load_corpus_index guards against for the minhash
  index, dedup.py:509). Implemented by upserting on a constant key:
  the carried-over anti-join then removes every previous row.
- **Time travel / rollback**: previous fits stay readable by version
  number (``load_model(version=...)``) until vacuumed — the "yesterday's
  tokenizer regressed, pin the old one" path.

Params travel WITH the model (a ``_w4h_params`` JSON stamp on every
row, written in the same atomic version): a load validates them against
the caller's expectation and raises on mismatch, because applying a
model fitted under different hyperparameters (wrong quantization scale,
wrong merge count) produces silently wrong results, not errors — the
corpus-index lesson (dedup.py:502-524), replayed for models.

Scale notes: model tables are tiny (k·d centroid cells, a 30k-row merge
table), so the constant upsert key is never a shuffle hot spot — the
replace scan is one small file. The STORE path can be any shared
filesystem the cluster mounts; nothing here collects more than the
params stamp to the driver.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .versioned import read_versioned, upsert_parquet

__all__ = ["save_model", "load_model"]

# constant upsert key: every row of every save shares it, so each save's
# anti-join removes ALL rows of the previous version (full replace)
_MODEL_KEY = "_w4h_model"
_PARAMS_COL = "_w4h_params"


def _canon_params(params: dict) -> str:
    """Canonical JSON rendering (sorted keys, no whitespace drift) so
    stamp equality is value equality."""
    return json.dumps(dict(params), sort_keys=True, separators=(",", ":"))


def save_model(
    spark: SparkSession,
    table: str,
    model: DataFrame,
    params: dict,
) -> int:
    """Publish ``model`` (any small DataFrame of fitted artifacts —
    k-means centroid cells, a BPE merge table, IDF weights) as the next
    version of the store at ``table``, stamped with ``params``. Returns
    the new version number. Each save fully replaces the previous
    model's rows; previous versions remain readable by number."""
    if _MODEL_KEY in model.columns or _PARAMS_COL in model.columns:
        raise ValueError(
            f"model carries reserved column(s) "
            f"{[c for c in model.columns if c in (_MODEL_KEY, _PARAMS_COL)]}; "
            "rename them — save_model stamps _w4h_model/_w4h_params"
        )
    # materialize ONCE: the emptiness check and the write below must see
    # the same rows (an uncheckpointed fit lineage would otherwise run
    # twice, and a non-deterministic one could pass the check yet write
    # different rows); model tables are small by contract, so the
    # checkpoint blocks are cheap
    model = model.localCheckpoint(eager=True)
    if model.isEmpty():
        # the full-replace contract rides on the constant-key anti-join;
        # with ZERO update rows the anti-join key set is empty and every
        # previous row (old params stamp included) would be carried into
        # the "new" version — a save that silently publishes the OLD
        # model. A fit that produced nothing (e.g. bpe_learn on a
        # pair-exhausted corpus) is a condition the caller must see.
        raise ValueError(
            "model has no rows — refusing to publish: an empty save "
            "would carry the previous version's rows forward (or create "
            "an unloadable first version); fix the fit or delete the "
            "store instead"
        )
    stamped = model.withColumn(_MODEL_KEY, F.lit("m")).withColumn(
        _PARAMS_COL, F.lit(_canon_params(params))
    )
    return upsert_parquet(spark, table, stamped, key=_MODEL_KEY)


def load_model(
    spark: SparkSession,
    table: str,
    expect_params: dict | None = None,
    version: int | None = None,
) -> tuple[DataFrame, dict]:
    """Load a persisted model snapshot (latest, or a pinned ``version``)
    and its params. With ``expect_params``, every listed key must match
    the stored stamp EXACTLY or the load raises — applying a model
    fitted under different hyperparameters yields silently wrong
    results downstream (disjoint hash families, wrong quantization),
    never errors, so the mismatch must fail here. Extra stored params
    the caller doesn't list are allowed (forward-compatible stamps).

    Returns ``(model DataFrame, stored params dict)`` with the stamp
    columns dropped. The params read is O(1) driver traffic (one row);
    a multi-stamp snapshot (impossible via :func:`save_model`, which
    writes one atomic version) raises as corruption."""
    df = read_versioned(spark, table, version)
    if _PARAMS_COL not in df.columns:
        raise ValueError(
            f"{table} is not a model store (no {_PARAMS_COL} stamp); "
            "was it written by save_model?"
        )
    stamps = [r[0] for r in df.select(_PARAMS_COL).distinct().collect()]
    if len(stamps) != 1:
        raise ValueError(
            f"model store {table} version carries {len(stamps)} distinct "
            "params stamps — corrupted write (save_model publishes one "
            "atomic stamp per version); re-save the model"
        )
    stored = json.loads(stamps[0])
    if expect_params is not None:
        diffs = {
            k: (stored.get(k, "<absent>"), v)
            for k, v in expect_params.items()
            if stored.get(k, "<absent>") != v
        }
        if diffs:
            raise ValueError(
                f"model at {table} was fitted with different params: "
                + ", ".join(
                    f"{k}: stored={s!r} expected={e!r}"
                    for k, (s, e) in sorted(diffs.items())
                )
                + " — applying it would be silently wrong; refit or "
                "match its params"
            )
    return df.drop(_MODEL_KEY, _PARAMS_COL), stored
